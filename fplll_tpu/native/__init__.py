"""Native host kernels, built on demand with the system toolchain.

enum_core.c implements the sequential KFP DFS in C (the role of the
reference's compiled enumerators); it is compiled to a shared object on
first use and loaded through ctypes. If compilation fails the callers
fall back to the pure-Python oracle.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB = None
_TRIED = False


class EnumResult(ctypes.Structure):
    _fields_ = [
        ("maxdist", ctypes.c_double),
        ("best_dist", ctypes.c_double),
        ("sol_count", ctypes.c_double),
        ("nodes_budget", ctypes.c_int64),
        ("visited", ctypes.c_int64),
        ("found", ctypes.c_int),
    ]


def _build() -> Optional[ctypes.CDLL]:
    src = os.path.join(_HERE, "enum_core.c")
    cache_dir = os.environ.get("FPLLL_TPU_NATIVE_CACHE",
                               os.path.expanduser("~/.cache/fplll_tpu"))
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, "enum_core.so")
    if not os.path.exists(so_path) or \
            os.path.getmtime(so_path) < os.path.getmtime(src):
        cmd = ["cc", "-O3", "-march=native", "-shared", "-fPIC",
               "-o", so_path, src, "-lm"]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (OSError, subprocess.SubprocessError):
            try:  # retry without -march=native
                cmd.remove("-march=native")
                subprocess.run(cmd, check=True, capture_output=True,
                               timeout=120)
            except (OSError, subprocess.SubprocessError):
                return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    lib.enum_run.restype = ctypes.c_int
    lib.enum_run.argtypes = [
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),  # mut
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),  # rdiag
        ctypes.c_void_p,                                           # pruning
        ctypes.c_void_p,                                           # target
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),  # best_x
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),  # nodes
        ctypes.POINTER(EnumResult),
    ]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        _LIB = _build()
    return _LIB


def native_enumerate(mut: np.ndarray, rdiag: np.ndarray,
                     pruning: Optional[np.ndarray],
                     target: Optional[np.ndarray], maxdist: float,
                     is_svp: bool, dual: bool, count_mode: bool,
                     node_budget: int = 0):
    """Run the native DFS. Returns None if the library is unavailable,
    else (new_maxdist, best_dist, best_x|None, sol_count, nodes, visited)."""
    lib = get_lib()
    if lib is None:
        return None
    d = len(rdiag)
    mut = np.ascontiguousarray(mut, dtype=np.float64)
    rdiag = np.ascontiguousarray(rdiag, dtype=np.float64)
    pr = None if pruning is None else \
        np.ascontiguousarray(pruning, dtype=np.float64)
    tg = None if target is None else \
        np.ascontiguousarray(target, dtype=np.float64)
    best_x = np.zeros(d, dtype=np.float64)
    nodes = np.zeros(d, dtype=np.float64)
    res = EnumResult()
    res.maxdist = float(maxdist)
    res.nodes_budget = int(node_budget)
    rc = lib.enum_run(
        d, mut, rdiag,
        pr.ctypes.data_as(ctypes.c_void_p) if pr is not None else None,
        tg.ctypes.data_as(ctypes.c_void_p) if tg is not None else None,
        int(is_svp), int(dual), int(count_mode), best_x, nodes,
        ctypes.byref(res))
    if rc != 0:
        return None
    return (res.maxdist, res.best_dist,
            best_x if res.found else None, res.sol_count, nodes, res.visited)
