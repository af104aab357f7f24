"""Pallas enumeration kernel parity (SURVEY.md §2 #13, #16).

The Pallas kernel (fplll_tpu/enum/pallas_kernel.py) must agree with the
XLA lockstep kernel on tree semantics.  Mosaic only compiles for real
TPUs, so the suite's CPU run exercises the kernel through the Pallas
interpreter in a subprocess (the env knobs are read at import time);
on a TPU-backed session the same test runs compiled.

The subprocess checks, on a small random lattice against brute force:
- count mode: exact solution count (#lattice points in the ball / 2)
  and best distance;
- search mode: best distance matches brute force.
"""

import json
import os
import subprocess
import sys

import pytest

_SCRIPT = r"""
import json
import numpy as np
import itertools
from fplll_tpu.jaxsetup import jax, jnp
from fplll_tpu.enum.pallas_kernel import _enum_run_pallas

np.random.seed(7)
d, m = 5, 8
mut_low = np.eye(d) + np.tril(np.random.randn(d, d) * 0.3, -1)
rdiag = np.abs(np.random.randn(d)) + 0.5
A = 3.0
cnt = 0
best = np.inf
for xs in itertools.product(range(-6, 7), repeat=d):
    x = np.array(xs, float)
    dist = 0.0
    for k in range(d):
        c = x[k] + sum(mut_low[j, k] * x[j] for j in range(k + 1, d))
        dist += c * c * rdiag[k]
    if dist <= A and np.any(x != 0):
        cnt += 1
        best = min(best, dist)

# driver convention: kernel input is mu^T
mut = mut_low.T
mut_pad = np.zeros((m, m)); mut_pad[:d, :d] = mut
rdiag_pad = np.full(m, 1e30); rdiag_pad[:d] = rdiag
prune_pad = np.ones(m); cp0_pad = np.zeros(m)
mut_fix_pad = np.zeros((m, 8))
rx_pad = np.zeros((256, 8)); rpd_pad = np.full(256, np.inf)
rpd_pad[0] = 0.0
out = {}
for mode in ("count", "search"):
    import os as _os
    B = int(_os.environ.get("FPLLL_TPU_PALLAS_TEST_BATCH", "128"))
    s = _enum_run_pallas(mut_pad, rdiag_pad, prune_pad, mut_fix_pad,
                         cp0_pad, rx_pad, rpd_pad, A, m=m, is_svp=True,
                         count_mode=(mode == "count"), max_steps=1 << 20,
                         batch=B, chunk=64)
    out[mode] = {
        "sols": float(np.asarray(s["sol_count"]).sum()),
        "best": float(np.asarray(s["best_dist"]).min()),
        "nodes": float(np.asarray(s["nodes"]).sum()),
    }
out["brute"] = {"pairs": cnt // 2, "best": best}
print("RESULT " + json.dumps(out))
"""


def _run_pallas_subprocess(extra_env):
    env = dict(os.environ)
    env.update(extra_env)
    res = subprocess.run([sys.executable, "-c", _SCRIPT],
                         capture_output=True, text=True, timeout=900,
                         env=env, cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))))
    assert res.returncode == 0, res.stderr[-4000:]
    line = [ln for ln in res.stdout.splitlines()
            if ln.startswith("RESULT ")][-1]
    return json.loads(line[len("RESULT "):])


@pytest.mark.slow
def test_pallas_kernel_matches_brute_force():
    out = _run_pallas_subprocess({
        "FPLLL_TPU_PALLAS_INTERPRET": "1",
        "FPLLL_TPU_PLATFORM": "cpu",
        "JAX_PLATFORMS": "cpu",
    })
    brute = out["brute"]
    assert out["count"]["sols"] == brute["pairs"]
    assert abs(out["count"]["best"] - brute["best"]) < 1e-4
    assert abs(out["search"]["best"] - brute["best"]) < 1e-4
    assert out["search"]["nodes"] <= out["count"]["nodes"]


@pytest.mark.slow
def test_pallas_lane_grid_matches_brute_force():
    """Batches whose VMEM state exceeds one core run as a lane-tiled grid
    (the fix for the B=16384 throughput cliff); force a 2-cell grid by
    capping the tile below the test batch and check identical semantics."""
    out = _run_pallas_subprocess({
        "FPLLL_TPU_PALLAS_INTERPRET": "1",
        "FPLLL_TPU_PLATFORM": "cpu",
        "JAX_PLATFORMS": "cpu",
        "FPLLL_TPU_PALLAS_MAX_TILE": "128",
        "FPLLL_TPU_PALLAS_TEST_BATCH": "256",
    })
    brute = out["brute"]
    assert out["count"]["sols"] == brute["pairs"]
    assert abs(out["count"]["best"] - brute["best"]) < 1e-4
    assert abs(out["search"]["best"] - brute["best"]) < 1e-4


_GROUPED_SCRIPT = r"""
import json
import itertools
import numpy as np
from fplll_tpu.jaxsetup import jax, jnp
from fplll_tpu.enum.tpu import _grouped_device_windows

# the grouped-launch contract: G problems = rerandomized bases of the
# SAME lattice block (the kernel shares the shrinking bound across
# trials).  Group 1 is a unimodular transform of group 0's basis.
np.random.seed(11)
d = 6
mut_low0 = np.eye(d) + np.tril(np.random.randn(d, d) * 0.3, -1)
rdiag0 = np.abs(np.random.randn(d)) + 0.5
# basis rows b_i in an orthonormal frame: B0 = S * R where R is derived
# from (mut_low, rdiag)
R0 = np.zeros((d, d))
for i in range(d):
    for k in range(i + 1):
        R0[i, k] = (mut_low0[i, k] if i != k else 1.0) * np.sqrt(rdiag0[k])
U = np.eye(d, dtype=int)
U[1, 0] = 1
U[3, 2] = -1
U[[0, 2]] = U[[2, 0]]
B1 = U @ R0
# GSO of the transformed basis
import numpy.linalg as la
Q, Rq = la.qr(B1.T)
R1 = Rq.T
sgn = np.sign(np.diag(R1))
R1 = R1 * sgn[None, :]
rdiag1 = np.diag(R1) ** 2
mut_low1 = R1 / np.sqrt(rdiag1)[None, :]

A = 3.0
def brute_best(mut_low, rdiag):
    best = np.inf
    for xs in itertools.product(range(-6, 7), repeat=d):
        x = np.array(xs, float)
        dist = 0.0
        for k in range(d):
            c = x[k] + sum(mut_low[j, k] * x[j] for j in range(k + 1, d))
            dist += c * c * rdiag[k]
        if dist <= A and np.any(x != 0):
            best = min(best, dist)
    return best

b0 = brute_best(mut_low0, rdiag0)
b1 = brute_best(mut_low1, rdiag1)
assert abs(b0 - b1) < 1e-9, (b0, b1)  # same lattice, same minimum

probs = [(mut_low0, rdiag0), (mut_low1, rdiag1)]
muts = np.stack([p[0].T for p in probs])
rdiags = np.stack([p[1] for p in probs])
prunes = np.ones((2, d))
maxd = np.full(2, A)
out = _grouped_device_windows(muts, rdiags, prunes, maxd)
assert out is not None, "grouped path declined"
dists, sols, nodes = out
recomputed = []
for g in range(2):
    if not np.isfinite(dists[g]):
        recomputed.append(None)
        continue
    x = sols[g]
    mut_low, rdiag = probs[g]
    dist = 0.0
    for k in range(d):
        c = x[k] + sum(mut_low[j, k] * x[j] for j in range(k + 1, d))
        dist += c * c * rdiag[k]
    recomputed.append(dist)
print("RESULT " + json.dumps({
    "dists": [float(v) for v in dists],
    "recomputed": recomputed,
    "brute": b0,
    "nodes": float(nodes)}))
"""


@pytest.mark.slow
def test_pallas_grouped_windows_match_brute_force():
    """The grouped-trial launch (G bases of one lattice, one kernel
    launch, shared shrinking bound): the best across groups must match
    brute force, and any finite per-group result must reproduce its
    claimed distance in exact arithmetic."""
    env = dict(os.environ)
    env.update({
        "FPLLL_TPU_PALLAS_INTERPRET": "1",
        "FPLLL_TPU_PLATFORM": "cpu",
        "JAX_PLATFORMS": "cpu",
        "FPLLL_TPU_GROUP_BATCH": "128",
        "FPLLL_TPU_GROUP_ROOT_FACTOR": "2",
    })
    res = subprocess.run([sys.executable, "-c", _GROUPED_SCRIPT],
                         capture_output=True, text=True, timeout=900,
                         env=env, cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))))
    assert res.returncode == 0, res.stderr[-4000:]
    line = [ln for ln in res.stdout.splitlines()
            if ln.startswith("RESULT ")][-1]
    out = json.loads(line[len("RESULT "):])
    best = min(v for v in out["dists"])
    assert abs(best - out["brute"]) < 1e-4
    for g in range(2):
        if out["recomputed"][g] is not None:
            assert abs(out["recomputed"][g] - out["dists"][g]) < 1e-3
    assert out["nodes"] > 0
