"""Thread-safety of the native cores.

The reference documents that distinct objects may be reduced on
different threads concurrently (/root/reference/README.md:309-311).
ctypes releases the GIL for the duration of the native calls, so any
global mutable state in the C cores (the old static partial-sum cache,
the profiling accumulators, the shared root-expansion scratch) would
corrupt concurrent runs.  These tests run the same seeded workloads
single-threaded first, then race two threads and assert identical
results.
"""

import threading

import numpy as np
import pytest

from fplll_tpu.nr.rng import RandGen
from fplll_tpu.ops.gen import gen_qary_bits, gen_uniform


def _make_problem(seed, d=24):
    """An LLL-reduced q-ary basis + its GSO export for enumeration."""
    import math

    from fplll_tpu.algs.wrapper import lll_reduction
    from fplll_tpu.core.gso import MatGSO
    from fplll_tpu.defs import GSO_INT_GRAM
    from fplll_tpu.nr.fctx import MPCtx

    RandGen.init_with_seed(seed)
    b = gen_qary_bits(d, d // 2, 12)
    lll_reduction(b)
    gso = MatGSO(b, flags=GSO_INT_GRAM, ctx=MPCtx(90))
    gso.update_gso()
    mut, rdiag, _ = gso.export_mu_r(0, d)
    log_ball = (d / 2.0) * math.log(math.pi) - math.lgamma(d / 2.0 + 1.0)
    gh2 = math.exp(float(np.mean(np.log(rdiag))) - 2.0 * log_ball / d)
    return np.asarray(mut), np.asarray(rdiag), 1.2 * gh2


def test_concurrent_native_enumeration():
    from fplll_tpu.native import get_lib, native_enumerate

    if get_lib() is None:
        pytest.skip("native enum core unavailable")
    probs = [_make_problem(seed) for seed in (11, 29, 47, 83)]
    expected = [native_enumerate(mut, rdiag, None, None, A, True, False,
                                 False) for mut, rdiag, A in probs]
    assert all(e is not None for e in expected)

    results = [[None] * len(probs) for _ in range(2)]
    errs = []

    def worker(tid):
        try:
            for rep in range(6):
                for i, (mut, rdiag, A) in enumerate(probs):
                    results[tid][i] = native_enumerate(
                        mut, rdiag, None, None, A, True, False, False)
        except Exception as exc:  # pragma: no cover
            errs.append(exc)

    ts = [threading.Thread(target=worker, args=(t,)) for t in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    for tid in range(2):
        for i, exp in enumerate(expected):
            got = results[tid][i]
            assert got is not None
            # (maxdist, best_dist, best_x, sol_count, nodes, visited)
            assert got[0] == exp[0] and got[1] == exp[1]
            assert np.array_equal(got[2], exp[2])
            assert np.array_equal(got[4], exp[4]) and got[5] == exp[5]


def test_concurrent_native_lll():
    from fplll_tpu.native import get_lll_lib, native_lll_fast

    if get_lll_lib() is None:
        pytest.skip("native lll core unavailable")

    def fresh(seed):
        RandGen.init_with_seed(seed)
        return gen_uniform(20, 30)

    seeds = (5, 17, 31)
    expected = {}
    for s in seeds:
        b = fresh(s)
        st = native_lll_fast(b)
        assert st == 0
        expected[s] = np.array(b.a.tolist(), dtype=object)

    errs = []

    def worker(my_seeds):
        try:
            for rep in range(4):
                for s in my_seeds:
                    b = fresh(s)
                    st = native_lll_fast(b)
                    assert st == 0
                    assert np.array_equal(
                        np.array(b.a.tolist(), dtype=object), expected[s])
        except Exception as exc:  # pragma: no cover
            errs.append(exc)

    ts = [threading.Thread(target=worker, args=(seeds,)) for _ in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs


def test_concurrent_root_expansion():
    """native_gen_roots shares scratch buffers across calls; the lock
    must keep concurrent expansions from racing on them."""
    from fplll_tpu.native import get_lib, native_gen_roots

    lib = get_lib()
    if lib is None or not hasattr(lib, "enum_gen_roots"):
        pytest.skip("native root expansion unavailable")
    probs = [_make_problem(seed, d=30) for seed in (7, 13)]
    cp0 = np.zeros(30)
    expected = [native_gen_roots(mut, rdiag, None, cp0, A, True, False,
                                 20, 256) for mut, rdiag, A in probs]
    assert all(e is not None for e in expected)
    errs = []
    results = [[None, None], [None, None]]

    def worker(tid):
        try:
            for rep in range(20):
                for i, (mut, rdiag, A) in enumerate(probs):
                    results[tid][i] = native_gen_roots(
                        mut, rdiag, None, cp0, A, True, False, 20, 256)
        except Exception as exc:  # pragma: no cover
            errs.append(exc)

    ts = [threading.Thread(target=worker, args=(t,)) for t in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    for tid in range(2):
        for i, exp in enumerate(expected):
            got = results[tid][i]
            xs, als, pd, m, nodes = got
            assert m == exp[3]
            assert np.array_equal(xs, exp[0])
            assert np.array_equal(pd, exp[2])
            assert np.array_equal(nodes, exp[4])
