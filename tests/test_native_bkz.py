"""Trust tests for the native BKZ tour engine (bkz_core.c).

Round-5 verdict items: (a) same-seed A/B of the native engine vs the
Python engines, (b) fault injection forcing a mid-tour native abort and
asserting the Python redo produces a valid reduction, (c) the grouped
rerandomized-trial callback actually firing with G >= 2.

Model: the reference's verifier-based BKZ tests
(/root/reference/tests/test_bkz.cpp:322-389).
"""

import os

import numpy as np
import pytest

import fplll_tpu as fl
from fplll_tpu.algs.bkz import BKZReduction
from fplll_tpu.algs.bkz_param import (BKZParam, PruningParams, Strategy,
                                      load_strategies_json,
                                      strategy_full_path)
from fplll_tpu.algs.lll import LLLReduction
from fplll_tpu.defs import BKZ_GH_BND, BKZ_MAX_LOOPS, GSO_ROW_EXPO
from fplll_tpu.nr.fctx import get_ctx
from fplll_tpu.defs import FT_DOUBLE
from fplll_tpu.nr.rng import RandGen
from fplll_tpu.ops.gen import gen_qary_bits


def _need_native():
    from fplll_tpu.native import get_bkz_lib
    if get_bkz_lib() is None:
        pytest.skip("native bkz core unavailable")


def _run_bkz(seed, block, d, strategies, max_loops=1):
    RandGen.init_with_seed(seed)
    b = gen_qary_bits(d, d // 2, 14)
    fl.lll_reduction(b)
    p = BKZParam(block, strategies, flags=BKZ_GH_BND | BKZ_MAX_LOOPS)
    p.max_loops = max_loops
    m = fl.MatGSO(b, flags=GSO_ROW_EXPO, ctx=get_ctx(FT_DOUBLE, 0))
    lll = LLLReduction(m, 0.99, 0.51, 0)
    bkz = BKZReduction(m, lll, p)
    bkz.bkz()
    return b, bkz, m


def _quality(b):
    """First-vector norm + LLL-reducedness of a basis."""
    m = fl.MatGSO(b.copy() if hasattr(b, "copy") else b, flags=GSO_ROW_EXPO)
    red = fl.is_lll_reduced(m, 0.99, 0.51)
    n0 = float(np.linalg.norm(np.array(b.a[0].tolist(), dtype=np.float64)))
    return red, n0


def test_native_off_vs_on_unpruned_identical(monkeypatch):
    """Same-seed A/B at an unpruned block size (single deterministic
    trial per window, no rerandomization): the native engine must visit
    the same enumeration trees as the Python engines and produce a basis
    of identical quality."""
    _need_native()
    monkeypatch.setenv("FPLLL_TPU_NATIVE_BKZ", "0")
    b0, bkz0, _ = _run_bkz(23, 20, 44, None)
    monkeypatch.setenv("FPLLL_TPU_NATIVE_BKZ", "1")
    b1, bkz1, _ = _run_bkz(23, 20, 44, None)
    red0, n0 = _quality(b0)
    red1, n1 = _quality(b1)
    assert red0 and red1
    assert bkz1.nodes == bkz0.nodes, \
        f"native {bkz1.nodes} vs python {bkz0.nodes} nodes"
    assert n0 == n1


def test_native_off_vs_on_pruned_quality(monkeypatch):
    """Pruned block-30 A/B: rerandomization draws differ between the
    engines (splitmix64 vs the Python RNG), so node counts are only
    required to be in the same ballpark — but both outputs must pass the
    quality gates."""
    _need_native()
    strats = load_strategies_json(strategy_full_path("default.json"))
    monkeypatch.setenv("FPLLL_TPU_NATIVE_BKZ", "0")
    b0, bkz0, m0 = _run_bkz(31, 30, 56, strats)
    monkeypatch.setenv("FPLLL_TPU_NATIVE_BKZ", "1")
    b1, bkz1, m1 = _run_bkz(31, 30, 56, strats)
    red0, n0 = _quality(b0)
    red1, n1 = _quality(b1)
    assert red0 and red1
    assert bkz0.nodes > 0 and bkz1.nodes > 0
    assert 0.25 < bkz1.nodes / bkz0.nodes < 4.0
    # the shortest output vectors agree within the usual BKZ variance
    assert 0.8 < n1 / n0 < 1.25


def test_native_fault_mid_tour_python_redo(monkeypatch):
    """Force the native tour to abort after 3 windows: the driver must
    fall back to the Python engines from the (valid) partial basis and
    still deliver a proper reduction."""
    _need_native()
    calls = {"trunc": 0}
    orig = BKZReduction.trunc_tour

    def spy(self, *a, **kw):
        calls["trunc"] += 1
        return orig(self, *a, **kw)

    monkeypatch.setattr(BKZReduction, "trunc_tour", spy)
    monkeypatch.setenv("FPLLL_TPU_NATIVE_BKZ", "1")

    # without the fault the native engine handles the whole tour
    b0, bkz0, _ = _run_bkz(7, 20, 44, None)
    assert calls["trunc"] == 0

    monkeypatch.setenv("FPLLL_TPU_BKZ_FAULT", "3")
    b1, bkz1, _ = _run_bkz(7, 20, 44, None)
    assert calls["trunc"] >= 1, "python redo path never engaged"
    red, _n = _quality(b1)
    assert red
    monkeypatch.delenv("FPLLL_TPU_BKZ_FAULT")


@pytest.mark.slow
def test_grouped_trials_callback_g2(monkeypatch):
    """The grouped-trial seam: with a low-expectation pruning strategy
    the retrial loop must batch k >= 2 rerandomized trials into ONE
    device callback (G >= 2), and the reduction must stay valid."""
    _need_native()
    # fabricate a block-36 strategy with aggressive linear pruning (so
    # trials genuinely fail and retrials batch) and a pessimistic
    # expectation (so >= 2 retrials are budgeted)
    coeffs = list(np.linspace(1.0, 0.05, 36))
    strategies = [Strategy.EmptyStrategy(b) for b in range(37)]
    strategies[36] = Strategy(36, preprocessing_block_sizes=[20])
    strategies[36].pruning_parameters = [PruningParams(1.0, coeffs, 0.15)]
    monkeypatch.setenv("FPLLL_TPU_NATIVE_BKZ", "1")
    monkeypatch.setenv("FPLLL_TPU_MIN_ENUM_DIM", "34")
    # the GH estimate of these extreme-pruned block-36 trees is ~20
    # bound-passing nodes; 50 puts single trials below and any k >= 2
    # group above the crossover
    monkeypatch.setenv("FPLLL_TPU_HYBRID_NODES", "50")
    # reload the cached module constant picked up at import time
    import fplll_tpu.enum.tpu as tpu_mod
    monkeypatch.setattr(tpu_mod, "_MIN_TPU_DIM", 34)

    b, bkz, m = _run_bkz(13, 36, 42, strategies)
    assert getattr(bkz, "g_max", 0) >= 2, \
        "grouped launch never fired (g_max=%r)" % getattr(bkz, "g_max", 0)
    assert getattr(bkz, "dev_nodes", 0) > 0
    red, _ = _quality(b)
    assert red
