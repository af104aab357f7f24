"""BKZ tests (mirrors /root/reference/tests/test_bkz.cpp: end-to-end
reduction across variants, strategies with preprocessing + linear
pruning, dump-gso, linear-dependency edge case)."""

import json
import os

import pytest

import fplll_tpu as fl
from fplll_tpu.algs.bkz import bkz_reduction, hkz_reduction
from fplll_tpu.algs.bkz_param import (BKZParam, PruningParams, Strategy,
                                      load_strategies_json)
from fplll_tpu.algs.lll import is_lll_reduced
from fplll_tpu.core.gso import MatGSO
from fplll_tpu.defs import (BKZ_AUTO_ABORT, BKZ_DUMP_GSO, BKZ_GH_BND,
                            BKZ_MAX_LOOPS, BKZ_SD_VARIANT, BKZ_SLD_RED,
                            GSO_ROW_EXPO, RED_BKZ_LOOPS_LIMIT, RED_SUCCESS)
from fplll_tpu.nr.rng import RandGen
from fplll_tpu.ops import gen


def first_norm(b):
    return b.row_norm_sq(0)


def root_hermite_factor(b):
    """delta = (||b_1|| / det^{1/d})^{1/d} from the GSO profile."""
    import math
    m = MatGSO(b.copy(), flags=GSO_ROW_EXPO)
    m.update_gso()
    d = m.d
    logdet = 0.0
    for i in range(d):
        v, e = m.get_r_exp(i, i)
        logdet += math.log(float(v)) + e * math.log(2.0)
    v0, e0 = m.get_r_exp(0, 0)
    lognorm = 0.5 * (math.log(float(v0)) + e0 * math.log(2.0))
    return math.exp((lognorm - logdet / (2.0 * d)) / d)


def test_bkz_improves_over_lll():
    RandGen.init_with_seed(42)
    b = gen.gen_qary_bits(24, 12, 12)
    from fplll_tpu.algs.wrapper import lll_reduction
    b_lll = b.copy()
    lll_reduction(b_lll)
    st = bkz_reduction(b, 10, flags=BKZ_AUTO_ABORT | BKZ_GH_BND)
    assert st == RED_SUCCESS
    assert first_norm(b) <= first_norm(b_lll)
    m = MatGSO(b, flags=GSO_ROW_EXPO)
    assert is_lll_reduced(m, 0.98, 0.52)


def test_bkz_max_loops_status():
    RandGen.init_with_seed(43)
    b = gen.gen_uniform(18, 12)
    param = BKZParam(6, None, flags=BKZ_MAX_LOOPS, max_loops=1)
    st = bkz_reduction(b, param)
    assert st in (RED_SUCCESS, RED_BKZ_LOOPS_LIMIT)


def test_hkz():
    RandGen.init_with_seed(44)
    b = gen.gen_uniform(10, 10)
    assert hkz_reduction(b) == RED_SUCCESS
    # first vector must be the shortest: check against SVP
    from fplll_tpu.algs.svpcvp import shortest_vector
    b2 = b.copy()
    st, sol = shortest_vector(b2)
    assert st == RED_SUCCESS
    v = [sum(int(round(c)) * int(b2.a[i, j]) for i, c in enumerate(sol))
         for j in range(b2.ncols)]
    assert first_norm(b) <= sum(x * x for x in v) * 1.0001


@pytest.mark.parametrize("variant", [BKZ_SD_VARIANT, BKZ_SLD_RED])
def test_bkz_variants(variant):
    RandGen.init_with_seed(45)
    b = gen.gen_uniform(16, 12)
    param = BKZParam(6, None, flags=variant | BKZ_MAX_LOOPS, max_loops=2)
    st = bkz_reduction(b, param)
    assert st in (RED_SUCCESS, RED_BKZ_LOOPS_LIMIT)
    m = MatGSO(b, flags=GSO_ROW_EXPO)
    assert is_lll_reduced(m, 0.98, 0.52)


def test_strategies_with_preprocessing_and_pruning():
    """Programmatic strategies (test_bkz.cpp:322-389 analogue)."""
    block = 8
    strategies = [Strategy.EmptyStrategy(b) for b in range(block + 1)]
    strategies[block] = Strategy(
        block_size=block,
        pruning_parameters=[PruningParams.LinearPruningParams(block, 3)],
        preprocessing_block_sizes=[4])
    RandGen.init_with_seed(46)
    b = gen.gen_uniform(16, 12)
    param = BKZParam(block, strategies, flags=BKZ_AUTO_ABORT)
    st = bkz_reduction(b, param)
    assert st == RED_SUCCESS


def test_strategies_json_roundtrip(tmp_path):
    data = [
        {"block_size": 6,
         "preprocessing_block_sizes": [],
         "pruning_parameters": [[1.0, [1.0, 1.0, 0.9, 0.9, 0.8, 0.8], 0.7]]},
    ]
    p = tmp_path / "strat.json"
    p.write_text(json.dumps(data))
    strategies = load_strategies_json(str(p))
    assert len(strategies) == 7
    assert strategies[6].pruning_parameters[0].coefficients[2] == 0.9
    assert strategies[6].pruning_parameters[0].expectation == 0.7
    # earlier block sizes get default parameters
    assert strategies[3].pruning_parameters


def test_dump_gso(tmp_path):
    RandGen.init_with_seed(47)
    b = gen.gen_uniform(12, 10)
    param = BKZParam(4, None, flags=BKZ_DUMP_GSO | BKZ_MAX_LOOPS, max_loops=1)
    param.dump_gso_filename = str(tmp_path / "gso.json")
    bkz_reduction(b, param)
    data = json.loads(open(param.dump_gso_filename).read())
    assert data[0]["step"] == "Input"
    assert len(data[0]["norms"]) == 12
    assert data[-1]["step"] == "Output"


def test_linear_dependency_edge_case():
    """BKZ on a basis with linear dependencies (test_bkz.cpp:380-389)."""
    rows = [[1, 2, 3, 4], [2, 4, 6, 8], [3, 5, 7, 9], [1, 1, 1, 1]]
    b = fl.IntMat.from_rows(rows)
    st = bkz_reduction(b, 3, flags=BKZ_AUTO_ABORT)
    assert st == RED_SUCCESS


def test_checkpoint_resume(tmp_path):
    """BKZ writes per-loop checkpoints; a resumed run picks up the basis."""
    from fplll_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    RandGen.init_with_seed(50)
    b = gen.gen_uniform(14, 12)
    param = BKZParam(5, None, flags=BKZ_MAX_LOOPS, max_loops=2)
    param.checkpoint_file = str(tmp_path / "bkz.ckpt")
    bkz_reduction(b, param)
    b2, u2, meta = load_checkpoint(param.checkpoint_file)
    assert meta["loop"] >= 1
    assert b2.nrows == 14
    # resume: continuing from the checkpointed basis must succeed
    param2 = BKZParam(5, None, flags=BKZ_MAX_LOOPS, max_loops=1)
    assert bkz_reduction(b2, param2) in (RED_SUCCESS, RED_BKZ_LOOPS_LIMIT)


def test_checkpoint_roundtrip_bigints(tmp_path):
    from fplll_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    b = fl.IntMat.from_rows([[10 ** 90, -3], [7, 10 ** 80 + 1]])
    save_checkpoint(str(tmp_path / "c.json"), b, meta={"x": 1})
    b2, u2, meta = load_checkpoint(str(tmp_path / "c.json"))
    assert b2 == b and u2 is None and meta == {"x": 1}


@pytest.mark.slow
def test_bkz2_block40_dim60_device_path(monkeypatch):
    """BKZ-2.0 at the scale the framework claims (block >= 40, dim >= 60)
    through the TPU-eligible facade path: block 40 exceeds the device
    threshold (FPLLL_TPU_MIN_ENUM_DIM = 34) and the native-first hybrid
    floor is tiny, so every full window runs the batched kernel — the
    regime round-1 CI never exercised (reference runs dim 55+ in
    test_bkz.cpp:322-389). Quality gate: root-Hermite factor must reach
    the BKZ-40 regime, so a broken SVP window that merely leaves the
    basis LLL-reduced fails. Single-chip: the 8-shard virtual mesh
    shares the same CPU cores and has its own tests — compiling its
    shard_map per window bucket only slows this one down."""
    monkeypatch.setenv("FPLLL_TPU_HYBRID_NODES", "20000")
    monkeypatch.setenv("FPLLL_TPU_MESH", "0")
    RandGen.init_with_seed(77)
    b = gen.gen_qary_bits(60, 30, 20)
    from fplll_tpu.algs.wrapper import lll_reduction
    lll_reduction(b)
    pre_norm = first_norm(b)
    strategies = load_strategies_json("default.json")
    param = BKZParam(40, strategies,
                     flags=BKZ_MAX_LOOPS | BKZ_GH_BND, max_loops=1)
    st = bkz_reduction(b, param)
    assert st in (RED_SUCCESS, RED_BKZ_LOOPS_LIMIT)
    assert first_norm(b) <= pre_norm
    m = MatGSO(b, flags=GSO_ROW_EXPO)
    assert is_lll_reduced(m, 0.98, 0.52)
    # BKZ-40 predicts ~1.0122; LLL alone sits near 1.02+
    assert root_hermite_factor(b) < 1.016


@pytest.mark.slow
def test_bkz2_block45_odd_runs_pruned():
    """Odd block sizes must have non-empty pruning in the shipped
    strategies (round-2 gap: odd blocks 27-59 fell back to UNPRUNED
    enumeration and block 45 was effectively unusable). One tour at
    block 45 / dim 60 must finish quickly and reach BKZ-45 quality."""
    strategies = load_strategies_json("default.json")
    assert strategies[45].pruning_parameters, "block 45 unpruned"
    assert strategies[59].pruning_parameters, "block 59 unpruned"
    RandGen.init_with_seed(77)
    b = gen.gen_qary_bits(60, 30, 20)
    from fplll_tpu.algs.wrapper import lll_reduction
    lll_reduction(b)
    param = BKZParam(45, strategies,
                     flags=BKZ_MAX_LOOPS | BKZ_GH_BND, max_loops=1)
    st = bkz_reduction(b, param)
    assert st in (RED_SUCCESS, RED_BKZ_LOOPS_LIMIT)
    assert root_hermite_factor(b) < 1.016


@pytest.mark.slow
def test_bkz2_block60_dim70():
    """The BASELINE config-4 block size: one BKZ-2.0 tour at block 60
    must complete with the shipped strategies and reach the block-60
    quality regime (round-2 gap: block 60 was never run end-to-end).
    Progressive schedule (32 -> 46 -> 60): block-60 windows on a raw
    LLL profile are astronomically large for ANY pruning — every real
    block-60 run (and the reference's strategizer) reduces
    progressively so the profile the big windows see is already flat."""
    strategies = load_strategies_json("default.json")
    assert strategies[60].pruning_parameters
    RandGen.init_with_seed(99)
    b = gen.gen_qary_bits(70, 35, 20)
    from fplll_tpu.algs.wrapper import lll_reduction
    lll_reduction(b)
    for blk in (32, 46, 60):
        param = BKZParam(blk, strategies,
                         flags=BKZ_MAX_LOOPS | BKZ_GH_BND, max_loops=1)
        st = bkz_reduction(b, param)
        assert st in (RED_SUCCESS, RED_BKZ_LOOPS_LIMIT)
    assert root_hermite_factor(b) < 1.014
