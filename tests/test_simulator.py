"""Tests for the Chen-Nguyen BKZ simulator (fplll_tpu/algs/simulator.py)
and its wiring into the strategy generator.

The reference ships no simulator; these are property tests in the
spirit of its verifier-based strategy (SURVEY.md section 4): exact
invariants (volume conservation), qualitative shape laws (slope
flattens with block size; profiles are near-monotone), and artifact
integrity for the calibrated HKZ tail."""

import importlib.util
import json
import math
import os

import pytest

from fplll_tpu.algs.simulator import (TAIL_DIM, _gh_tail, hkz_tail_profile,
                                      simulate, simulated_block_shape)

HERE = os.path.dirname(os.path.abspath(__file__))


def lll_profile(n: int, slope: float = 1.0219):
    ld = math.log(slope)
    return [math.exp(-4.0 * ld * i) for i in range(n)]


def test_simulate_conserves_volume_and_flattens():
    r = lll_profile(140)
    s, tours = simulate(r, 55)
    assert 1 <= tours <= 20
    lv0 = sum(math.log(x) for x in r)
    lv1 = sum(math.log(x) for x in s)
    assert abs(lv1 - lv0) < 1e-6
    # head slope (outside the HKZ tail) must flatten vs the LLL seed
    head = 140 - TAIL_DIM
    sl_seed = (math.log(r[0]) - math.log(r[head])) / head
    sl_sim = (math.log(s[0]) - math.log(s[head])) / head
    assert sl_sim < 0.75 * sl_seed


def test_simulate_slope_decreases_with_beta():
    r = lll_profile(150)
    head = 150 - TAIL_DIM
    slopes = []
    for beta in (46, 60, 80):
        s, _ = simulate(r, beta, max_tours=40)
        slopes.append((math.log(s[0]) - math.log(s[head])) / head)
    assert slopes[0] > slopes[1] > slopes[2] > 0


def test_simulate_fixed_point_early_stop():
    r = lll_profile(120)
    s1, _ = simulate(r, 60, max_tours=40)
    s2, tours2 = simulate(s1, 60, max_tours=40)
    # an already-simulated profile is (near) a fixed point: one checking
    # tour, at most marginal drift
    assert tours2 <= 3
    for a, b in zip(s1, s2):
        assert abs(math.log(a) - math.log(b)) < 0.05


def test_hkz_tail_artifact_and_fallback():
    tail = hkz_tail_profile(TAIL_DIM)
    assert len(tail) == TAIL_DIM
    assert abs(sum(tail)) < 1e-9                 # zero-sum (unit volume)
    assert tail[0] == max(tail)                  # head is the largest
    path = os.path.join(HERE, "..", "fplll_tpu", "strategies",
                        "hkz_tail.json")
    with open(path) as f:
        data = json.load(f)
    stored = data[str(TAIL_DIM)]
    assert len(stored) == TAIL_DIM
    assert data["_meta"][str(TAIL_DIM)]["trials"] >= 8
    # the calibrated tail is what hkz_tail_profile returns (zero-summed)
    mean = sum(stored) / TAIL_DIM
    for a, b in zip(tail, stored):
        assert abs(a - (b - mean)) < 1e-9
    # fallback exists and is sane even without the artifact
    fb = _gh_tail(TAIL_DIM)
    assert abs(sum(fb)) < 1e-9
    rms = math.sqrt(sum((a - b) ** 2 for a, b in zip(tail, fb)) / TAIL_DIM)
    assert rms < 0.5                             # same ballpark shape


def test_simulated_block_shape_properties():
    shape = simulated_block_shape(80, 52)
    assert len(shape) == 80
    assert abs(sum(math.log(x) for x in shape)) < 1e-6   # unit det
    assert shape[0] == max(shape)
    # near-monotone decay: allow tiny local wiggles only
    for i in range(79):
        assert shape[i + 1] < shape[i] * 1.02
    with pytest.raises(ValueError):
        simulated_block_shape(80, 30)


def _load_gen_strategies():
    spec = importlib.util.spec_from_file_location(
        "gen_strategies",
        os.path.join(HERE, "..", "tools", "gen_strategies.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_gen_strategies_uses_simulated_shape_above_70():
    gs = _load_gen_strategies()
    lo = gs.block_shape(60)
    gsa = gs.gsa_shape(60)
    assert lo == gsa                             # GSA regime unchanged
    hi = gs.block_shape(80)
    assert hi != gs.gsa_shape(80)
    # the window is preprocessed at block 52 (the chain's strongest
    # stage), so the simulated shape is STEEPER than the GSA line of the
    # target block 80 but no steeper than the GSA line of block 40
    sl_sim = (math.log(hi[0]) - math.log(hi[-1])) / 79
    sl80 = (math.log(gs.gsa_shape(80)[0]) -
            math.log(gs.gsa_shape(80)[-1])) / 79
    sl40 = (math.log(gs.gsa_shape(40)[0]) -
            math.log(gs.gsa_shape(40)[-1])) / 39
    assert sl80 < sl_sim < sl40
