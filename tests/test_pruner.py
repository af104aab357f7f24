"""Pruner tests (mirrors /root/reference/tests/test_pruner.cpp: whitebox
checks of enforce / relative_volume, expected probability values, and
end-to-end prune() on a known shape)."""

import math

import numpy as np
import pytest

from fplll_tpu.defs import (PRUNER_GRADIENT, PRUNER_METRIC_EXPECTED_SOLUTIONS,
                            PRUNER_METRIC_PROBABILITY_OF_SHORTEST,
                            PRUNER_NELDER_MEAD)
from fplll_tpu.pruner.pruner import (Pruner, _relative_volume, prune,
                                     svp_probability)


def test_relative_volume_known_values():
    """Step bounding functions at Nbis=24 (test_pruner.cpp:151-199)."""
    n = 24
    for v, want in [(0.3, 0.07822479096), (0.5, 0.5), (0.7, 0.921775209040006)]:
        pr = [1.0] * (n // 2) + [v] * (n // 2)
        p = svp_probability(pr)
        assert abs(1 - p / want) < 0.05


def test_relative_volume_montecarlo():
    rng = np.random.default_rng(0)
    b = [0.4, 0.6, 0.8, 0.9, 1.0]
    d = len(b)
    n = 2 * d
    M = 200000
    x = rng.normal(size=(M, n))
    pts = x / np.linalg.norm(x, axis=1, keepdims=True) * \
        rng.random((M, 1)) ** (1.0 / n)
    csq = np.cumsum(pts ** 2, axis=1)
    ok = np.ones(M, dtype=bool)
    for i in range(d):
        ok &= csq[:, 2 * i + 1] <= b[i]
    mc = ok.mean()
    rv = _relative_volume(d, b)
    assert abs(rv - mc) < 0.01


def test_enforce():
    gso = [1.06 ** -i for i in range(20)]
    p = Pruner(0.9, 1e4, gso)
    b = np.array([0.5, 0.3, 0.9, 0.8, 1.2, 0.7, 0.9, 1.0, 1.0, 0.4])
    p.enforce(b)
    assert (np.diff(b) >= -1e-9).all()        # non-decreasing
    assert b[-1] == 1.0
    assert (b <= 1.0).all()


def test_prune_reduces_cost():
    N = 30
    gso = [1.06 ** -i for i in range(N)]
    radius = 0.9 * gso[0]
    res = prune(radius, 1e4, gso, target=0.5, flags=PRUNER_GRADIENT)
    p = Pruner(radius, 1e4, gso, 0.5, flags=PRUNER_GRADIENT)
    assert p.single_enum_cost(res.coefficients) < p.single_enum_cost([1.0] * N)
    assert 0.3 <= res.expectation <= 1.0
    assert len(res.coefficients) == N
    assert res.coefficients[0] == 1.0


def test_prune_expected_solutions_metric():
    N = 24
    gso = [1.05 ** -i for i in range(N)]
    radius = 1.1 * gso[0]
    res = prune(radius, 1e4, gso, target=1.0,
                metric=PRUNER_METRIC_EXPECTED_SOLUTIONS,
                flags=PRUNER_GRADIENT)
    assert len(res.coefficients) == N


# -- golden cost/probability tables (test_pruner.cpp:213-305) ---------------
_GOLD_N = 56
_GOLD_GSO = [1.06 ** -i for i in range(_GOLD_N)]
_GOLD_PR = ([1.0] * 14 + [0.937197] * 2 + [0.871731] * 2 + [0.814304] * 2 +
            [0.762232] * 2 + [0.713898] * 2 + [0.668279] * 2 +
            [0.624701] * 2 + [0.58271] * 2 + [0.541994] * 2 +
            [0.502342] * 2 + [0.463617] * 2 + [0.425747] * 2 +
            [0.388723] * 2 + [0.35262] * 2 + [0.317642] * 2 +
            [0.284261] * 2 + [0.254584] * 6 + [0.2] * 4)


def test_prepruned_golden():
    """Expected cost/probability of a fixed pruning profile
    (test_pruner.cpp:213-244: cost 2.01206e7, probability 0.556)."""
    p = Pruner(.85, 20000., _GOLD_GSO)
    cost = p.single_enum_cost(_GOLD_PR)
    assert abs(1 - cost / 2.01206e7) < .01
    proba = p.measure_metric(_GOLD_PR)
    assert abs(1 - proba / .556) < .01


def test_unpruned_golden():
    """Unpruned cost 3.20e10 with probability 1; averaging in a 20x
    larger third shape cuts the cost to 2/3 (test_pruner.cpp:246-305)."""
    p = Pruner(.85, 20000., _GOLD_GSO)
    ones = [1.0] * _GOLD_N
    cost = p.single_enum_cost(ones)
    assert abs(1 - cost / 3.20e10) < .02
    assert abs(1 - p.measure_metric(ones)) < .02
    big = [x * 20 for x in _GOLD_GSO]
    p3 = Pruner(.85, 0., [_GOLD_GSO, _GOLD_GSO, big])
    cost3 = p3.single_enum_cost(ones)
    assert abs(1 - 1.5 * cost3 / 3.20e10) < .02
    assert abs(1 - p3.measure_metric(ones)) < .02


def test_auto_prune_drivers():
    """End-to-end optimizer drivers on an LLL-reduced qary basis
    (test_pruner.cpp:306-460): greedy/expected-solutions, gradient,
    reprune-from-input, Nelder-Mead."""
    from fplll_tpu.defs import PRUNER_START_FROM_INPUT
    from fplll_tpu.ops.gen import gen_qary_bits
    from fplll_tpu.nr.rng import RandGen
    from fplll_tpu.algs.wrapper import lll_reduction
    from fplll_tpu.core.gso import MatGSO

    n = 15
    RandGen.init_with_seed(7)
    b = gen_qary_bits(2 * n, n, 30)
    lll_reduction(b)
    m = MatGSO(b)
    m.update_gso()
    r = [m.get_r(i, i) for i in range(2 * n)]
    overhead = 1.0e6 * n * n
    radius = r[0] * .3

    res = prune(radius, overhead, r, target=20,
                metric=PRUNER_METRIC_EXPECTED_SOLUTIONS, flags=0)
    assert res.expectation > 0.0
    assert .05 <= res.gh_factor < 20.
    assert res.coefficients[0] == 1.0
    assert sum(res.detailed_cost) > 0

    res = prune(radius, overhead, r, target=0.3,
                metric=PRUNER_METRIC_PROBABILITY_OF_SHORTEST,
                flags=PRUNER_GRADIENT)
    assert 0.0 < res.expectation <= 1.001
    assert res.coefficients[0] == 1.0

    res = prune(radius, overhead, r, target=0.01,
                metric=PRUNER_METRIC_PROBABILITY_OF_SHORTEST,
                flags=PRUNER_GRADIENT | PRUNER_START_FROM_INPUT,
                pruning=res)
    assert 0.0 < res.expectation <= 1.001
    assert res.coefficients[0] == 1.0

    res = prune(radius, overhead, r, target=0.3,
                metric=PRUNER_METRIC_PROBABILITY_OF_SHORTEST,
                flags=PRUNER_NELDER_MEAD)
    assert 0.0 < res.expectation <= 1.001
    assert res.coefficients[0] == 1.0


def test_fixed_prob_driver_hits_target():
    """PRUNER_SINGLE fixed-probability driver converges to the target
    metric (pruner_optimize.cpp:102-146 + the _tp passes)."""
    from fplll_tpu.defs import PRUNER_SINGLE
    n = 60
    gso = [1.06 ** (2 * (n - i)) for i in range(n)]
    gh = math.exp(sum(math.log(x) for x in gso) / n)
    p = Pruner(1.1 * gh, 1e6, gso, target=0.3,
               metric=PRUNER_METRIC_PROBABILITY_OF_SHORTEST,
               flags=PRUNER_GRADIENT | PRUNER_NELDER_MEAD | PRUNER_SINGLE)
    coeffs = p.optimize_coefficients([])
    prob = p.measure_metric(coeffs)
    assert 0.25 < prob < 0.36  # local_adjust_prob targets +-5%
    assert all(coeffs[i] >= coeffs[i + 1] - 1e-9 for i in range(n - 1))


def test_multi_shape_averaging():
    N = 20
    shapes = [[1.06 ** -i for i in range(N)],
              [1.05 ** -i for i in range(N)]]
    p = Pruner(0.9, 1e4, shapes)
    assert p.n == N
    c = p.single_enum_cost([1.0] * N)
    assert math.isfinite(c) and c > 0


def test_jax_gradient_matches_numerical():
    """The analytic jax.grad path (SURVEY §7's replacement of the
    reference's numerical log-gradient, pruner_cost.cpp:115-134) must
    agree with the numerical scheme in direction and magnitude."""
    import math
    import os

    import numpy as np

    from fplll_tpu.pruner import jaxgrad
    from fplll_tpu.pruner.pruner import (Pruner,
                                         PRUNER_METRIC_PROBABILITY_OF_SHORTEST)

    ld = math.log(1.012)
    r = [math.exp(-4 * ld * i) for i in range(40)]
    gh = math.exp(sum(math.log(x) for x in r) / 40 -
                  2 * ((40 / 2) * math.log(math.pi) -
                       math.lgamma(21)) / 40)
    p = Pruner(1.1 * gh, 1e10, r, 0.5,
               PRUNER_METRIC_PROBABILITY_OF_SHORTEST)
    b = np.linspace(0.3, 1.0, p.d)
    p.enforce(b)
    g_jax = jaxgrad.gradient(p, b)
    assert g_jax is not None
    old = os.environ.get("FPLLL_TPU_PRUNER_JAXGRAD")
    os.environ["FPLLL_TPU_PRUNER_JAXGRAD"] = "0"
    try:
        g_num = p._gradient(b.copy())
    finally:
        if old is None:
            os.environ.pop("FPLLL_TPU_PRUNER_JAXGRAD", None)
        else:
            os.environ["FPLLL_TPU_PRUNER_JAXGRAD"] = old
    cos = float(np.dot(g_jax, g_num) /
                (np.linalg.norm(g_jax) * np.linalg.norm(g_num)))
    assert cos > 0.999
    assert g_jax[-1] == 0.0
