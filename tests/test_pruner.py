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


def test_multi_shape_averaging():
    N = 20
    shapes = [[1.06 ** -i for i in range(N)],
              [1.05 ** -i for i in range(N)]]
    p = Pruner(0.9, 1e4, shapes)
    assert p.n == N
    c = p.single_enum_cost([1.0] * N)
    assert math.isfinite(c) and c > 0
