"""GSO engine tests (mirrors /root/reference/tests/test_gso.cpp: cross-
check MatGSO against naive recomputation, Gram-object vs basis-object
equality, slope values; Householder vs update_R_naively)."""

import math

import numpy as np
import pytest

import fplll_tpu as fl
from fplll_tpu.core.householder import MatHouseholder
from fplll_tpu.defs import (GSO_INT_GRAM, GSO_ROW_EXPO,
                            HOUSEHOLDER_ROW_EXPO)
from fplll_tpu.nr.rng import RandGen
from fplll_tpu.ops import gen


def naive_gso(B):
    B = B.astype(float)
    n = B.shape[0]
    mu = np.zeros((n, n))
    r = np.zeros((n, n))
    bstar = np.zeros_like(B)
    for i in range(n):
        bstar[i] = B[i]
        for j in range(i):
            rij = B[i] @ bstar[j]
            mu[i, j] = rij / r[j, j]
            r[i, j] = rij
            bstar[i] = bstar[i] - mu[i, j] * bstar[j]
        r[i, i] = bstar[i] @ bstar[i]
    return mu, r


@pytest.mark.parametrize("flags", [0, GSO_ROW_EXPO, GSO_INT_GRAM])
def test_gso_vs_naive(flags):
    RandGen.init_with_seed(7)
    b = gen.gen_uniform(12, 10)
    m = fl.MatGSO(b, flags=flags)
    assert m.update_gso()
    mu_n, r_n = naive_gso(b.to_f64())
    for i in range(12):
        assert math.isclose(float(m.get_r(i, i)), r_n[i, i], rel_tol=1e-9)
        for j in range(i):
            assert math.isclose(float(m.get_mu(i, j)), mu_n[i, j],
                                rel_tol=1e-8, abs_tol=1e-9)


def test_incremental_consistency_after_ops():
    """Row ops + moves keep incremental state equal to fresh recompute."""
    RandGen.init_with_seed(11)
    b = gen.gen_uniform(10, 12)
    m = fl.MatGSO(b, flags=GSO_ROW_EXPO)
    m.update_gso()
    m.row_op_begin(3, 4)
    m.row_addmul_we(3, 1, -2.0, 0)
    m.row_op_end(3, 4)
    m.move_row(5, 2)
    m.move_row(1, 6)
    m.update_gso()
    m2 = fl.MatGSO(b.copy(), flags=GSO_ROW_EXPO)
    m2.update_gso()
    for i in range(10):
        for j in range(i):
            assert math.isclose(float(m.get_mu(i, j)), float(m2.get_mu(i, j)),
                                rel_tol=1e-8, abs_tol=1e-9)


def test_gram_object_matches_basis_object():
    """MatGSOGram(G) == MatGSO(B) when G = B B^T (test_ggso)."""
    RandGen.init_with_seed(2)
    b = gen.gen_uniform(9, 12)
    G = fl.IntMat.from_rows(
        [[b.dot_rows(i, j) for j in range(9)] for i in range(9)])
    m1 = fl.MatGSO(b, flags=GSO_INT_GRAM)
    m2 = fl.MatGSOGram(G, flags=GSO_INT_GRAM)
    m1.update_gso()
    m2.update_gso()
    for i in range(9):
        for j in range(i + 1):
            assert math.isclose(float(m1.get_r(i, j)), float(m2.get_r(i, j)),
                                rel_tol=1e-9, abs_tol=1e-12)


def test_current_slope_and_det():
    RandGen.init_with_seed(4)
    b = gen.gen_uniform(8, 10)
    m = fl.MatGSO(b, flags=0)
    m.update_gso()
    slope = m.get_current_slope(0, 8)
    assert isinstance(slope, float)
    # log-det must equal log |det(B)|^2
    logdet = float(m.get_log_det(0, 8))
    _, naive_r = naive_gso(b.to_f64())
    want = sum(math.log(naive_r[i, i]) for i in range(8))
    assert math.isclose(logdet, want, rel_tol=1e-9)


def test_babai_nearest_plane():
    """Babai on an already-orthogonal-ish basis recovers coefficients."""
    RandGen.init_with_seed(8)
    b = gen.gen_uniform(6, 8)
    from fplll_tpu.algs.wrapper import lll_reduction
    lll_reduction(b)
    m = fl.MatGSO(b, flags=0)
    m.update_gso()
    # target = 3*b_0 - 2*b_4 in GSO coordinate form via from_canonical
    w = [3 * int(b.a[0][j]) - 2 * int(b.a[4][j]) for j in range(b.ncols)]
    v = m.from_canonical([float(x) for x in w])
    coeffs = m.babai(v, from_floats=True)
    got = [0] * b.ncols
    for i, c in enumerate(coeffs):
        for j in range(b.ncols):
            got[j] += c * int(b.a[i][j])
    assert got == w


def test_householder_vs_naive():
    """MatHouseholder update_R vs update_R_naively (test_gso.cpp:101-152)."""
    RandGen.init_with_seed(13)
    b = gen.gen_uniform(10, 12)
    m = MatHouseholder(b, flags=HOUSEHOLDER_ROW_EXPO)
    m.refresh_R_bf()
    for i in range(10):
        m.updated_R = False
        m.update_R(i, True)
    m.update_R_naively()
    for i in range(10):
        v1, e1 = m.get_R(i, i)
        v2, e2 = m.get_R_naively(i, i)
        assert math.isclose(float(v1) * 2.0 ** e1, float(v2) * 2.0 ** e2,
                            rel_tol=1e-8)


def test_canonical_roundtrip():
    RandGen.init_with_seed(21)
    b = gen.gen_uniform(7, 10)
    m = fl.MatGSO(b, flags=0)
    m.update_gso()
    v = [1.0, -2.0, 0.5, 0.0, 3.0, -1.0, 2.0]
    w = m.to_canonical(v)
    v2 = m.from_canonical(w)
    assert np.allclose(v, v2, rtol=1e-7, atol=1e-8)
