"""Blocked/device orthogonalization (fplll_tpu/ops/blockgso) vs the lazy
scalar recurrence (mirrors the reference's GSO cross-checks,
/root/reference/tests/test_gso.cpp:101-152, for the blocked kernels)."""

import numpy as np
import pytest

import fplll_tpu as fl
from fplll_tpu.core.gso import MatGSO
from fplll_tpu.defs import GSO_DEFAULT, GSO_INT_GRAM, GSO_ROW_EXPO
from fplll_tpu.nr.rng import RandGen
from fplll_tpu.ops import gen
from fplll_tpu.ops.blockgso import (chol_gso, full_gso, gram_from_basis,
                                    jax_chol_gso, wy_apply_row)


def _lazy_gso(b, flags):
    m = MatGSO(b.copy(), flags=flags)
    # force the scalar recurrence (bypass the blocked path)
    for i in range(m.d):
        assert m.update_gso_row(i)
    return m


def test_chol_gso_matches_recurrence():
    RandGen.init_with_seed(11)
    b = gen.gen_uniform(24, 12)
    m = _lazy_gso(b, GSO_DEFAULT)
    G = gram_from_basis(m.bf, m.n_known_cols)
    mu, r = chol_gso(G)
    for i in range(24):
        for j in range(i):
            assert abs(mu[i, j] - m.mu[i, j]) <= 1e-9 * max(1, abs(m.mu[i, j]))
        assert abs(r[i, i] - m.r[i, i]) <= 1e-9 * abs(m.r[i, i])


def test_jax_chol_gso_matches_host():
    RandGen.init_with_seed(12)
    b = gen.gen_uniform(16, 10)
    m = _lazy_gso(b, GSO_DEFAULT)
    G = gram_from_basis(m.bf, m.n_known_cols)
    host = chol_gso(G)
    dev = jax_chol_gso(G)
    assert host is not None and dev is not None
    np.testing.assert_allclose(dev[0], host[0], rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(dev[1], host[1], rtol=1e-10, atol=1e-12)


def test_chol_gso_rejects_dependent_rows():
    b = fl.IntMat.from_rows([[1, 2, 3], [2, 4, 6], [1, 0, 0]])
    m = MatGSO(b, flags=GSO_DEFAULT)
    G = gram_from_basis(m.bf, 3)
    assert chol_gso(G) is None  # caller falls back to the lazy recurrence


@pytest.mark.parametrize("flags", [GSO_DEFAULT, GSO_ROW_EXPO, GSO_INT_GRAM])
def test_update_gso_blocked_vs_lazy(flags):
    """MatGSO.update_gso (blocked path engaged) agrees with the pure
    scalar recurrence for every storage mode."""
    RandGen.init_with_seed(13)
    b = gen.gen_uniform(20, 14)
    m_blocked = MatGSO(b.copy(), flags=flags)
    assert m_blocked.update_gso()
    m_lazy = _lazy_gso(b, flags)
    for i in range(20):
        for j in range(i + 1):
            a = float(m_blocked.get_r(i, j))
            c = float(m_lazy.get_r(i, j))
            assert abs(a - c) <= 1e-7 * max(1.0, abs(c))


def test_update_gso_blocked_large_entries_row_expo():
    """Blocked recompute under GSO_ROW_EXPO with 300-bit entries (the
    scaled-Gram convention must round-trip through Cholesky). The basis
    is LLL-reduced first — a raw knapsack Gram is numerically rank-one
    in f64 and both paths correctly refuse it."""
    from fplll_tpu.algs.wrapper import lll_reduction
    RandGen.init_with_seed(14)
    b = gen.gen_intrel(18, 300)
    lll_reduction(b)
    m_blocked = MatGSO(b.copy(), flags=GSO_ROW_EXPO)
    assert m_blocked.update_gso()
    m_lazy = _lazy_gso(b, GSO_ROW_EXPO)
    for i in range(18):
        a = float(m_blocked.r[i, i])
        c = float(m_lazy.r[i, i])
        assert abs(a - c) <= 1e-7 * abs(c)
        assert m_blocked.row_expo[i] == m_lazy.row_expo[i]


def test_device_threshold_routing(monkeypatch):
    """full_gso routes to the device kernel at/above the dim threshold."""
    monkeypatch.setenv("FPLLL_TPU_DEVICE_GSO_DIM", "8")
    RandGen.init_with_seed(15)
    b = gen.gen_uniform(12, 10)
    m = _lazy_gso(b, GSO_DEFAULT)
    G = gram_from_basis(m.bf, m.n_known_cols)
    out = full_gso(G)
    assert out is not None
    host = chol_gso(G)
    np.testing.assert_allclose(out[1], host[1], rtol=1e-9)


def test_wy_apply_row_matches_sequential():
    """Compact-WY single-row application == sequential reflector loop."""
    rng = np.random.default_rng(7)
    # build a valid reflector panel from a reduced basis
    from fplll_tpu.core.householder import MatHouseholder
    RandGen.init_with_seed(16)
    b = gen.gen_uniform(10, 12)
    m = MatHouseholder(b)
    for k in range(7):
        m.refresh_R_bf(k)
        m.updated_R = False
        m.update_R(k, True)
    r0 = rng.standard_normal(m.n)
    # sequential application
    seq = r0.copy()
    for j in range(6):
        dotp = float(np.dot(m.V[j, j:], seq[j:]))
        seq[j:] -= dotp * m.V[j, j:]
        seq[j] *= m.sigma[j]
    m._refresh_vvt(6)
    wy = wy_apply_row(m.V, m.sigma, m._vvt, r0, 6)
    np.testing.assert_allclose(wy, seq, rtol=1e-10, atol=1e-12)
