"""Number-layer tests (mirrors /root/reference/tests/test_nr.cpp and
test_ceil.cpp: arithmetic/rounding across float backends, exact
helpers)."""

import math

import mpmath
import pytest

from fplll_tpu.nr.fctx import (F64Ctx, MPCtx, get_ctx, gso_min_prec,
                               hlll_min_prec, int_to_f_exp, l2_min_prec,
                               round_mul_2exp)
from fplll_tpu.defs import FT_DD, FT_DPE, FT_DOUBLE, FT_MPFR, FT_QD


def test_int_to_f_exp_exact_small():
    for x in [0, 1, -1, 7, -12345, 2 ** 52 + 1]:
        f, e = int_to_f_exp(x)
        assert math.ldexp(f, e) == float(x)


def test_int_to_f_exp_big():
    x = (1 << 3000) + (1 << 2950)
    f, e = int_to_f_exp(x)
    assert 0.5 <= abs(f) < 1.0
    assert abs(math.log2(abs(f)) + e - math.log2(x)) < 1e-12


def test_round_mul_2exp():
    assert round_mul_2exp(1.25, 2) == 5
    assert round_mul_2exp(-1.25, 2) == -5
    assert round_mul_2exp(0.5, 0) == 0       # ties to even
    assert round_mul_2exp(1.5, 0) == 2
    assert round_mul_2exp(2.5, 0) == 2
    assert round_mul_2exp(0.75, 1000) == 3 * 2 ** 998
    assert round_mul_2exp(1.0, -5) == 0
    assert round_mul_2exp(0.0, 10) == 0


@pytest.mark.parametrize("ft,prec", [(FT_DOUBLE, 53), (FT_DPE, 53),
                                     (FT_DD, 106), (FT_QD, 212),
                                     (FT_MPFR, 150)])
def test_ctx_roundtrip(ft, prec):
    ctx = get_ctx(ft, prec)
    # the contract is "at least the requested precision": the mpfr role
    # is served by the compiled dde/qde tiers when the precision fits
    assert ctx.prec >= prec
    x = ctx.from_int(12345)
    assert ctx.to_float(x) == 12345.0
    assert ctx.rnd_int(ctx.scalar(2.6)) == 3
    assert ctx.rnd_int(ctx.scalar(-2.6)) == -3
    assert ctx.is_finite(x)
    y = ctx.ldexp(x, 10)
    assert ctx.to_float(y) == 12345.0 * 1024


def test_mp_ctx_precision_respected():
    ctx = MPCtx(150)
    big = (1 << 149) + 1
    x = ctx.from_int(big)
    # 150-bit mantissa represents this exactly
    with mpmath.workprec(200):
        assert int(x) == big
    ctx53 = MPCtx(53)
    y = ctx53.from_int(big)
    with mpmath.workprec(200):
        assert int(y) != big  # rounded at 53 bits


def test_min_prec_formulas():
    prec, rho = gso_min_prec(55, 0.99, 0.51, 0.01)
    assert 10 < prec < 200
    l2 = l2_min_prec(55, 0.99, 0.51, 0.01)
    assert l2 >= prec - 10
    h = hlll_min_prec(20, 21, 0.99, 0.51, 0.001, 0.1)
    assert h > 53


def test_dot_sequential_mp():
    ctx = MPCtx(60)
    import numpy as np
    u = np.array([ctx.from_int(i) for i in range(5)], dtype=object)
    v = np.array([ctx.from_int(2 * i) for i in range(5)], dtype=object)
    assert int(ctx.dot(u, v)) == sum(i * 2 * i for i in range(5))
