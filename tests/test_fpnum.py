"""Compiled dpe/dd/qd scalar tower (fplll_tpu/native/fpnum.c) vs the
mpmath soft-float oracle (mirrors the reference's per-backend arithmetic
tests, /root/reference/tests/test_nr.cpp, for the compiled tiers)."""

import math
import random

import mpmath
import pytest

from fplll_tpu.native import get_fpnum
from fplll_tpu.nr.fctx import comps_to_int_mul_2exp, compiled_ctx

fp = get_fpnum()
pytestmark = pytest.mark.skipif(fp is None, reason="native build unavailable")


def _val(x):
    comps, off = x.parts()
    with mpmath.workprec(300):
        return mpmath.ldexp(mpmath.fsum([mpmath.mpf(c) for c in comps]), off)


@pytest.mark.parametrize("kind,bits", [("dpe", 51), ("dd", 102), ("qd", 202)])
def test_arith_accuracy(kind, bits):
    """add/sub/mul/div/sqrt accurate to the tier's precision."""
    rng = random.Random(1234)
    mk = getattr(fp, kind)
    for _ in range(200):
        a = rng.uniform(-1e5, 1e5)
        b = rng.uniform(-1e5, 1e5) or 1.0
        xa, xb = mk(a), mk(b)
        with mpmath.workprec(300):
            for got, ref in [
                (xa + xb, mpmath.mpf(a) + mpmath.mpf(b)),
                (xa - xb, mpmath.mpf(a) - mpmath.mpf(b)),
                (xa * xb, mpmath.mpf(a) * mpmath.mpf(b)),
                (xa / xb, mpmath.mpf(a) / mpmath.mpf(b)),
                (abs(xa).sqrt(), mpmath.sqrt(abs(mpmath.mpf(a)))),
            ]:
                g = _val(got)
                if ref == 0:
                    assert g == 0
                else:
                    err = abs((g - ref) / ref)
                    assert err <= mpmath.ldexp(1, -bits), (kind, a, b)


@pytest.mark.parametrize("kind", ["dpe", "dd", "qd"])
def test_cancellation_exact(kind):
    """(a + tiny) - a recovers tiny exactly within the tier's range."""
    mk = getattr(fp, kind)
    a, tiny = 1.0, 2.0 ** -50
    got = (mk(a) + mk(tiny)) - mk(a)
    assert float(got) == tiny


def test_dd_bigint_roundtrip():
    x = 2 ** 100 + 12345
    v = fp.dd(x)
    comps, off = v.parts()
    assert off == 0
    assert int(comps[0]) + int(comps[1]) == x


def test_qd_bigint_roundtrip():
    x = (2 ** 200 + 3) * 7 + (1 << 140) + 99
    v = fp.qd(x)
    comps, _ = v.parts()
    assert sum(int(c) for c in comps) == x


def test_dpe_unbounded_exponent():
    v = fp.dpe(1.5).ldexp(100000)
    assert v.is_finite()
    assert v.exponent() == 100001
    w = v / v
    assert float(w) == 1.0
    assert (v * v).exponent() == 200002


def test_nint_ties_even():
    for kind in ("dpe", "dd", "qd"):
        mk = getattr(fp, kind)
        assert float(mk(2.5).nint()) == 2.0
        assert float(mk(3.5).nint()) == 4.0
        assert float(mk(-2.5).nint()) == -2.0
        assert float(mk(1.25).nint()) == 1.0


def test_dd_nint_crossing_half():
    # hi exactly a half-integer; lo decides the side
    up = fp.dd_pair(2.5, 1e-20)
    dn = fp.dd_pair(2.5, -1e-20)
    assert float(up.nint()) == 3.0
    assert float(dn.nint()) == 2.0


def test_comps_to_int_round():
    assert comps_to_int_mul_2exp((1.5,), 1) == 3
    assert comps_to_int_mul_2exp((0.75,), 1) == 2  # 1.5 -> ties even -> 2
    assert comps_to_int_mul_2exp((-0.75,), 1) == -2
    assert comps_to_int_mul_2exp((float(2 ** 60), 3.0), 0) == 2 ** 60 + 3
    assert comps_to_int_mul_2exp((1.0,), 200) == 2 ** 200


def test_division_by_zero_propagates():
    for kind in ("dpe", "dd", "qd"):
        mk = getattr(fp, kind)
        v = mk(1.0) / mk(0.0)
        assert not v.is_finite()


def test_ctx_protocol_roundtrip():
    for kind in ("dpe", "dd", "qd"):
        ctx = compiled_ctx(kind)
        assert ctx is not None
        z = ctx.zeros((3, 3))
        z[0, 0] = ctx.scalar(2.0)
        assert ctx.to_float(z[0, 0] * z[0, 0]) == 4.0
        big = 2 ** 200 + 17
        v = ctx.from_int(big)
        assert ctx.is_finite(v)
        # frexp exponent contract: 2^(e-1) <= |x| < 2^e
        e = ctx.exponent(v)
        assert e == 201
        d = ctx.dot(ctx.zeros(4) + ctx.scalar(2.0), ctx.zeros(4) + ctx.scalar(3.0))
        assert ctx.to_float(d) == 24.0
        assert ctx.rnd_int(ctx.scalar(7.3)) == 7


def test_numpy_object_array_broadcast():
    import numpy as np
    ctx = compiled_ctx("dd")
    a = ctx.zeros(5)
    a[...] = ctx.scalar(3.0)
    s = ctx.scalar(2.0)
    out = a * s  # ndarray.__rmul__ fallback must engage elementwise
    assert all(ctx.to_float(x) == 6.0 for x in out)
    out2 = a - s * a
    assert all(ctx.to_float(x) == -3.0 for x in out2)
