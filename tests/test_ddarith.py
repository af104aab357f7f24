"""Device double-double arithmetic tests (the dd role of nr_FP_dd.inl):
EFT identities verified against exact Fraction arithmetic."""

from fractions import Fraction

import numpy as np
import pytest

from fplll_tpu.jaxsetup import jnp
from fplll_tpu.ops.ddarith import (DD, dd_add, dd_div, dd_from, dd_mul,
                                   dd_sqrt, dd_sub, two_prod, two_sum)


def exact(x: DD) -> Fraction:
    return Fraction(float(x.hi)) + Fraction(float(x.lo))


def test_two_sum_exact():
    a, b = jnp.asarray(1e16), jnp.asarray(1.0)
    s, e = two_sum(a, b)
    assert Fraction(float(s)) + Fraction(float(e)) == \
        Fraction(1e16) + Fraction(1)


def test_two_prod_exact():
    a, b = jnp.asarray(1e8 + 1.0), jnp.asarray(1e8 - 1.0)
    p, e = two_prod(a, b)
    assert Fraction(float(p)) + Fraction(float(e)) == \
        Fraction(float(a)) * Fraction(float(b))


def test_dd_add_beyond_f64():
    x = dd_from(jnp.asarray(1.0))
    y = DD(jnp.asarray(2.0 ** -80), jnp.asarray(0.0))
    z = dd_add(x, y)
    # plain f64 would lose the 2^-80 entirely
    assert exact(z) == Fraction(1) + Fraction(2) ** -80


def test_dd_mul_precision():
    a = dd_from(jnp.asarray(1.0 + 2.0 ** -40))
    z = dd_mul(a, a)
    want = (Fraction(1) + Fraction(2) ** -40) ** 2
    assert abs(exact(z) - want) < Fraction(2) ** -100


def test_dd_div_sqrt_roundtrip():
    x = dd_from(jnp.asarray(7.0))
    r = dd_sqrt(x)
    back = dd_mul(r, r)
    assert abs(exact(back) - 7) < Fraction(2) ** -98
    q = dd_div(dd_from(jnp.asarray(1.0)), dd_from(jnp.asarray(3.0)))
    assert abs(exact(q) - Fraction(1, 3)) < Fraction(2) ** -100


def test_dd_vectorized():
    hi = jnp.asarray(np.linspace(1.0, 2.0, 8))
    x = DD(hi, jnp.zeros(8))
    z = dd_sub(dd_mul(x, x), x)
    want = np.linspace(1.0, 2.0, 8) ** 2 - np.linspace(1.0, 2.0, 8)
    assert np.allclose(np.asarray(z.hi), want, rtol=1e-15)
