"""Double-double arithmetic for device kernels (error-free transforms).

The reference's dd/qd backends (nr/nr_FP_dd.inl, nr_FP_qd.inl wrapping
libqd) provide ~106/212-bit compensated-double arithmetic for the
precision ladder. On TPU the equivalent is pairs of floats combined with
TwoSum/TwoProd error-free transforms — this module implements the dd
operation set over JAX arrays (hi, lo pairs), usable inside jitted
kernels for >working-precision device trees and blocked GSO updates.

All functions are elementwise over arrays and differentiable-free (pure
arithmetic). With f64 pairs this yields ~106-bit precision on hosts and
f64-capable devices; with f32 pairs ~48-bit precision on the TPU VPU —
the natural "more precision than f32, cheaper than emulated f64" tier.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

from ..jaxsetup import jnp


class DD(NamedTuple):
    """Unevaluated sum hi + lo with |lo| <= ulp(hi)/2."""

    hi: jnp.ndarray
    lo: jnp.ndarray


def two_sum(a, b) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Knuth's TwoSum: a + b = s + e exactly."""
    s = a + b
    v = s - a
    e = (a - (s - v)) + (b - v)
    return s, e


def fast_two_sum(a, b) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dekker's FastTwoSum (requires |a| >= |b|)."""
    s = a + b
    e = b - (s - a)
    return s, e


def two_prod(a, b) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """a * b = p + e exactly (via FMA)."""
    p = a * b
    e = jnp.fma(a, b, -p) if hasattr(jnp, "fma") else _two_prod_split(a, b, p)
    return p, e


def _two_prod_split(a, b, p):
    """Dekker splitting fallback when no fused multiply-add is exposed."""
    # split constant: 2^27+1 for f64, 2^12+1 for f32
    c = jnp.asarray(134217729.0 if a.dtype == jnp.float64 else 4097.0, a.dtype)
    aa = c * a
    a_hi = aa - (aa - a)
    a_lo = a - a_hi
    bb = c * b
    b_hi = bb - (bb - b)
    b_lo = b - b_hi
    return ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo


def dd_from(a) -> DD:
    return DD(jnp.asarray(a), jnp.zeros_like(jnp.asarray(a)))


def dd_add(x: DD, y: DD) -> DD:
    s, e = two_sum(x.hi, y.hi)
    e = e + x.lo + y.lo
    hi, lo = fast_two_sum(s, e)
    return DD(hi, lo)


def dd_neg(x: DD) -> DD:
    return DD(-x.hi, -x.lo)


def dd_sub(x: DD, y: DD) -> DD:
    return dd_add(x, dd_neg(y))


def dd_mul(x: DD, y: DD) -> DD:
    p, e = two_prod(x.hi, y.hi)
    e = e + x.hi * y.lo + x.lo * y.hi
    hi, lo = fast_two_sum(p, e)
    return DD(hi, lo)


def dd_div(x: DD, y: DD) -> DD:
    q1 = x.hi / y.hi
    r = dd_sub(x, dd_mul(DD(q1, jnp.zeros_like(q1)), y))
    q2 = (r.hi + r.lo) / y.hi
    hi, lo = fast_two_sum(q1, q2)
    return DD(hi, lo)


def dd_sqrt(x: DD) -> DD:
    q1 = jnp.sqrt(x.hi)
    r = dd_sub(x, dd_mul(DD(q1, jnp.zeros_like(q1)),
                         DD(q1, jnp.zeros_like(q1))))
    q2 = (r.hi + r.lo) / (2.0 * q1)
    hi, lo = fast_two_sum(q1, q2)
    return DD(hi, lo)


def dd_dot(u_hi, u_lo, v_hi, v_lo) -> DD:
    """Compensated dot product of dd vectors along the last axis."""
    acc = DD(jnp.zeros(u_hi.shape[:-1], u_hi.dtype),
             jnp.zeros(u_hi.shape[:-1], u_hi.dtype))
    n = u_hi.shape[-1]
    for i in range(n):
        term = dd_mul(DD(u_hi[..., i], u_lo[..., i]),
                      DD(v_hi[..., i], v_lo[..., i]))
        acc = dd_add(acc, term)
    return acc
