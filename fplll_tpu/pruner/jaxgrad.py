"""Differentiable pruning-cost gradient (the SURVEY §7 improvement:
jax.grad of the polynomial cost instead of the reference's numerical
log-gradient, /root/reference/fplll/pruner/pruner_cost.cpp:115-134).

The even-simplex relative-volume recurrence (pruner_simplex.h:28-46) is
expressed as one lax.scan with a masked iteration count, vmapped over
all d prefix volumes at once — the traced graph stays O(1) in d, so the
jit compiles in milliseconds and one evaluation yields the whole
analytic gradient (the numerical scheme needs 2(d-1) cost calls).

The recurrence cancels catastrophically as d grows (the compiled primal
runs it in dd arithmetic for that reason), so the f64 autodiff primal is
trusted only up to _MAX_D; above that, or whenever the analytic gradient
comes back non-finite, the Pruner falls back to the numerical scheme.
The direction convention matches it exactly
(g_i ~ -2 b_i dlog(target)/db_i, last coordinate pinned).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

_MAX_D = 30


@lru_cache(maxsize=None)
def _build(d: int, metric: int, symmetry_factor: float, shell_ratio: float):
    from ..jaxsetup import jax, jnp
    from .pruner import (_TAB_BALL_VOL, _TAB_FACTORIAL,
                         PRUNER_METRIC_PROBABILITY_OF_SHORTEST)

    fact = jnp.asarray([float(_TAB_FACTORIAL[i]) for i in range(d + 1)])
    ballv = jnp.asarray([float(_TAB_BALL_VOL[i]) for i in range(2 * d + 2)])
    kinv = 1.0 / jnp.arange(1.0, d + 2.0)          # (d+1,)

    def rel_vol(rd, b):
        """rel volume of the rd-prefix body; rd is a traced int32."""
        binv = 1.0 / b[rd - 1]

        def body(P, j):
            # iteration j corresponds to i = rd-1-j, active while j < rd
            active = j < rd
            i = jnp.maximum(rd - 1 - j, 0)
            shifted = jnp.concatenate([jnp.zeros(1), P[:-1] * kinv])
            x = b[i] * binv
            # full-length Horner: trailing zero coeffs contribute nothing
            acc = jnp.asarray(0.0)
            def horner(a, c):
                return a * x + c, None
            acc, _ = jax.lax.scan(horner, acc, shifted[::-1])
            newP = shifted.at[0].set(-acc)
            return jnp.where(active, newP, P), None

        P0 = jnp.zeros(d + 2).at[0].set(1.0)
        P, _ = jax.lax.scan(body, P0, jnp.arange(d))
        sign = jnp.where(rd % 2 == 1, -1.0, 1.0)
        return sign * P[0] * fact[rd]

    rel_vols = jax.vmap(rel_vol, in_axes=(0, None))

    def cost_evec(b, ipv, radius):
        odd = rel_vols(jnp.arange(1, d + 1), b)        # (d,)
        rv = jnp.zeros(2 * d).at[0].set(1.0)
        rv = rv.at[1::2].set(odd)
        even = jnp.sqrt(jnp.maximum(odd[:-1] * odd[1:], 1e-300))
        rv = rv.at[2::2].set(even)
        i = jnp.arange(2 * d)
        tmp = (radius ** (i + 1.0)) * rv * ballv[1:2 * d + 1] * \
            jnp.sqrt(jnp.maximum(b[i // 2], 1e-300) ** (1.0 + i)) * \
            ipv * symmetry_factor
        return jnp.sum(tmp)

    def svp_prob(b):
        dx = shell_ratio
        bmdb = jnp.minimum(b / (dx * dx), 1.0)
        vol = rel_vol(jnp.int32(d), b)
        dxn = dx ** (2 * d)
        dvol = dxn * rel_vol(jnp.int32(d), bmdb) - vol
        return dvol / (dxn - 1.0)

    def exp_solutions(b, ipv, radius):
        j = 2 * d - 1
        t = jnp.log(jnp.maximum(rel_vol(jnp.int32(d), b), 1e-300))
        t = t + jnp.log(ballv[j + 1])
        t = t + (jnp.log(radius) +
                 jnp.log(jnp.maximum(b[j // 2], 1e-300)) / 2.0) * (j + 1)
        t = t + jnp.log(ipv[j])
        t = t + float(np.log(symmetry_factor))
        return jnp.exp(t)

    def log_target(b, ipv, radius, target, preproc_cost):
        if metric == PRUNER_METRIC_PROBABILITY_OF_SHORTEST:
            p = jnp.clip(svp_prob(b), 1e-12, 0.999999)
            trials = jnp.log1p(-target) / jnp.log1p(-p)
        else:
            e = jnp.maximum(exp_solutions(b, ipv, radius), 1e-300)
            trials = target / e
        trials = jnp.maximum(trials, 1.0)
        cost = cost_evec(b, ipv, radius)
        return jnp.log(jnp.maximum(cost * trials +
                                   preproc_cost * (trials - 1.0), 1e-300))

    return jax.jit(jax.grad(log_target, argnums=0))


def gradient(pruner, b) -> np.ndarray | None:
    """Analytic log-target gradient in the numerical scheme's convention,
    or None when the jax path does not apply (wrong length, too large d,
    non-finite result)."""
    d = pruner.d
    if len(b) != d or d > _MAX_D:
        return None
    try:
        fn = _build(d, int(pruner.metric), float(pruner.symmetry_factor),
                    float(pruner.shell_ratio))
        from ..jaxsetup import jnp
        g = fn(jnp.asarray(np.asarray(b, dtype=np.float64)),
               jnp.asarray(np.asarray(pruner.ipv[:2 * d],
                                      dtype=np.float64)),
               float(pruner.normalized_radius), float(pruner.target),
               float(pruner.preproc_cost))
        g = np.asarray(g, dtype=np.float64)
    except Exception:
        return None
    if not np.all(np.isfinite(g)):
        return None
    out = -2.0 * np.asarray(b, dtype=np.float64) * g
    out[-1] = 0.0
    return out
