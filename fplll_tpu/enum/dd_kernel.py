"""Double-word (compensated f32-pair) variant of the batched lockstep
enumeration kernel.

Motivation: Mosaic/TPU has no hardware f64, and emulated f64 is slow, so
the production kernel runs the tree in f32 with a relative bound slack.
That slack (1e-5) is only safe for heuristic searches whose candidates
are re-verified exactly; certified searches — the proved SVP/CVP drivers
with error-bounded evaluators (reference: svpcvp.cpp:154-174,
evaluator.cpp:213-360) — need the tree itself to carry enough precision
that the certified error margin added to the radius dominates tree
rounding.  The reference runs every tree in hardware double
(nr/nr.h:41); the TPU-native equivalent implemented here is pairs of
f32 combined with error-free transforms (TwoSum/TwoProd from
fplll_tpu.ops.ddarith), giving ~48-bit effective mantissa at a small
constant-factor cost over plain f32 — far cheaper than emulated f64.

Only the accumulated quantities are double-word: center partial sums
`cs`, `center`, `partdist`, and the newdist/bound comparisons.  The
integer coordinates x/dx/ddx stay plain f32 (they are exact integers);
the one-hot selection machinery is exact by construction.  Layout and
control flow mirror fplll_tpu.enum.tpu._enum_run (same zig-zag, SVP
symmetry breaking, on-device root queue); see that module for the
design rationale and reference citations (enumerate_base.h:79-172).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np

from ..jaxsetup import jax, jnp
from ..ops.ddarith import DD, dd_add, dd_mul, dd_sub, two_sum

__all__ = ["_enum_run_dd", "split_dd"]

_F32 = np.float32


def split_dd(a) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side split of an f64 array into an (hi, lo) f32 pair with
    hi + lo == a to f32-pair precision (~48 bits)."""
    a = np.asarray(a, dtype=np.float64)
    hi = a.astype(_F32)
    with np.errstate(invalid="ignore"):
        lo = np.where(np.isfinite(a), a - hi.astype(np.float64), 0.0)
    return hi, lo.astype(_F32)


def _cround(x):
    """C round(): halves away from zero, elementwise."""
    return jnp.trunc(x + jnp.where(x >= 0, 0.5, -0.5))


def _sel(dd: DD, ohf) -> DD:
    """Exact one-hot row selection of a per-level dd vector: (B,m)x(m,)."""
    return DD(ohf @ dd.hi, ohf @ dd.lo)


def _where(c, a: DD, b: DD) -> DD:
    return DD(jnp.where(c, a.hi, b.hi), jnp.where(c, a.lo, b.lo))


def _lt(a: DD, b: DD):
    """a < b. The hi component dominates unless it ties; hi+lo keeps the
    correct sign because |lo| <= ulp(hi)/2."""
    d = dd_sub(a, b)
    return d.hi + d.lo < 0


def _le(a: DD, b: DD):
    d = dd_sub(a, b)
    return d.hi + d.lo <= 0


def _make_step_dd(mut: DD, rdiag: DD, prune: DD, m: int, is_svp: bool,
                  count_mode: bool, dual: bool = False,
                  findsubsols: bool = False):
    """dd lockstep step over state width m (cf. tpu._make_step).

    findsubsols mirrors the f32 kernel's per-level best-partial capture;
    subsol distances are ranked and recorded by the rounded hi+lo sum
    (subsolutions feed BKZ-2.0 recursion heuristics, not the certified
    bound — reference records them in plain double either way,
    enumerate_base.cpp:203-229)."""
    dtype = jnp.float32
    mut_t = DD(mut.hi.T, mut.lo.T)
    cols = jnp.arange(m)
    pd_cols = jnp.arange(m + 1)
    one = jnp.asarray(1.0, dtype)
    zero = jnp.asarray(0.0, dtype)

    def step(st):
        x, dx, ddx = st["x"], st["dx"], st["ddx"]
        center = DD(st["center"], st["center_lo"])
        partdist = DD(st["partdist"], st["partdist_lo"])
        cs = DD(st["cs"], st["cs_lo"])
        k, active = st["k"], st["active"]
        A = DD(st["A"], st["A_lo"])
        best = DD(st["best_dist"], st["best_dist_lo"])
        kc = jnp.clip(k, 0, m - 1)

        oh = (cols[None, :] == kc[:, None])
        ohf = oh.astype(dtype)
        oh_pdf = (pd_cols[None, :] == kc[:, None]).astype(dtype)
        xk = jnp.sum(x * ohf, axis=1)
        ck = _sel_mat(center, ohf)
        pdk = DD(jnp.sum(partdist.hi * oh_pdf, axis=1),
                 jnp.sum(partdist.lo * oh_pdf, axis=1))
        rk = _sel(rdiag, ohf)
        prk = _sel(prune, ohf)

        alpha = dd_sub(DD(xk, jnp.zeros_like(xk)), ck)
        newdist = dd_add(pdk, dd_mul(dd_mul(alpha, alpha), rk))
        bound = dd_mul(prk, DD(jnp.broadcast_to(A.hi, prk.hi.shape),
                               jnp.broadcast_to(A.lo, prk.lo.shape)))
        ok = active & _le(newdist, bound)
        at_bottom = kc == 0

        nd_sum = newdist.hi + newdist.lo
        nontrivial = (nd_sum > 0) if is_svp else jnp.full_like(ok, True)
        sol_found = ok & at_bottom & nontrivial
        # compare via rounded sums: TwoSum on the +inf initial best yields
        # NaN, and an ulp-level tie at worst keeps the incumbent
        better = sol_found & (nd_sum < best.hi + best.lo)
        best = _where(better, newdist, best)
        best_dev = jnp.where(better[:, None], x, st["best_dev"])
        sol_count = st["sol_count"] + sol_found.astype(jnp.float64)
        if count_mode:
            A_new = A
        else:
            key = jnp.where(sol_found, nd_sum, jnp.inf)
            lane = jnp.argmin(key)
            lane_oh = (jnp.arange(key.shape[0]) == lane).astype(dtype)
            cand = DD(jnp.sum(newdist.hi * lane_oh),
                      jnp.sum(newdist.lo * lane_oh))
            shrink = jnp.any(sol_found) & _lt(cand, A)
            A_new = _where(shrink, cand, A)

        nodes = st["nodes"] + jnp.sum(ohf * ok[:, None].astype(dtype),
                                      axis=0).astype(jnp.float64)

        ss = {}
        if findsubsols:
            improving = ok & (nd_sum > 0)
            cand = jnp.where(oh & improving[:, None], nd_sum[:, None],
                             jnp.inf)                 # (B, m)
            ss_dist = jnp.min(cand, axis=0)           # (m,)
            ss_lane = jnp.argmin(cand, axis=0)        # (m,)
            ss_x = jnp.where(cols[None, :] >= cols[:, None],
                             x[ss_lane], zero)        # (m, m)
            ss = {"ss_dist": ss_dist, "ss_lane": ss_lane, "ss_x": ss_x}

        descend = ok & ~at_bottom
        mut_col = _sel_mat2(mut_t, ohf)               # (B, m) dd: row kc of mu
        below_k = cols[None, :] < kc[:, None]
        wk = alpha if dual else DD(xk, jnp.zeros_like(xk))
        term = dd_mul(DD(wk.hi[:, None], wk.lo[:, None]), mut_col)
        maskf = (descend[:, None] & below_k).astype(dtype)
        cs = dd_sub(cs, DD(term.hi * maskf, term.lo * maskf))
        k_down = kc - 1
        oh_down = (cols[None, :] == k_down[:, None])
        ohf_down = oh_down.astype(dtype)
        c_new = _sel_mat(cs, ohf_down)
        c_sum = c_new.hi + c_new.lo
        x_new = _cround(c_sum)
        d_init = jnp.where(c_sum >= x_new, one, -one)
        sel_down = descend[:, None] & oh_down
        center = _where(sel_down, DD(c_new.hi[:, None], c_new.lo[:, None]),
                        center)
        x = jnp.where(sel_down, x_new[:, None], x)
        dx = jnp.where(sel_down, d_init[:, None], dx)
        ddx = jnp.where(sel_down, d_init[:, None], ddx)
        oh_pd_down = (pd_cols[None, :] == k_down[:, None])
        partdist = _where(descend[:, None] & oh_pd_down,
                          DD(newdist.hi[:, None], newdist.lo[:, None]),
                          partdist)

        fail = active & ~ok
        sib = sol_found | (ok & at_bottom & ~nontrivial) | fail
        k_sib = jnp.where(fail, kc + 1, kc)
        lane_done = fail & (k_sib >= m)
        do_sib = sib & ~lane_done
        ks = jnp.clip(k_sib, 0, m - 1)
        oh_s = (cols[None, :] == ks[:, None])
        ohf_s = oh_s.astype(dtype)

        asc = do_sib & fail
        mut_col_s = _sel_mat2(mut_t, ohf_s)
        below_s = cols[None, :] < ks[:, None]
        xs = jnp.sum(x * ohf_s, axis=1)
        if dual:
            # restore the alpha contribution subtracted at descend time
            cks = _sel_mat(center, ohf_s)
            ws = dd_sub(DD(xs, jnp.zeros_like(xs)), cks)
        else:
            ws = DD(xs, jnp.zeros_like(xs))
        term_s = dd_mul(DD(ws.hi[:, None], ws.lo[:, None]), mut_col_s)
        maskf_s = (asc[:, None] & below_s).astype(dtype)
        cs = dd_add(cs, DD(term_s.hi * maskf_s, term_s.lo * maskf_s))

        oh_pds = (pd_cols[None, :] == ks[:, None]).astype(dtype)
        pds_sum = jnp.sum(partdist.hi * oh_pds, axis=1) + \
            jnp.sum(partdist.lo * oh_pds, axis=1)
        dxs = jnp.sum(dx * ohf_s, axis=1)
        ddxs = jnp.sum(ddx * ohf_s, axis=1)
        zero_pd = pds_sum == 0
        if is_svp:
            x_adv = jnp.where(zero_pd, xs + one, xs + dxs)
        else:
            x_adv = xs + dxs
        ddx_adv = jnp.where(zero_pd & is_svp, ddxs, -ddxs)
        dx_adv = jnp.where(zero_pd & is_svp, dxs, ddx_adv - dxs)
        sel_s = do_sib[:, None] & oh_s
        x = jnp.where(sel_s, x_adv[:, None], x)
        dx = jnp.where(sel_s, dx_adv[:, None], dx)
        ddx = jnp.where(sel_s, ddx_adv[:, None], ddx)

        k = jnp.where(descend, k_down, jnp.where(do_sib, k_sib, k))
        active = active & ~lane_done
        return dict(x=x, dx=dx, ddx=ddx,
                    center=center.hi, center_lo=center.lo,
                    partdist=partdist.hi, partdist_lo=partdist.lo,
                    cs=cs.hi, cs_lo=cs.lo, k=k, active=active,
                    A=A_new.hi, A_lo=A_new.lo,
                    best_dist=best.hi, best_dist_lo=best.lo,
                    best_dev=best_dev, sol_count=sol_count, nodes=nodes,
                    better=better, **ss)

    return step


def _sel_mat(v: DD, ohf) -> DD:
    """One-hot row selection from a per-lane dd matrix: (B,m)·(B,m)->(B,)."""
    return DD(jnp.sum(v.hi * ohf, axis=1), jnp.sum(v.lo * ohf, axis=1))


def _sel_mat2(mat_t: DD, ohf) -> DD:
    """Select row k of a dd matrix for every lane: (B,m)@(m,m)->(B,m)."""
    return DD(ohf @ mat_t.hi, ohf @ mat_t.lo)


@partial(jax.jit, static_argnames=("m", "is_svp", "count_mode", "max_steps",
                                   "batch", "dual", "findsubsols"))
def _enum_run_dd(mut_hi, mut_lo, rdiag_hi, rdiag_lo, prune_hi, prune_lo,
                 mut_fix_hi, mut_fix_lo, cp0_hi, cp0_lo,
                 roots_x, roots_a, roots_pd_hi, roots_pd_lo, A0_hi, A0_lo,
                 m: int, is_svp: bool, count_mode: bool, max_steps: int,
                 batch: int = 1024, dual: bool = False,
                 findsubsols: bool = False):
    """dd-pair whole-enumeration kernel with on-device root refill
    (cf. tpu._enum_run; same queue semantics, dd accumulators)."""
    B = batch
    R = roots_x.shape[0]
    nfix = roots_x.shape[1]
    dtype = jnp.float32
    mut = DD(mut_hi, mut_lo)
    rdiag = DD(rdiag_hi, rdiag_lo)
    prune = DD(prune_hi, prune_lo)
    cp0 = DD(cp0_hi, cp0_lo)
    step = _make_step_dd(mut, rdiag, prune, m, is_svp, count_mode, dual=dual,
                         findsubsols=findsubsols)

    def make_fresh(ra, rpd: DD):
        """Lane state from root rows; the nfix-term center-sum is
        accumulated in dd (static Python loop — nfix is a shape)."""
        cs = DD(jnp.broadcast_to(cp0.hi[None, :], (B, m)),
                jnp.broadcast_to(cp0.lo[None, :], (B, m)))
        for j in range(nfix):
            w = ra[:, j]
            col = DD(mut_fix_hi[:, j], mut_fix_lo[:, j])
            term = dd_mul(DD(w[:, None], jnp.zeros_like(w)[:, None]),
                          DD(col.hi[None, :], col.lo[None, :]))
            cs = dd_sub(cs, term)
        k0 = m - 1
        c0 = DD(cs.hi[:, k0], cs.lo[:, k0])
        c0_sum = c0.hi + c0.lo
        x0 = _cround(c0_sum)
        if is_svp:
            x0 = jnp.where(rpd.hi + rpd.lo == 0.0, jnp.maximum(x0, 0.0), x0)
        d0 = jnp.where(c0_sum >= x0, 1.0, -1.0).astype(dtype)
        x = jnp.zeros((B, m), dtype).at[:, k0].set(x0)
        dx = jnp.ones((B, m), dtype).at[:, k0].set(d0)
        ddx = jnp.ones((B, m), dtype).at[:, k0].set(d0)
        center = DD(jnp.zeros((B, m), dtype).at[:, k0].set(c0.hi),
                    jnp.zeros((B, m), dtype).at[:, k0].set(c0.lo))
        partdist = DD(jnp.zeros((B, m + 1), dtype).at[:, k0].set(rpd.hi),
                      jnp.zeros((B, m + 1), dtype).at[:, k0].set(rpd.lo))
        return x, dx, ddx, center, partdist, cs

    A0 = DD(A0_hi, A0_lo)
    idx0 = jnp.arange(B)
    ridx0 = jnp.clip(idx0, 0, R - 1)
    rx0 = roots_x[ridx0]
    ra0 = roots_a[ridx0]
    rpd0 = DD(roots_pd_hi[ridx0], roots_pd_lo[ridx0])
    live0 = (idx0 < R) & jnp.isfinite(rpd0.hi) & \
        _le(rpd0, DD(jnp.broadcast_to(A0.hi, (B,)),
                     jnp.broadcast_to(A0.lo, (B,))))
    rpd0 = _where(live0, rpd0, DD(jnp.zeros(B, dtype), jnp.zeros(B, dtype)))
    x, dx, ddx, center, partdist, cs = make_fresh(ra0, rpd0)
    st = {
        "x": x, "dx": dx, "ddx": ddx,
        "center": center.hi, "center_lo": center.lo,
        "partdist": partdist.hi, "partdist_lo": partdist.lo,
        "cs": cs.hi, "cs_lo": cs.lo,
        "k": jnp.full((B,), m - 1, dtype=jnp.int32),
        "active": live0,
        "lane_root": rx0.astype(dtype),
        "A": jnp.asarray(A0.hi, dtype), "A_lo": jnp.asarray(A0.lo, dtype),
        "best_dist": jnp.full((B,), jnp.inf, dtype=dtype),
        "best_dist_lo": jnp.zeros((B,), dtype=dtype),
        "best_dev": jnp.zeros((B, m), dtype=dtype),
        "best_root": jnp.zeros((B, nfix), dtype=dtype),
        "sol_count": jnp.zeros((B,), dtype=jnp.float64),
        "nodes": jnp.zeros((m,), dtype=jnp.float64),
        "cursor": jnp.asarray(B, dtype=jnp.int32),
        "steps": jnp.asarray(0, dtype=jnp.int32),
    }
    if findsubsols:
        # reference init: record starts at r_kk (enumerate_base.cpp:203)
        st["subsol_dist"] = rdiag.hi + rdiag.lo
        st["subsol_vec"] = jnp.zeros((m, m), dtype=dtype)
        st["subsol_root"] = jnp.zeros((m, nfix), dtype=dtype)

    def body(st):
        lane_root = st["lane_root"]
        cursor = st["cursor"]
        steps = st["steps"]
        best_root_prev = st["best_root"]
        if findsubsols:
            ss_dist_prev = st.pop("subsol_dist")
            ss_vec_prev = st.pop("subsol_vec")
            ss_root_prev = st.pop("subsol_root")
        out = step(st)
        better = out.pop("better")
        out["best_root"] = jnp.where(better[:, None], lane_root,
                                     best_root_prev) if nfix \
            else best_root_prev
        out["lane_root"] = lane_root
        out["cursor"] = cursor
        out["steps"] = steps + 1
        if findsubsols:
            ss_dist = out.pop("ss_dist")
            ss_lane = out.pop("ss_lane")
            ss_x = out.pop("ss_x")
            upd = ss_dist < ss_dist_prev
            out["subsol_dist"] = jnp.where(upd, ss_dist, ss_dist_prev)
            out["subsol_vec"] = jnp.where(upd[:, None], ss_x, ss_vec_prev)
            out["subsol_root"] = jnp.where(upd[:, None], lane_root[ss_lane],
                                           ss_root_prev) if nfix \
                else ss_root_prev

        need = ~out["active"] & (out["cursor"] < R)

        def do_refill(s):
            needv = ~s["active"]
            rank = jnp.cumsum(needv.astype(jnp.int32)) - 1
            ridx = s["cursor"] + rank
            can = needv & (ridx < R)
            ridx_c = jnp.clip(ridx, 0, R - 1)
            rx = roots_x[ridx_c].astype(dtype)
            ra = roots_a[ridx_c].astype(dtype)
            rpd = DD(roots_pd_hi[ridx_c], roots_pd_lo[ridx_c])
            A_cur = DD(jnp.broadcast_to(s["A"], (B,)),
                       jnp.broadcast_to(s["A_lo"], (B,)))
            live = can & jnp.isfinite(rpd.hi) & _le(rpd, A_cur)
            rpd = _where(live, rpd, DD(jnp.zeros(B, dtype),
                                       jnp.zeros(B, dtype)))
            fx, fdx, fddx, fcenter, fpartdist, fcs = make_fresh(ra, rpd)
            sel = can[:, None]
            s = dict(s)
            s["x"] = jnp.where(sel, fx, s["x"])
            s["dx"] = jnp.where(sel, fdx, s["dx"])
            s["ddx"] = jnp.where(sel, fddx, s["ddx"])
            s["center"] = jnp.where(sel, fcenter.hi, s["center"])
            s["center_lo"] = jnp.where(sel, fcenter.lo, s["center_lo"])
            s["cs"] = jnp.where(sel, fcs.hi, s["cs"])
            s["cs_lo"] = jnp.where(sel, fcs.lo, s["cs_lo"])
            s["partdist"] = jnp.where(can[:, None], fpartdist.hi,
                                      s["partdist"])
            s["partdist_lo"] = jnp.where(can[:, None], fpartdist.lo,
                                         s["partdist_lo"])
            s["k"] = jnp.where(can, jnp.int32(m - 1), s["k"])
            s["active"] = jnp.where(can, live, s["active"])
            if nfix:
                s["lane_root"] = jnp.where(sel, rx, s["lane_root"])
            s["cursor"] = jnp.minimum(
                s["cursor"] + jnp.sum(needv, dtype=jnp.int32),
                jnp.asarray(R, dtype=jnp.int32))
            return s

        return jax.lax.cond(jnp.any(need), do_refill, lambda s: s, out)

    def cond(s):
        return (jnp.any(s["active"]) | (s["cursor"] < R)) & \
            (s["steps"] < max_steps)

    out = jax.lax.while_loop(cond, body, st)
    # on-device top-K finalize (cf. tpu._enum_run): rank by the rounded
    # dd sum — exact enough to order solutions, and ties keep both lanes
    K = min(B, 128)
    _, idx = jax.lax.top_k(-(out["best_dist"] + out["best_dist_lo"]), K)
    res = {kk: out[kk] for kk in ("A", "A_lo", "nodes", "cursor", "steps")}
    res["best_dist"] = out["best_dist"][idx]
    res["best_dist_lo"] = out["best_dist_lo"][idx]
    res["best_dev"] = out["best_dev"][idx]
    res["best_root"] = out["best_root"][idx]
    res["sol_count"] = jnp.sum(out["sol_count"])
    if findsubsols:
        for kk in ("subsol_dist", "subsol_vec", "subsol_root"):
            res[kk] = out[kk]
    return res
