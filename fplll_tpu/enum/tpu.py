"""Batched lockstep-DFS enumeration kernel (the scale-out axis).

TPU-native re-design of the reference's enumeration engines: instead of
one recursive tree walk per thread (enumerate_base.cpp, enum-parallel/
enumeration.h:154 enumerate_recur), the search tree is split at a host-
chosen level into many subtree roots (generalizing enumlib's two "swirl"
levels, enum-parallel/enumlib_dim.cpp:40-45), and a jitted XLA kernel
advances B independent DFS frontiers in lockstep, one tree node per lane
per step, entirely on device:

- state is SoA: x/dx/ddx/center/partdist/cs laid out (B, m) so every
  step is a handful of fused (B, m) vector ops on the VPU;
- the shared shrinking radius A is a traced scalar updated with a lane
  min-reduction each step — the collective analogue of enumlib's
  atomic bound + signal-flag broadcast (enumeration.h:68-146); across a
  device mesh it becomes a jax.lax.pmin (see fplll_tpu.parallel);
- finished lanes are refilled with fresh subtree roots by the host
  between kernel invocations (the work queue replacing enumlib's
  work-stealing swirlys queue, enumeration.h:412-505).

Zig-zag sibling stepping, SVP symmetry breaking, pruning bounds
(partdistbounds[i] = pruning[i] * A) and the node-per-level counters all
follow the reference contracts (enumerate_base.h:79-172) so this kernel
is interchangeable with the host oracle behind fplll_tpu.enum.api.
"""

from __future__ import annotations

import math
from functools import partial
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..jaxsetup import jax, jnp
from .cpu import _roundf
from .evaluator import (EVALSTRATEGY_FIRST_N_SOLUTIONS, Evaluator)

__all__ = ["TPUEnumerator", "tpu_external_enumerator", "register_tpu_backend"]

_F = jnp.float64
_NEG = -1.0


def _cround(x):
    """C round(): halves away from zero, elementwise."""
    return jnp.trunc(x + jnp.where(x >= 0, 0.5, -0.5))


@partial(jax.jit, static_argnames=("m", "is_svp", "count_mode", "max_steps"))
def _enum_steps(mut, rdiag, prune, state, m: int, is_svp: bool,
                count_mode: bool, max_steps: int):
    """Advance all lanes until every lane finishes or max_steps elapse.

    mut: (m, m) upper-triangular mu^T for device levels; rdiag: (m,);
    prune: (m,) pruning coefficients. state: dict of SoA arrays.
    """
    mut_t = mut.T  # row gather of column k: mut_t[k] = mut[:, k]
    cols = jnp.arange(m)

    def body(st):
        x, dx, ddx = st["x"], st["dx"], st["ddx"]
        center, partdist, cs = st["center"], st["partdist"], st["cs"]
        k, active = st["k"], st["active"]
        A = st["A"]
        kc = jnp.clip(k, 0, m - 1)

        take = lambda a: jnp.take_along_axis(a, kc[:, None], axis=1)[:, 0]
        xk = take(x)
        ck = take(center)
        pdk = jnp.take_along_axis(partdist, kc[:, None], axis=1)[:, 0]
        rk = rdiag[kc]
        prk = prune[kc]

        alpha = xk - ck
        newdist = pdk + alpha * alpha * rk
        ok = active & (newdist <= prk * A)
        at_bottom = kc == 0

        nontrivial = (newdist > 0.0) if is_svp else jnp.full_like(ok, True)
        sol_found = ok & at_bottom & nontrivial

        # record the lane-best solution; A shrinks to the global best
        better = sol_found & (newdist < st["best_dist"])
        best_dist = jnp.where(better, newdist, st["best_dist"])
        best_x = jnp.where(better[:, None], x, st["best_x"])
        if count_mode:
            sol_count = st["sol_count"] + sol_found.astype(jnp.int64)
            A_new = A
        else:
            sol_count = st["sol_count"] + sol_found.astype(jnp.int64)
            A_new = jnp.minimum(A, jnp.min(jnp.where(sol_found, newdist,
                                                     jnp.inf)))

        # per-level node counter
        onehot_k = (cols[None, :] == kc[:, None])
        nodes = st["nodes"] + jnp.sum(onehot_k & ok[:, None], axis=0,
                                      dtype=jnp.int64)

        descend = ok & ~at_bottom
        # --- descend: commit x[k] into cs for levels < k -------------------
        mut_col = mut_t[kc]                       # (B, m): mut[j, k] at col j
        below_k = cols[None, :] < kc[:, None]
        cs = cs - jnp.where((descend[:, None]) & below_k,
                            xk[:, None] * mut_col, 0.0)
        k_down = kc - 1
        onehot_down = (cols[None, :] == k_down[:, None])
        c_new = jnp.take_along_axis(cs, jnp.clip(k_down, 0, m - 1)[:, None],
                                    axis=1)[:, 0]
        x_new = _cround(c_new)
        d_init = jnp.where(c_new >= x_new, 1.0, -1.0)
        sel_down = descend[:, None] & onehot_down
        center = jnp.where(sel_down, c_new[:, None], center)
        x = jnp.where(sel_down, x_new[:, None], x)
        dx = jnp.where(sel_down, d_init[:, None], dx)
        ddx = jnp.where(sel_down, d_init[:, None], ddx)
        pd_cols = jnp.arange(m + 1)
        onehot_pd = (pd_cols[None, :] == k_down[:, None])
        partdist = jnp.where(descend[:, None] & onehot_pd,
                             newdist[:, None], partdist)

        # --- sibling step: at level k (solution) or k+1 (bound fail) -------
        fail = active & ~ok
        sib = sol_found | (ok & at_bottom & ~nontrivial) | fail
        k_sib = jnp.where(fail, kc + 1, kc)
        lane_done = fail & (k_sib >= m)
        do_sib = sib & ~lane_done
        ks = jnp.clip(k_sib, 0, m - 1)

        # un-commit x[k+1] when ascending
        asc = do_sib & fail
        mut_col_s = mut_t[ks]
        below_s = cols[None, :] < ks[:, None]
        xs = jnp.take_along_axis(x, ks[:, None], axis=1)[:, 0]
        cs = cs + jnp.where(asc[:, None] & below_s, xs[:, None] * mut_col_s,
                            0.0)

        # zig-zag / symmetric advance (enumerate_base.h:145-172)
        pds = jnp.take_along_axis(partdist, ks[:, None], axis=1)[:, 0]
        dxs = jnp.take_along_axis(dx, ks[:, None], axis=1)[:, 0]
        ddxs = jnp.take_along_axis(ddx, ks[:, None], axis=1)[:, 0]
        zero_pd = pds == 0.0
        if is_svp:
            x_adv = jnp.where(zero_pd, xs + 1.0, xs + dxs)
        else:
            x_adv = xs + dxs
        ddx_adv = jnp.where(zero_pd & is_svp, ddxs, -ddxs)
        dx_adv = jnp.where(zero_pd & is_svp, dxs, ddx_adv - dxs)

        onehot_s = (cols[None, :] == ks[:, None])
        sel_s = do_sib[:, None] & onehot_s
        x = jnp.where(sel_s, x_adv[:, None], x)
        dx = jnp.where(sel_s, dx_adv[:, None], dx)
        ddx = jnp.where(sel_s, ddx_adv[:, None], ddx)

        k = jnp.where(descend, k_down, jnp.where(do_sib, k_sib, k))
        active = active & ~lane_done

        return {"x": x, "dx": dx, "ddx": ddx, "center": center,
                "partdist": partdist, "cs": cs, "k": k, "active": active,
                "A": A_new, "best_dist": best_dist, "best_x": best_x,
                "sol_count": sol_count, "nodes": nodes,
                "steps": st["steps"] + 1}

    def cond(st):
        return jnp.any(st["active"]) & (st["steps"] < max_steps)

    return jax.lax.while_loop(cond, body, state)


class TPUEnumerator:
    """Host driver for the batched kernel: splits the tree, generates and
    refills subtree roots, merges lane solutions into the evaluator."""

    def __init__(self, batch: int = 1024, max_device_levels: int = 64,
                 target_root_factor: int = 32, steps_per_launch: int = 50000,
                 dive_nodes: int = 2000):
        self.batch = batch
        self.max_device_levels = max_device_levels
        self.target_root_factor = target_root_factor
        self.steps_per_launch = steps_per_launch
        self.dive_nodes = dive_nodes
        self.nodes: np.ndarray = np.zeros(0, dtype=np.int64)

    # -- host-side root generation (layered top-tree expansion) -------------
    def _gen_roots(self, mut: np.ndarray, rdiag: np.ndarray,
                   prune: np.ndarray, cp0: np.ndarray, A: float,
                   d: int, is_svp: bool) -> Tuple[np.ndarray, np.ndarray, int]:
        """Expand the top of the tree level by level until enough subtree
        roots exist. Returns (root_x (R, d-m), root_pd (R,), m); root_x
        column j holds the coordinate of level m+j. Top-level node counts
        are accumulated into self.nodes."""
        target = self.target_root_factor * self.batch
        xs = np.zeros((1, 0))
        pd = np.zeros(1)
        zero_prefix = np.array([is_svp])
        lvl = d - 1
        while lvl >= 1:
            m_cand = lvl + 1
            if m_cand <= self.max_device_levels and \
                    (xs.shape[0] >= target or m_cand <= 2):
                break
            c = cp0[lvl] - (xs @ mut[lvl, lvl + 1:d] if xs.shape[1] else 0.0)
            c = np.asarray(c, dtype=np.float64) + np.zeros(xs.shape[0])
            room = prune[lvl] * A - pd
            w = np.sqrt(np.maximum(room, 0.0) / rdiag[lvl])
            lo = np.ceil(c - w).astype(np.int64)
            hi = np.floor(c + w).astype(np.int64)
            lo = np.where(zero_prefix, np.maximum(lo, 0), lo)
            cnt = np.maximum(hi - lo + 1, 0)
            self.nodes[lvl] += int(cnt.sum())
            idx = np.repeat(np.arange(xs.shape[0]), cnt)
            offs = (np.arange(len(idx)) -
                    np.repeat(np.cumsum(cnt) - cnt, cnt)) if len(idx) else \
                np.zeros(0, dtype=np.int64)
            xv = (lo[idx] + offs).astype(np.float64)
            a = xv - c[idx]
            pd = pd[idx] + a * a * rdiag[lvl]
            xs = np.concatenate([xv[:, None], xs[idx]], axis=1)
            zero_prefix = zero_prefix[idx] & (xv == 0)
            lvl -= 1
        m = lvl + 1
        keep = pd <= A
        # each level was prepended at column 0, so columns are already in
        # ascending level order m..d-1
        return xs[keep], pd[keep], m

    # -- main entry ----------------------------------------------------------
    def enumerate(self, mut: np.ndarray, rdiag: np.ndarray,
                  prune: Optional[np.ndarray], cp0: np.ndarray, maxdist: float,
                  is_svp: bool, evaluator: Evaluator,
                  count_mode: bool = False) -> Tuple[float, np.ndarray]:
        """Search the full tree over levels [0, d). All quantities are in
        the normalized scale of the caller (2^-normexp, like the extenum
        contract). Returns (final maxdist, per-level node counts)."""
        d = len(rdiag)
        mut = np.asarray(mut, dtype=np.float64)
        rdiag = np.asarray(rdiag, dtype=np.float64)
        prune = (np.ones(d) if prune is None or len(prune) == 0
                 else np.asarray(prune, dtype=np.float64))
        cp0 = np.asarray(cp0, dtype=np.float64)
        self.nodes = np.zeros(d, dtype=np.int64)
        A = float(maxdist)

        roots_x, roots_pd, m_real = self._gen_roots(mut, rdiag, prune, cp0, A,
                                                    d, is_svp)
        order = np.argsort(roots_pd)
        roots_x, roots_pd = roots_x[order], roots_pd[order]
        B = self.batch
        nfix = d - m_real

        # pad the device tree height up to a bucket so the jitted kernel is
        # traced once per bucket: virtual levels admit exactly x=0 (center 0,
        # huge rdiag kills any sibling immediately)
        m = min(((m_real + 7) // 8) * 8, self.max_device_levels)
        mut_pad = np.zeros((m, m))
        mut_pad[:m_real, :m_real] = mut[:m_real, :m_real]
        rdiag_pad = np.full(m, 1e300)
        rdiag_pad[:m_real] = rdiag[:m_real]
        prune_pad = np.ones(m)
        prune_pad[:m_real] = prune[:m_real]
        cp0_pad = np.zeros(m)
        cp0_pad[:m_real] = cp0[:m_real]

        mut_dev = jnp.asarray(mut_pad)
        rdiag_dev = jnp.asarray(rdiag_pad)
        prune_dev = jnp.asarray(prune_pad)

        best_overall: List[Tuple[float, np.ndarray]] = []
        total_sols = 0
        qpos = 0

        def make_state(xs_batch, pd_batch, live):
            """Initialize lanes from roots (the prepare_enumeration step)."""
            R = xs_batch.shape[0]
            # root coord x_j (level j >= m_real) shifts the center at level
            # i < m_real by x_j * mut[i][j] (upper triangle of mu^T);
            # virtual levels [m_real, m) keep center 0
            cs = np.zeros((R, m))
            cs[:, :m_real] = cp0[:m_real][None, :] - \
                (xs_batch @ mut[:m_real, m_real:d].T if nfix else 0.0)
            x = np.zeros((R, m))
            center = np.zeros((R, m))
            dxa = np.ones((R, m))
            ddxa = np.ones((R, m))
            partdist = np.zeros((R, m + 1))
            partdist[:, m] = 0.0
            k0 = m - 1
            center[:, k0] = cs[:, k0]
            # top zero-prefix lanes in SVP mode must start at x=max(round,0)?
            xr = np.vectorize(_roundf)(center[:, k0])
            zerop = live & (pd_batch == 0) & is_svp
            x[:, k0] = np.where(zerop, np.maximum(xr, 0.0), xr)
            dxa[:, k0] = ddxa[:, k0] = np.where(center[:, k0] >= x[:, k0],
                                                1.0, -1.0)
            partdist[:, k0] = pd_batch
            return {
                "x": jnp.asarray(x), "dx": jnp.asarray(dxa),
                "ddx": jnp.asarray(ddxa), "center": jnp.asarray(center),
                "partdist": jnp.asarray(partdist), "cs": jnp.asarray(cs),
                "k": jnp.full((R,), k0, dtype=jnp.int32),
                "active": jnp.asarray(live),
                "A": jnp.asarray(A, dtype=jnp.float64),
                "best_dist": jnp.full((R,), np.inf),
                "best_x": jnp.zeros((R, m)),
                "sol_count": jnp.zeros((R,), dtype=jnp.int64),
                "nodes": jnp.zeros((m,), dtype=jnp.int64),
                "steps": jnp.asarray(0, dtype=jnp.int64),
            }

        # lanes are refilled from the root queue after every launch so a
        # few giant subtrees do not leave the rest of the batch idle (the
        # work-queue role of enumlib's swirlys, enumeration.h:412-505)
        R_total = len(roots_pd)
        lane_roots = np.zeros((B, nfix))
        state_np = None

        def harvest(bd, bx, roots_of_lane, mask):
            nonlocal A, total_sols
            for i in np.where(mask)[0]:
                full = np.concatenate([bx[i][:m_real], roots_of_lane[i]])
                best_overall.append((float(bd[i]), full))
            if not count_mode and mask.any():
                A = min(A, float(bd[mask].min()))

        def fresh_rows(count):
            """Pop up to `count` still-live roots from the queue."""
            nonlocal qpos
            while qpos < R_total:
                # roots are sorted by pd, so the first dead root ends the queue
                chunk = slice(qpos, min(qpos + max(count, 1), R_total))
                live = roots_pd[chunk] <= A
                if not live.any():
                    qpos = R_total
                    break
                n_take = int(live.sum())
                xs_sel = roots_x[chunk][live][:count]
                pd_sel = roots_pd[chunk][live][:count]
                qpos += int(np.asarray(live).size)
                return xs_sel.reshape(len(pd_sel), nfix), pd_sel
            return np.zeros((0, nfix)), np.zeros(0)

        while True:
            if state_np is None:
                xs_f, pd_f = fresh_rows(B)
                nf = len(pd_f)
                if nf == 0:
                    break
                xs_b = np.zeros((B, nfix))
                pd_b = np.zeros(B)
                live = np.zeros(B, dtype=bool)
                xs_b[:nf] = xs_f
                pd_b[:nf] = pd_f
                live[:nf] = True
                lane_roots = xs_b
                state = make_state(xs_b, pd_b, live)
            else:
                # compact live lanes, harvest + replace finished ones
                active = state_np["active"]
                n_active = int(active.sum())
                done = ~active
                harvest(state_np["best_dist"], state_np["best_x"], lane_roots,
                        done & np.isfinite(state_np["best_dist"]))
                if n_active == 0 and qpos >= R_total:
                    break
                xs_f, pd_f = fresh_rows(B - n_active)
                nf = len(pd_f)
                if n_active == 0 and nf == 0:
                    break
                if nf:
                    fresh = make_state(xs_f, pd_f, np.ones(nf, dtype=bool))
                    slots = np.where(done)[0][:nf]
                    for key in ("x", "dx", "ddx", "center", "partdist", "cs",
                                "best_x"):
                        state_np[key][slots] = np.asarray(fresh[key])[:nf]
                    state_np["k"][slots] = np.asarray(fresh["k"])[:nf]
                    state_np["active"][slots] = True
                    state_np["best_dist"][slots] = np.inf
                    state_np["sol_count"][slots] = 0
                    lane_roots[slots] = xs_f
                    # deactivate remaining finished lanes for clarity
                    state = {k: jnp.asarray(v) for k, v in state_np.items()
                             if k not in ("A", "steps", "nodes")}
                    state["A"] = jnp.asarray(min(A, float(state_np["A"])),
                                             dtype=jnp.float64)
                    state["nodes"] = jnp.asarray(state_np["nodes"])
                    state["steps"] = jnp.asarray(0, dtype=jnp.int64)
                else:
                    state = {k: (jnp.asarray(v) if k != "steps" else
                                 jnp.asarray(0, dtype=jnp.int64))
                             for k, v in state_np.items()}
                    state["A"] = jnp.asarray(min(A, float(state_np["A"])),
                                             dtype=jnp.float64)

            state["steps"] = jnp.asarray(0, dtype=jnp.int64)
            state = _enum_steps(mut_dev, rdiag_dev, prune_dev, state,
                                m=m, is_svp=bool(is_svp),
                                count_mode=bool(count_mode),
                                max_steps=self.steps_per_launch)
            state_np = {k: np.array(v) for k, v in state.items()}
            self.nodes[:m] += state_np["nodes"]
            state_np["nodes"][:] = 0
            total_sols += int(state_np["sol_count"].sum())
            state_np["sol_count"][:] = 0
            # harvest improving solutions from still-active lanes too, so A
            # propagates across batches through harvest()
            liveband = np.isfinite(state_np["best_dist"])
            if liveband.any() and not count_mode:
                A = min(A, float(state_np["best_dist"][liveband].min()))

        # final harvest
        if state_np is not None:
            harvest(state_np["best_dist"], state_np["best_x"], lane_roots,
                    np.isfinite(state_np["best_dist"]))

        # merge solutions into the evaluator (shortest first)
        best_overall.sort(key=lambda t: t[0])
        maxdist_out = maxdist
        if count_mode:
            evaluator.sol_count += total_sols
            return maxdist_out, self.nodes
        for dist, full in best_overall[:max(evaluator.max_sols * 4, 8)]:
            maxdist_out = evaluator.eval_sol(list(full), dist, maxdist_out)
        return maxdist_out, self.nodes


# ---------------------------------------------------------------------------
# Backend adapter for the enumeration facade (the extenum seam)
# ---------------------------------------------------------------------------
_MIN_TPU_DIM = 8


def tpu_external_enumerator(gso, evaluator, first, last, fmaxdist,
                            fmaxdistexpo, target_coord, subtree, pruning,
                            dual):
    """Facade adapter: returns (new maxdist in caller scale, node counts)
    or None to decline (reference seam: enumerate_ext.cpp:50-200)."""
    if last == -1:
        last = gso.d
    d = last - first
    if dual or len(subtree) or d < _MIN_TPU_DIM or d > 1024:
        return None
    if evaluator.findsubsols:
        return None  # subsolution capture stays on the host oracle for now

    from .cpu import EnumerationDyn  # local import to avoid cycles

    count_mode = getattr(evaluator, "eval_mode", 0) == 1  # EVALMODE_COUNT

    mut, rdiag, normexp = gso.export_mu_r(first, last)
    maxdist = math.ldexp(fmaxdist, fmaxdistexpo - normexp)
    evaluator.set_normexp(normexp)
    is_svp = len(target_coord) == 0
    cp0 = np.zeros(d)
    if not is_svp:
        for i in range(d):
            cp0[i] = float(target_coord[i + first])

    # If the top of the tree is too wide (typically a CVP bound of
    # sum r_ii), tighten the radius with a budgeted host dive first.
    if not count_mode:
        top_width = 2.0 * math.sqrt(max(maxdist, 0.0) / rdiag[d - 1]) + 1.0
        if top_width > 64.0:
            dyn = EnumerationDyn(gso, evaluator)
            newmax = dyn.enumerate(first, last, fmaxdist, fmaxdistexpo,
                                   target_coord, (), pruning, False, False,
                                   node_budget=20000)
            maxdist = math.ldexp(newmax, fmaxdistexpo - normexp)

    prune = np.asarray(pruning, dtype=np.float64) if len(pruning) else None

    # Gaussian-heuristic iterative deepening: when the caller's bound is far
    # beyond the expected solution distance (standalone CVP bounds of
    # sum r_ii), search a GH-sized ball first and grow on failure. Retrying
    # up to the original bound preserves completeness.
    gh2 = math.exp(float(np.mean(np.log(rdiag))) -
                   2.0 * (d / 2.0 * math.log(math.pi) -
                          math.lgamma(d / 2.0 + 1.0)) / d)
    trial = maxdist
    if not count_mode and maxdist > 4.0 * gh2:
        # start far below GH and quadruple: failed small passes are cheap,
        # and the first successful pass has a near-tight radius
        trial = min(gh2 / 1024.0, maxdist)
    total_nodes = np.zeros(d, dtype=np.int64)
    while True:
        enum = TPUEnumerator()
        new_maxdist, nodes = enum.enumerate(mut, rdiag, prune, cp0, trial,
                                            is_svp, evaluator,
                                            count_mode=count_mode)
        total_nodes[:len(nodes)] += nodes
        found = (not evaluator.empty()) and \
            math.ldexp(evaluator.begin()[0], -normexp) <= trial * 1.0000001
        if count_mode or found or trial >= maxdist:
            break
        trial = min(trial * 1.6, maxdist)
    return math.ldexp(min(new_maxdist, trial), normexp - fmaxdistexpo), \
        total_nodes


def register_tpu_backend() -> None:
    from .api import set_external_enumerator
    set_external_enumerator(tpu_external_enumerator)
