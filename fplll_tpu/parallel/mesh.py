"""Multi-chip sharded enumeration over a jax.sharding.Mesh.

The distributed layer the reference does not have (SURVEY.md §2 #16:
enumlib's shared-memory protocol = one atomic shrinking bound + a work
queue of subtree roots, enum-parallel/enumeration.h:68-146,412-505).
The TPU-native design:

- subtree roots are sharded across the mesh ("enum" axis = data-parallel
  over subtrees);
- each device advances its lanes with the same lockstep step function as
  the single-chip kernel (fplll_tpu.enum.tpu);
- the shrinking radius A is exchanged with jax.lax.pmin over ICI every
  sweep — stale bounds are correct-but-wasteful exactly as in enumlib;
- per-device best solutions are reduced at the end of each sweep.

This module builds the shard_mapped sweep and a host driver usable with
any number of devices (including the XLA host-platform virtual mesh used
by tests and the driver's dry run).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import numpy as np

from ..jaxsetup import jax, jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..enum.evaluator import Evaluator

__all__ = ["make_enum_mesh", "ShardedEnumerator"]


def make_enum_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("enum",))


def _steal_plan(cursor, own_end, n_dead, axis="enum"):
    """Deterministic sweep-boundary work rebalancing (the ICI analogue of
    enumlib's work stealing, enum-parallel/enumeration.h:460-505): every
    shard all_gathers (cursor, own_end, dead-lane count), computes the
    SAME reassignment plan, and applies its own part — a drained shard
    with dead lanes claims the second half of the richest shard's
    remaining root range. Roots must be replicated for this (any shard
    can walk any root). Returns (new_cursor, new_own_end, stole)."""
    me = jax.lax.axis_index(axis).astype(jnp.int32)
    mine = jnp.stack([cursor, own_end,
                      n_dead.astype(jnp.int32)])
    allv = jax.lax.all_gather(mine, axis)              # (n_dev, 3)
    curs, ends, ndead = allv[:, 0], allv[:, 1], allv[:, 2]
    rem = jnp.maximum(ends - curs, 0)
    thief = (rem == 0) & (ndead > 0)
    n_thieves = jnp.sum(thief.astype(jnp.int32))
    # rank thieves by shard index; victims by remaining queue, richest
    # first (top_k tie-break by index is deterministic, so every shard
    # derives the identical pairing)
    t_rank = jnp.cumsum(thief.astype(jnp.int32)) - 1
    rem_sorted, vidx = jax.lax.top_k(rem, rem.shape[0])
    my_rank = t_rank[me]
    my_victim = vidx[jnp.clip(my_rank, 0, rem.shape[0] - 1)]
    can_steal = thief[me] & (my_rank >= 0) & \
        (rem_sorted[jnp.clip(my_rank, 0, rem.shape[0] - 1)] >= 64)
    split_of = curs + (rem - rem // 2)                 # per victim index
    new_cursor = jnp.where(can_steal, split_of[my_victim], cursor)
    new_end = jnp.where(can_steal, ends[my_victim], own_end)
    # am I someone's victim? my position in the richest-first order
    my_vpos = jnp.sum(jnp.where(vidx == me,
                                jnp.arange(rem.shape[0], dtype=jnp.int32),
                                0))
    robbed = (my_vpos < n_thieves) & (rem[me] >= 64)
    new_end = jnp.where(robbed, split_of[me], new_end)
    return new_cursor, new_end, can_steal


def _mesh_run(mut, rdiag, prune, mut_fix, cp0, roots_x, roots_a, roots_pd,
              A0, own_lens,
              m: int, is_svp: bool, count_mode: bool, sync_steps: int,
              max_rounds: int, batch: int, dual: bool = False,
              findsubsols: bool = False, steal: bool = True):
    """Whole sharded enumeration in ONE launch: every device advances its
    lanes for sync_steps, then the shrinking radius is pmin-exchanged over
    ICI and a psum'd work flag decides termination — the collective
    schedule is identical on every shard, so the while_loop stays uniform.
    Runs under shard_map with the lane state sharded on the "enum" axis
    and mut/rdiag AND the root queue replicated: shard i initially owns
    the contiguous stripe [i*R_per, i*R_per + own_lens[i]) of the
    round-robin-dealt queue, and drained shards steal range halves at
    sweep boundaries (_steal_plan). dual/findsubsols mirror the
    single-chip kernel (fplll_tpu.enum.tpu._enum_run)."""
    from ..enum.tpu import _make_step, _cround

    B = batch
    R = roots_x.shape[0]
    n_dev = own_lens.shape[0]
    R_per = R // n_dev
    nfix = roots_x.shape[1]
    dtype = mut.dtype
    step = _make_step(mut, rdiag, prune, m, is_svp, count_mode, dual=dual,
                      findsubsols=findsubsols)

    def make_fresh(rx, rpd):
        cs = cp0[None, :] - (rx @ mut_fix.T if nfix else 0.0)
        cs = jnp.broadcast_to(cs, (B, m)).astype(dtype)
        k0 = m - 1
        c0 = cs[:, k0]
        x0 = _cround(c0)
        if is_svp:
            x0 = jnp.where(rpd == 0.0, jnp.maximum(x0, 0.0), x0)
        d0 = jnp.where(c0 >= x0, 1.0, -1.0).astype(dtype)
        x = jnp.zeros((B, m), dtype).at[:, k0].set(x0)
        dx = jnp.ones((B, m), dtype).at[:, k0].set(d0)
        ddx = jnp.ones((B, m), dtype).at[:, k0].set(d0)
        center = jnp.zeros((B, m), dtype).at[:, k0].set(c0)
        partdist = jnp.zeros((B, m + 1), dtype).at[:, k0].set(rpd)
        return x, dx, ddx, center, partdist, cs

    me = jax.lax.axis_index("enum").astype(jnp.int32)
    start = me * jnp.int32(R_per)
    own_len = own_lens[me].astype(jnp.int32)
    idx0 = jnp.arange(B)
    gidx0 = jnp.clip(start + idx0, 0, R - 1)
    rx0 = roots_x[gidx0]
    ra0 = roots_a[gidx0]
    rpd0 = roots_pd[gidx0]
    live0 = (idx0 < own_len) & jnp.isfinite(rpd0) & (rpd0 <= A0)
    x, dx, ddx, center, partdist, cs = make_fresh(
        ra0, jnp.where(live0, rpd0, 0.0).astype(dtype))
    st = {
        "x": x, "dx": dx, "ddx": ddx, "center": center,
        "partdist": partdist, "cs": cs,
        "k": jnp.full((B,), m - 1, dtype=jnp.int32),
        "active": live0,
        "lane_root": rx0.astype(dtype),
        "A": jnp.asarray(A0, dtype=dtype),
        "best_dist": jnp.full((B,), jnp.inf, dtype=dtype),
        "best_dev": jnp.zeros((B, m), dtype=dtype),
        "best_root": jnp.zeros((B, nfix), dtype=dtype),
        "sol_count": jnp.zeros((B,), dtype=jnp.float64),
        "nodes": jnp.zeros((m,), dtype=jnp.float64),
        "cursor": start + jnp.minimum(jnp.int32(B), own_len),
        "own_end": start + own_len,
        "steals": jnp.asarray(0, dtype=jnp.int32),
        "rounds": jnp.asarray(0, dtype=jnp.int32),
        "work": jnp.asarray(True),
    }
    if findsubsols:
        st["subsol_dist"] = rdiag.astype(dtype)
        st["subsol_vec"] = jnp.zeros((m, m), dtype=dtype)
        st["subsol_root"] = jnp.zeros((m, nfix), dtype=dtype)

    def local_step(_, s):
        lane_root = s["lane_root"]
        cursor = s["cursor"]
        best_root_prev = s["best_root"]
        if findsubsols:
            ss_dist_prev = s.pop("subsol_dist")
            ss_vec_prev = s.pop("subsol_vec")
            ss_root_prev = s.pop("subsol_root")
        out = step(s)
        better = out.pop("better")
        out["best_root"] = jnp.where(better[:, None], lane_root,
                                     best_root_prev) if nfix \
            else best_root_prev
        out["lane_root"] = lane_root
        out["cursor"] = cursor
        out["own_end"] = s["own_end"]
        out["steals"] = s["steals"]
        out["rounds"] = s["rounds"]
        out["work"] = s["work"]
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

        need = ~out["active"] & (out["cursor"] < out["own_end"])

        def do_refill(t):
            needv = ~t["active"]
            rank = jnp.cumsum(needv.astype(jnp.int32)) - 1
            ridx = t["cursor"] + rank
            can = needv & (ridx < t["own_end"])
            ridx_c = jnp.clip(ridx, 0, R - 1)
            rx = roots_x[ridx_c].astype(dtype)
            ra = roots_a[ridx_c].astype(dtype)
            rpd = roots_pd[ridx_c].astype(dtype)
            live = can & jnp.isfinite(rpd) & (rpd <= t["A"])
            fx, fdx, fddx, fcenter, fpartdist, fcs = make_fresh(
                ra, jnp.where(live, rpd, 0.0))
            sel = can[:, None]
            t = dict(t)
            t["x"] = jnp.where(sel, fx, t["x"])
            t["dx"] = jnp.where(sel, fdx, t["dx"])
            t["ddx"] = jnp.where(sel, fddx, t["ddx"])
            t["center"] = jnp.where(sel, fcenter, t["center"])
            t["cs"] = jnp.where(sel, fcs, t["cs"])
            t["partdist"] = jnp.where(can[:, None], fpartdist, t["partdist"])
            t["k"] = jnp.where(can, jnp.int32(m - 1), t["k"])
            t["active"] = jnp.where(can, live, t["active"])
            if nfix:
                t["lane_root"] = jnp.where(sel, rx, t["lane_root"])
            t["cursor"] = jnp.minimum(
                t["cursor"] + jnp.sum(needv, dtype=jnp.int32),
                t["own_end"])
            return t

        return jax.lax.cond(jnp.any(need), do_refill, lambda t: t, out)

    def body(s):
        s = jax.lax.fori_loop(0, sync_steps, local_step, s)
        if not count_mode:
            # ICI exchange of the tightest radius found anywhere
            s["A"] = jax.lax.pmin(jnp.minimum(s["A"], jnp.min(
                jnp.where(jnp.isfinite(s["best_dist"]), s["best_dist"],
                          jnp.inf)).astype(s["A"].dtype)), "enum")
        if steal:
            # sweep-boundary work rebalancing over the replicated queue
            # (trial mode disables this: each shard's stripe holds roots
            # of a DIFFERENT problem, so ranges are not interchangeable)
            n_dead = jnp.sum((~s["active"]).astype(jnp.int32))
            new_cursor, new_end, stole = _steal_plan(s["cursor"],
                                                     s["own_end"], n_dead)
            s["cursor"], s["own_end"] = new_cursor, new_end
            s["steals"] = s["steals"] + stole.astype(jnp.int32)
        local_work = jnp.any(s["active"]) | (s["cursor"] < s["own_end"])
        s["work"] = jax.lax.psum(local_work.astype(jnp.int32), "enum") > 0
        s["rounds"] = s["rounds"] + 1
        return s

    def cond(s):
        return s["work"] & (s["rounds"] < max_rounds)

    return jax.lax.while_loop(cond, body, st)


def _mesh_run_dd(mut_hi, mut_lo, rdiag_hi, rdiag_lo, prune_hi, prune_lo,
                 mut_fix_hi, mut_fix_lo, cp0_hi, cp0_lo,
                 roots_x, roots_a, roots_pd_hi, roots_pd_lo, A0_hi, A0_lo,
                 own_lens,
                 m: int, is_svp: bool, count_mode: bool, sync_steps: int,
                 max_rounds: int, batch: int, dual: bool = False,
                 findsubsols: bool = False, steal: bool = True):
    """dd32 (compensated f32-pair) variant of _mesh_run: certified
    proved-SVP/CVP trees run sharded with the ~48-bit bound carried as a
    (hi, lo) pair. The radius exchange picks ONE owning shard
    deterministically and broadcasts its exact pair (componentwise pmin
    of pairs could mix hi/lo from different shards and undershoot the
    certified bound)."""
    from ..enum.dd_kernel import DD, _make_step_dd, _le, _where

    B = batch
    R = roots_x.shape[0]
    nfix = roots_x.shape[1]
    dtype = jnp.float32
    mut = DD(mut_hi, mut_lo)
    rdiag = DD(rdiag_hi, rdiag_lo)
    prune = DD(prune_hi, prune_lo)
    cp0 = DD(cp0_hi, cp0_lo)
    step = _make_step_dd(mut, rdiag, prune, m, is_svp, count_mode,
                         dual=dual, findsubsols=findsubsols)

    from ..ops.ddarith import dd_mul as _dd_mul, dd_sub as _dd_sub

    def make_fresh(ra, rpd):
        cs = DD(jnp.broadcast_to(cp0.hi[None, :], (B, m)),
                jnp.broadcast_to(cp0.lo[None, :], (B, m)))
        for j in range(nfix):
            w = ra[:, j]
            t = _dd_mul(DD(w[:, None], jnp.zeros_like(w)[:, None]),
                        DD(mut_fix_hi[None, :, j], mut_fix_lo[None, :, j]))
            cs = _dd_sub(cs, t)
        k0 = m - 1
        c0s = cs.hi[:, k0] + cs.lo[:, k0]
        x0 = jnp.trunc(c0s + jnp.where(c0s >= 0, 0.5, -0.5))
        if is_svp:
            x0 = jnp.where(rpd.hi + rpd.lo == 0.0, jnp.maximum(x0, 0.0), x0)
        d0 = jnp.where(c0s >= x0, 1.0, -1.0).astype(dtype)
        x = jnp.zeros((B, m), dtype).at[:, k0].set(x0)
        dx = jnp.ones((B, m), dtype).at[:, k0].set(d0)
        ddx = jnp.ones((B, m), dtype).at[:, k0].set(d0)
        center = DD(jnp.zeros((B, m), dtype).at[:, k0].set(cs.hi[:, k0]),
                    jnp.zeros((B, m), dtype).at[:, k0].set(cs.lo[:, k0]))
        partdist = DD(jnp.zeros((B, m + 1), dtype).at[:, k0].set(rpd.hi),
                      jnp.zeros((B, m + 1), dtype).at[:, k0].set(rpd.lo))
        return x, dx, ddx, center, partdist, cs

    n_dev = own_lens.shape[0]
    R_per = R // n_dev
    me = jax.lax.axis_index("enum").astype(jnp.int32)
    start = me * jnp.int32(R_per)
    own_len = own_lens[me].astype(jnp.int32)
    A0 = DD(A0_hi, A0_lo)
    idx0 = jnp.arange(B)
    ridx0 = jnp.clip(start + idx0, 0, R - 1)
    rx0 = roots_x[ridx0]
    ra0 = roots_a[ridx0]
    rpd0 = DD(roots_pd_hi[ridx0], roots_pd_lo[ridx0])
    live0 = (idx0 < own_len) & jnp.isfinite(rpd0.hi) & \
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
        "cursor": start + jnp.minimum(jnp.int32(B), own_len),
        "own_end": start + own_len,
        "steals": jnp.asarray(0, dtype=jnp.int32),
        "rounds": jnp.asarray(0, dtype=jnp.int32),
        "work": jnp.asarray(True),
    }
    if findsubsols:
        st["subsol_dist"] = rdiag.hi + rdiag.lo
        st["subsol_vec"] = jnp.zeros((m, m), dtype=dtype)
        st["subsol_root"] = jnp.zeros((m, nfix), dtype=dtype)

    def local_step(_, s):
        lane_root = s["lane_root"]
        cursor = s["cursor"]
        best_root_prev = s["best_root"]
        if findsubsols:
            ss_dist_prev = s.pop("subsol_dist")
            ss_vec_prev = s.pop("subsol_vec")
            ss_root_prev = s.pop("subsol_root")
        rounds, work = s.pop("rounds"), s.pop("work")
        own_end, steals = s.pop("own_end"), s.pop("steals")
        out = step(s)
        better = out.pop("better")
        out["best_root"] = jnp.where(better[:, None], lane_root,
                                     best_root_prev) if nfix \
            else best_root_prev
        out["lane_root"] = lane_root
        out["cursor"] = cursor
        out["own_end"] = own_end
        out["steals"] = steals
        out["rounds"] = rounds
        out["work"] = work
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

        need = ~out["active"] & (out["cursor"] < out["own_end"])

        def do_refill(t):
            needv = ~t["active"]
            rank = jnp.cumsum(needv.astype(jnp.int32)) - 1
            ridx = t["cursor"] + rank
            can = needv & (ridx < t["own_end"])
            ridx_c = jnp.clip(ridx, 0, R - 1)
            rx = roots_x[ridx_c].astype(dtype)
            ra = roots_a[ridx_c].astype(dtype)
            rpd = DD(roots_pd_hi[ridx_c], roots_pd_lo[ridx_c])
            A_cur = DD(jnp.broadcast_to(t["A"], (B,)),
                       jnp.broadcast_to(t["A_lo"], (B,)))
            live = can & jnp.isfinite(rpd.hi) & _le(rpd, A_cur)
            rpd = _where(live, rpd, DD(jnp.zeros(B, dtype),
                                       jnp.zeros(B, dtype)))
            fx, fdx, fddx, fcenter, fpartdist, fcs = make_fresh(ra, rpd)
            sel = can[:, None]
            t = dict(t)
            t["x"] = jnp.where(sel, fx, t["x"])
            t["dx"] = jnp.where(sel, fdx, t["dx"])
            t["ddx"] = jnp.where(sel, fddx, t["ddx"])
            t["center"] = jnp.where(sel, fcenter.hi, t["center"])
            t["center_lo"] = jnp.where(sel, fcenter.lo, t["center_lo"])
            t["cs"] = jnp.where(sel, fcs.hi, t["cs"])
            t["cs_lo"] = jnp.where(sel, fcs.lo, t["cs_lo"])
            t["partdist"] = jnp.where(can[:, None], fpartdist.hi,
                                      t["partdist"])
            t["partdist_lo"] = jnp.where(can[:, None], fpartdist.lo,
                                         t["partdist_lo"])
            t["k"] = jnp.where(can, jnp.int32(m - 1), t["k"])
            t["active"] = jnp.where(can, live, t["active"])
            if nfix:
                t["lane_root"] = jnp.where(sel, rx, t["lane_root"])
            t["cursor"] = jnp.minimum(
                t["cursor"] + jnp.sum(needv, dtype=jnp.int32),
                t["own_end"])
            return t

        return jax.lax.cond(jnp.any(need), do_refill, lambda t: t, out)

    def body(s):
        s = jax.lax.fori_loop(0, sync_steps, local_step, s)
        if not count_mode:
            # fold the best lane candidate into the local pair, then
            # broadcast ONE shard's exact pair over ICI
            key = s["best_dist"] + s["best_dist_lo"]
            lane = jnp.argmin(jnp.where(jnp.isfinite(key), key, jnp.inf))
            cand_hi = jnp.take(s["best_dist"], lane)
            cand_lo = jnp.take(s["best_dist_lo"], lane)
            have = jnp.isfinite(cand_hi) & \
                ((cand_hi + cand_lo) < (s["A"] + s["A_lo"]))
            A_hi = jnp.where(have, cand_hi, s["A"])
            A_lo = jnp.where(have, cand_lo, s["A_lo"])
            ssum = A_hi + A_lo
            g = jax.lax.pmin(ssum, "enum")
            idx = jax.lax.axis_index("enum")
            owner_key = jnp.where(ssum == g, idx.astype(jnp.int32),
                                  jnp.int32(1 << 30))
            win = jax.lax.pmin(owner_key, "enum")
            pick = idx.astype(jnp.int32) == win
            s["A"] = jax.lax.psum(jnp.where(pick, A_hi, 0.0), "enum")
            s["A_lo"] = jax.lax.psum(jnp.where(pick, A_lo, 0.0), "enum")
        if steal:
            n_dead = jnp.sum((~s["active"]).astype(jnp.int32))
            new_cursor, new_end, stole = _steal_plan(s["cursor"],
                                                     s["own_end"], n_dead)
            s["cursor"], s["own_end"] = new_cursor, new_end
            s["steals"] = s["steals"] + stole.astype(jnp.int32)
        local_work = jnp.any(s["active"]) | (s["cursor"] < s["own_end"])
        s["work"] = jax.lax.psum(local_work.astype(jnp.int32), "enum") > 0
        s["rounds"] = s["rounds"] + 1
        return s

    def cond(s):
        return s["work"] & (s["rounds"] < max_rounds)

    return jax.lax.while_loop(cond, body, st)


_RUN_CACHE = {}


def _build_sharded_run(mesh: Mesh, m: int, nfix: int, is_svp: bool,
                       count_mode: bool, sync_steps: int, batch: int,
                       dtype_str: str, dual: bool = False,
                       findsubsols: bool = False, trial_mode: bool = False):
    """Jitted shard_mapped whole-search launch, cached per static config
    (shapes are bucketed by the caller so BKZ's repeated block calls hit
    this cache instead of retracing).

    trial_mode: every shard enumerates a DIFFERENT problem (grouped
    rerandomized trials of one lattice, the pod-scale analogue of the
    single-chip grouped launch in enum/tpu._grouped_device_windows): the
    problem arrays carry a leading per-device axis sharded on "enum",
    the root-queue stripes hold per-trial roots, work stealing is off
    (stripes are not interchangeable) and the pmin radius exchange
    implements the shared shrinking bound across trials — valid exactly
    because all trials are bases of the SAME lattice (enumlib's
    many-walkers-one-bound semantics, reference
    enum-parallel/enumeration.h:412-505)."""
    dev_key = tuple(d.id for d in mesh.devices.flat)
    key = (dev_key, m, nfix, is_svp, count_mode, sync_steps, batch,
           dtype_str, dual, findsubsols, trial_mode)
    if key in _RUN_CACHE:
        return _RUN_CACHE[key]

    is_dd = dtype_str == "dd32"

    def finalize(full):
        # per-shard on-device top-K finalize (cf. tpu._enum_run): only
        # the K best lanes of each shard leave the devices
        K = min(batch, 128)
        rank = full["best_dist"] + full["best_dist_lo"] if is_dd \
            else full["best_dist"]
        _, idx = jax.lax.top_k(-rank, K)
        out = {"A": full["A"],
               "best_dist": full["best_dist"][idx],
               "best_dev": full["best_dev"][idx],
               "best_root": full["best_root"][idx],
               "sol_count": jnp.sum(full["sol_count"])[None],
               "nodes": full["nodes"][None],
               "cursor": full["cursor"][None],
               "steals": full["steals"][None],
               "rounds": full["rounds"][None]}
        if is_dd:
            out["A_lo"] = full["A_lo"]
            out["best_dist_lo"] = full["best_dist_lo"][idx]
        if findsubsols:
            out["subsol_dist"] = full["subsol_dist"][None]
            out["subsol_vec"] = full["subsol_vec"][None]
            out["subsol_root"] = full["subsol_root"][None]
        return out

    if is_dd:
        def shard_fn(mut_h, mut_l, rdiag_h, rdiag_l, prune_h, prune_l,
                     fix_h, fix_l, cp0_h, cp0_l, rx_a, ra_a, rpd_h, rpd_l,
                     A_h, A_l, lens_a):
            if trial_mode:
                (mut_h, mut_l, rdiag_h, rdiag_l, prune_h, prune_l,
                 fix_h, fix_l, cp0_h, cp0_l) = (
                    a[0] for a in (mut_h, mut_l, rdiag_h, rdiag_l, prune_h,
                                   prune_l, fix_h, fix_l, cp0_h, cp0_l))
            full = _mesh_run_dd(
                mut_h, mut_l, rdiag_h, rdiag_l, prune_h, prune_l,
                fix_h, fix_l, cp0_h, cp0_l, rx_a, ra_a, rpd_h, rpd_l,
                A_h, A_l, lens_a, m=m, is_svp=is_svp,
                count_mode=count_mode,
                sync_steps=sync_steps, max_rounds=1 << 22, batch=batch,
                dual=dual, findsubsols=findsubsols, steal=not trial_mode)
            return finalize(full)

        # roots are REPLICATED (work stealing lets any shard walk any
        # root); shard i's initial stripe is [i*R_per, i*R_per+lens[i])
        prob = P("enum") if trial_mode else P()
        in_specs = (prob,) * 10 + (P(), P(), P(), P()) + (P(), P(), P())
    else:
        def shard_fn(mut_a, rdiag_a, prune_a, mut_fix_a, cp0_a, rx_a, ra_a,
                     rpd_a, A_a, lens_a):
            if trial_mode:
                mut_a, rdiag_a, prune_a, mut_fix_a, cp0_a = (
                    a[0] for a in (mut_a, rdiag_a, prune_a, mut_fix_a,
                                   cp0_a))
            full = _mesh_run(mut_a, rdiag_a, prune_a, mut_fix_a, cp0_a,
                             rx_a, ra_a, rpd_a, A_a, lens_a, m=m,
                             is_svp=is_svp,
                             count_mode=count_mode, sync_steps=sync_steps,
                             max_rounds=1 << 22, batch=batch, dual=dual,
                             findsubsols=findsubsols,
                             steal=not trial_mode)
            return finalize(full)

        prob = P("enum") if trial_mode else P()
        in_specs = (prob, prob, prob, prob, prob, P(), P(),
                    P(), P(), P())

    lane = P("enum")
    specs = {"A": P(), "best_dist": lane, "best_dev": lane,
             "best_root": lane, "sol_count": lane, "nodes": lane,
             "cursor": lane, "steals": lane, "rounds": lane}
    if is_dd:
        specs["A_lo"] = P()
        specs["best_dist_lo"] = lane
    if findsubsols:
        specs.update({"subsol_dist": lane, "subsol_vec": lane,
                      "subsol_root": lane})
    run = shard_map(
        shard_fn, mesh=mesh,
        in_specs=in_specs,
        out_specs=specs,
        check_vma=False)
    out = jax.jit(run)
    _RUN_CACHE[key] = out
    return out


class ShardedEnumerator:
    """Multi-device enumeration driver: ONE launch for the whole search.

    Subtree roots are dealt round-robin across the mesh (sharded on the
    "enum" axis), every device runs the lockstep DFS with its own
    on-device refill queue, and the shrinking radius is pmin-exchanged
    over ICI every sync_steps (the distributed replacement of enumlib's
    atomic bound, SURVEY §5). Registered through the enumeration facade
    whenever the mesh has more than one device — the analogue of enumlib
    auto-registering as the default external enumerator
    (/root/reference/fplll/enum/enumerate_ext.cpp:34-38)."""

    launches = 0  # process-wide launch counter (tests / dryrun assertions)

    def __init__(self, mesh: Mesh, batch_per_device: int = 512,
                 steps_per_sweep: int = 2048,
                 max_device_levels: int = 128, dtype=None):
        from ..jaxsetup import jnp as _jnp
        self.mesh = mesh
        self.n_dev = mesh.devices.size
        self.batch_per_device = batch_per_device
        self.sync_steps = steps_per_sweep
        self.max_device_levels = max_device_levels
        self.dtype = dtype if dtype is not None else _jnp.float64
        self.bound_slack = {_jnp.float32: 1.0 + 1e-5,
                            "dd32": 1.0 + 1e-9}.get(self.dtype, 1.0)
        self.nodes = np.zeros(0, dtype=np.int64)

    def enumerate(self, mut: np.ndarray, rdiag: np.ndarray,
                  prune: Optional[np.ndarray], cp0: np.ndarray,
                  maxdist: float, is_svp: bool, evaluator,
                  count_mode: bool = False, dual: bool = False):
        from ..enum.tpu import TPUEnumerator

        d = len(rdiag)
        self.nodes = np.zeros(d, dtype=np.int64)
        mut = np.asarray(mut, dtype=np.float64)
        rdiag = np.asarray(rdiag, dtype=np.float64)
        prune_arr = (np.ones(d) if prune is None or len(prune) == 0
                     else np.asarray(prune, dtype=np.float64))
        cp0 = np.asarray(cp0, dtype=np.float64)
        findsubsols = bool(evaluator.findsubsols)
        host_subsols = {} if findsubsols else None
        helper = TPUEnumerator(batch=self.batch_per_device * self.n_dev,
                               max_device_levels=self.max_device_levels)
        helper.nodes = self.nodes
        roots_x, roots_a, roots_pd, m_real = helper._gen_roots(
            mut, rdiag, prune_arr, cp0, float(maxdist), d, is_svp,
            dual=dual, subsols=host_subsols)
        if m_real > self.max_device_levels:
            # trees taller than the kernel run through the chunked deep
            # path (TPUEnumerator._deep_enumerate), with every bounded
            # slice launched over the MESH instead of a single chip: the
            # helper's launch hook is rebound to _mesh_launch, whose
            # positional contract matches TPUEnumerator._launch
            helper.dtype = self.dtype
            helper.bound_slack = self.bound_slack
            helper._launch = self._mesh_launch
            md = helper._deep_enumerate(
                mut, rdiag, prune_arr, cp0, float(maxdist), maxdist, d,
                is_svp, evaluator, count_mode, dual, findsubsols,
                host_subsols, roots_x, roots_a, roots_pd, m_real)
            return md, self.nodes
        md = self._mesh_launch(mut, rdiag, prune_arr, cp0, float(maxdist),
                               maxdist, d, is_svp, evaluator, count_mode,
                               dual, findsubsols, host_subsols, roots_x,
                               roots_a, roots_pd, m_real)
        return md, self.nodes

    def _mesh_launch(self, mut, rdiag, prune_arr, cp0, A, maxdist_in, d,
                     is_svp, evaluator, count_mode, dual, findsubsols,
                     host_subsols, roots_x, roots_a, roots_pd, m_real):
        """One sharded launch over the mesh for a single root batch
        (positional contract of TPUEnumerator._launch so the deep-tree
        slicer can drive either engine); returns the updated maxdist in
        the caller's scale."""
        from ..jaxsetup import jnp
        from ..enum.tpu import TPUEnumerator

        maxdist = maxdist_in
        order = np.argsort(roots_pd)
        roots_x, roots_a, roots_pd = (roots_x[order], roots_a[order],
                                      roots_pd[order])
        nfix = d - m_real

        m = min(((m_real + 7) // 8) * 8, self.max_device_levels)
        mut_pad = np.zeros((m, m))
        mut_pad[:m_real, :m_real] = mut[:m_real, :m_real]
        rdiag_pad = np.full(m, 1e300)
        rdiag_pad[:m_real] = rdiag[:m_real]
        prune_pad = np.ones(m)
        prune_pad[:m_real] = prune_arr[:m_real]
        cp0_pad = np.zeros(m)
        cp0_pad[:m_real] = cp0[:m_real]
        nfix_pad = 0
        while nfix_pad < nfix:
            nfix_pad = 8 if nfix_pad == 0 else nfix_pad * 2
        mut_fix_pad = np.zeros((m, nfix_pad))
        if nfix:
            mut_fix_pad[:m_real, :nfix] = mut[:m_real, m_real:d]

        dt = self.dtype
        if dt == jnp.float32 or dt == "dd32":
            # keep the virtual-level sentinel representable in f32
            rdiag_pad[m_real:] = 1e30

        # deal roots round-robin so cheap roots spread over shards; the
        # per-shard queue length is a power-of-two bucket so the jitted
        # launch is shape-cacheable across BKZ's repeated block calls
        R = len(roots_pd)
        R_per = 1024
        while R_per * self.n_dev < R:
            R_per *= 2
        rx_sh = np.zeros((self.n_dev, R_per, nfix_pad))
        ra_sh = np.zeros((self.n_dev, R_per, nfix_pad))
        rpd_sh = np.full((self.n_dev, R_per), np.inf)
        own_lens = np.zeros(self.n_dev, dtype=np.int32)
        for dev in range(self.n_dev):
            sel_x = roots_x[dev::self.n_dev]
            sel_a = roots_a[dev::self.n_dev]
            sel_p = roots_pd[dev::self.n_dev]
            rx_sh[dev, :len(sel_p), :nfix] = sel_x
            ra_sh[dev, :len(sel_p), :nfix] = sel_a if dual else sel_x
            rpd_sh[dev, :len(sel_p)] = sel_p
            own_lens[dev] = len(sel_p)
        rx_flat = rx_sh.reshape(self.n_dev * R_per, nfix_pad)
        ra_flat = ra_sh.reshape(self.n_dev * R_per, nfix_pad)
        rpd_flat = rpd_sh.reshape(self.n_dev * R_per)

        B = self.batch_per_device
        A0 = float(A) * self.bound_slack

        dtype_str = "dd32" if dt == "dd32" else str(jnp.dtype(dt))
        run = _build_sharded_run(
            self.mesh, m, nfix_pad, bool(is_svp), bool(count_mode),
            self.sync_steps, B, dtype_str, dual=bool(dual),
            findsubsols=findsubsols)
        ShardedEnumerator.launches += 1
        with self.mesh:
            if dt == "dd32":
                from ..enum.dd_kernel import split_dd
                mh, ml = split_dd(mut_pad)
                rh, rl = split_dd(rdiag_pad)
                ph, pl = split_dd(prune_pad)
                fh, fl = split_dd(mut_fix_pad)
                ch, cl = split_dd(cp0_pad)
                pdh, pdl = split_dd(rpd_flat)
                Ah, Al = split_dd(np.float64(A0))
                out = run(mh, ml, rh, rl, ph, pl, fh, fl, ch, cl,
                          jnp.asarray(rx_flat, jnp.float32),
                          jnp.asarray(ra_flat, jnp.float32),
                          pdh, pdl, Ah, Al,
                          jnp.asarray(own_lens))
            else:
                out = run(jnp.asarray(mut_pad, dt),
                          jnp.asarray(rdiag_pad, dt),
                          jnp.asarray(prune_pad, dt),
                          jnp.asarray(mut_fix_pad, dt),
                          jnp.asarray(cp0_pad, dt),
                          jnp.asarray(rx_flat, dt),
                          jnp.asarray(ra_flat, dt),
                          jnp.asarray(rpd_flat, dt),
                          jnp.asarray(A0, dtype=dt),
                          jnp.asarray(own_lens))

        out = jax.device_get(out)    # ONE batched host transfer
        self.last_steals = int(np.asarray(out["steals"]).sum())
        # levels m_real..m-1 are virtual bucket padding (see
        # TPUEnumerator.enumerate): drop their artifact counters
        self.nodes[:m_real] += np.asarray(out["nodes"]).reshape(
            self.n_dev, m).sum(axis=0).astype(np.int64)[:m_real]
        bd = np.array(out["best_dist"], dtype=np.float64)
        if dt == "dd32":
            bd = bd + np.array(out["best_dist_lo"], dtype=np.float64)
        bdev = np.array(out["best_dev"])
        broot = np.array(out["best_root"])
        found = np.isfinite(bd)
        best_overall = [
            (float(bd[i]),
             np.concatenate([bdev[i][:m_real], broot[i][:nfix]]))
            for i in np.where(found)[0]]
        best_overall.sort(key=lambda t: t[0])
        if findsubsols:
            TPUEnumerator._report_subsols(self, evaluator, out,
                                          host_subsols, m_real, nfix, d)
        maxdist_out = maxdist
        if count_mode:
            evaluator.sol_count += int(np.asarray(out["sol_count"]).sum())
            return maxdist_out
        for dist, full in best_overall[:max(evaluator.max_sols * 4, 8)]:
            maxdist_out = evaluator.eval_sol(list(full), dist, maxdist_out)
        return maxdist_out


def mesh_enumerate_trials(mesh: Mesh, muts, rdiags, prunes, maxdists,
                          batch_per_device: int = 256,
                          sync_steps: int = 1024,
                          target_root_factor: int = 8,
                          dtype: str | None = None):
    """Enumerate G rerandomized trials of ONE window, one trial per mesh
    device, sharing the shrinking bound over ICI — the pod-scale layout
    of the single-chip grouped launch (enum/tpu._grouped_device_windows):
    the grid-of-problems axis maps 1:1 onto mesh shards and jax.lax.pmin
    replaces the in-kernel shared bound.  All trials MUST be bases of the
    same lattice (their distances live on one scale; reference semantics:
    enum-parallel/enumeration.h:412-505, one bound, many walkers).

    muts (G, d, d) transposed-upper mu per trial, rdiags/prunes (G, d),
    maxdists (G,) in one common normalized scale.  G must not exceed the
    mesh size (callers batch otherwise).  Returns (dists, sols, nodes):
    dists[g] = best squared distance of trial g's OWN walk (inf if its
    shard found nothing — another trial may still have won), sols (G, d)
    the corresponding coordinate vectors, nodes (G,) per-trial node
    counts (root expansion + device sweep).
    """
    from ..enum.tpu import TPUEnumerator
    from ..jaxsetup import jnp

    muts = np.asarray(muts, dtype=np.float64)
    rdiags = np.asarray(rdiags, dtype=np.float64)
    prunes = np.asarray(prunes, dtype=np.float64)
    maxdists = np.asarray(maxdists, dtype=np.float64)
    G, d, _ = muts.shape
    n_dev = mesh.devices.size
    if G > n_dev:
        raise ValueError(f"{G} trials > {n_dev} mesh devices; batch the "
                         "trials")
    helper = TPUEnumerator(batch=batch_per_device)
    helper.target_root_factor = target_root_factor
    cp0 = np.zeros(d)

    roots = []
    host_nodes = np.zeros(G, dtype=np.int64)
    for g in range(G):
        helper.nodes = np.zeros(d, dtype=np.int64)
        rx, ra, rpd, m_real = helper._gen_roots(
            muts[g], rdiags[g], prunes[g], cp0, float(maxdists[g]), d,
            True)
        if m_real > helper.max_device_levels:
            raise ValueError("window taller than the device kernel; use "
                             "per-trial deep enumeration instead")
        order = np.argsort(rpd)
        roots.append((rx[order], rpd[order], m_real))
        host_nodes[g] = int(helper.nodes.sum())

    m = min(((max(r[2] for r in roots) + 7) // 8) * 8,
            helper.max_device_levels)
    nfix_max = max(d - r[2] for r in roots)
    nfix_pad = 8
    while nfix_pad < nfix_max:
        nfix_pad *= 2
    R_per = 1024
    while R_per < max(len(r[1]) for r in roots):
        R_per *= 2

    mut_pad = np.zeros((n_dev, m, m))
    rdiag_pad = np.full((n_dev, m), 1e300)
    prune_pad = np.ones((n_dev, m))
    cp0_pad = np.zeros((n_dev, m))
    fix_pad = np.zeros((n_dev, m, nfix_pad))
    rx_sh = np.zeros((n_dev, R_per, nfix_pad))
    rpd_sh = np.full((n_dev, R_per), np.inf)
    own_lens = np.zeros(n_dev, dtype=np.int32)
    for g in range(G):
        rx, rpd, m_real = roots[g]
        nfix = d - m_real
        mut_pad[g, :m_real, :m_real] = muts[g][:m_real, :m_real]
        rdiag_pad[g, :m_real] = rdiags[g][:m_real]
        prune_pad[g, :m_real] = prunes[g][:m_real]
        fix_pad[g, :m_real, :nfix] = muts[g][:m_real, m_real:d]
        rx_sh[g, :len(rpd), :nfix] = rx
        rpd_sh[g, :len(rpd)] = rpd
        own_lens[g] = len(rpd)
    for g in range(G, n_dev):        # dead shards: trial-0 geometry,
        mut_pad[g] = mut_pad[0]      # zero-length stripe
        rdiag_pad[g] = rdiag_pad[0]
        prune_pad[g] = prune_pad[0]
        fix_pad[g] = fix_pad[0]

    A0 = float(np.max(maxdists))
    is_dd = dtype == "dd32"
    if is_dd:
        # dd32 certified-pair trees: f32 virtual-level sentinel + slack
        rdiag_pad[rdiag_pad >= 1e299] = 1e30
        A0 *= 1.0 + 1e-9
    run = _build_sharded_run(mesh, m, nfix_pad, True, False, sync_steps,
                             batch_per_device, "dd32" if is_dd
                             else "float64", trial_mode=True)
    ShardedEnumerator.launches += 1
    rx_flat = rx_sh.reshape(n_dev * R_per, nfix_pad)
    rpd_flat = rpd_sh.reshape(n_dev * R_per)
    with mesh:
        if is_dd:
            from ..enum.dd_kernel import split_dd
            mh, ml = split_dd(mut_pad)
            rh, rl = split_dd(rdiag_pad)
            ph, pl = split_dd(prune_pad)
            fh, fl = split_dd(fix_pad)
            ch, cl = split_dd(cp0_pad)
            pdh, pdl = split_dd(rpd_flat)
            Ah, Al = split_dd(np.float64(A0))
            out = run(mh, ml, rh, rl, ph, pl, fh, fl, ch, cl,
                      jnp.asarray(rx_flat, jnp.float32),
                      jnp.asarray(rx_flat, jnp.float32),
                      pdh, pdl, Ah, Al, jnp.asarray(own_lens))
        else:
            out = run(jnp.asarray(mut_pad), jnp.asarray(rdiag_pad),
                      jnp.asarray(prune_pad), jnp.asarray(fix_pad),
                      jnp.asarray(cp0_pad),
                      jnp.asarray(rx_flat), jnp.asarray(rx_flat),
                      jnp.asarray(rpd_flat),
                      jnp.asarray(A0, dtype=jnp.float64),
                      jnp.asarray(own_lens))
    out = jax.device_get(out)

    K = min(batch_per_device, 128)
    bd = np.asarray(out["best_dist"], dtype=np.float64).reshape(n_dev, K)
    if is_dd:
        bd = bd + np.asarray(out["best_dist_lo"],
                             dtype=np.float64).reshape(n_dev, K)
    bdev = np.asarray(out["best_dev"]).reshape(n_dev, K, m)
    broot = np.asarray(out["best_root"]).reshape(n_dev, K, nfix_pad)
    nodes_dev = np.asarray(out["nodes"]).reshape(n_dev, m)
    dists = np.full(G, np.inf)
    sols = np.zeros((G, d))
    nodes = np.zeros(G, dtype=np.int64)
    for g in range(G):
        _, rpd, m_real = roots[g]
        nfix = d - m_real
        nodes[g] = host_nodes[g] + \
            int(nodes_dev[g, :m_real].sum())
        lane = int(np.argmin(np.where(np.isfinite(bd[g]), bd[g], np.inf)))
        accept = maxdists[g] * (1.0 + 1e-9 if is_dd else 1.0)
        if np.isfinite(bd[g, lane]) and bd[g, lane] <= accept:
            dists[g] = bd[g, lane]
            sols[g] = np.concatenate([bdev[g, lane, :m_real],
                                      broot[g, lane, :nfix]])
    return dists, sols, nodes
