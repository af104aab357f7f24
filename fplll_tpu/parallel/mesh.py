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

from ..enum.tpu import _enum_steps
from ..enum.evaluator import Evaluator

__all__ = ["make_enum_mesh", "ShardedEnumerator"]


def make_enum_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("enum",))


def _sweep(mut, rdiag, prune, state, m: int, is_svp: bool, count_mode: bool,
           max_steps: int):
    """One device-local sweep followed by a pmin radius exchange."""
    state = _enum_steps(mut, rdiag, prune, state, m=m, is_svp=is_svp,
                        count_mode=count_mode, max_steps=max_steps)
    if not count_mode:
        # ICI collective: replicate the tightest radius found anywhere
        state["A"] = jax.lax.pmin(state["A"], axis_name="enum")
    # node counters start at zero each sweep, so the psum is the global total
    state["nodes"] = jax.lax.psum(state["nodes"], axis_name="enum")
    state["steps"] = jax.lax.pmax(state["steps"], axis_name="enum")
    return state


class ShardedEnumerator:
    """Host driver: shards lanes over the mesh and iterates sweeps.

    batch_per_device lanes per device; roots are generated once on the
    host (same layered expansion as the single-chip driver) and dealt
    round-robin to device shards.
    """

    def __init__(self, mesh: Mesh, batch_per_device: int = 512,
                 steps_per_sweep: int = 20000,
                 max_device_levels: int = 64):
        self.mesh = mesh
        self.n_dev = mesh.devices.size
        self.batch_per_device = batch_per_device
        self.steps_per_sweep = steps_per_sweep
        self.max_device_levels = max_device_levels
        self.nodes = np.zeros(0, dtype=np.int64)

    def enumerate(self, mut: np.ndarray, rdiag: np.ndarray,
                  prune: Optional[np.ndarray], cp0: np.ndarray,
                  maxdist: float, is_svp: bool, evaluator: Evaluator,
                  count_mode: bool = False) -> Tuple[float, np.ndarray]:
        from ..enum.tpu import TPUEnumerator

        d = len(rdiag)
        self.nodes = np.zeros(d, dtype=np.int64)
        prune_arr = (np.ones(d) if prune is None or len(prune) == 0
                     else np.asarray(prune, dtype=np.float64))
        helper = TPUEnumerator(batch=self.batch_per_device * self.n_dev,
                               max_device_levels=self.max_device_levels)
        helper.nodes = self.nodes
        roots_x, roots_pd, m_real = helper._gen_roots(
            np.asarray(mut, dtype=np.float64),
            np.asarray(rdiag, dtype=np.float64), prune_arr,
            np.asarray(cp0, dtype=np.float64), float(maxdist), d, is_svp)
        order = np.argsort(roots_pd)
        roots_x, roots_pd = roots_x[order], roots_pd[order]

        m = min(((m_real + 7) // 8) * 8, self.max_device_levels)
        nfix = d - m_real
        mut_pad = np.zeros((m, m))
        mut_pad[:m_real, :m_real] = mut[:m_real, :m_real]
        rdiag_pad = np.full(m, 1e300)
        rdiag_pad[:m_real] = rdiag[:m_real]
        prune_pad = np.ones(m)
        prune_pad[:m_real] = prune_arr[:m_real]

        Bd = self.batch_per_device
        B = Bd * self.n_dev
        A = float(maxdist)

        sweep = shard_map(
            partial(_sweep, m=m, is_svp=bool(is_svp),
                    count_mode=bool(count_mode),
                    max_steps=self.steps_per_sweep),
            mesh=self.mesh,
            in_specs=(P(), P(), P(),
                      {"x": P("enum"), "dx": P("enum"), "ddx": P("enum"),
                       "center": P("enum"), "partdist": P("enum"),
                       "cs": P("enum"), "k": P("enum"), "active": P("enum"),
                       "A": P(), "best_dist": P("enum"),
                       "best_dev": P("enum"), "sol_count": P("enum"),
                       "nodes": P(), "steps": P()}),
            out_specs={"x": P("enum"), "dx": P("enum"), "ddx": P("enum"),
                       "center": P("enum"), "partdist": P("enum"),
                       "cs": P("enum"), "k": P("enum"), "active": P("enum"),
                       "A": P(), "best_dist": P("enum"), "best_dev": P("enum"),
                       "sol_count": P("enum"), "nodes": P(), "steps": P()},
            check_vma=False)

        from fplll_tpu.enum.cpu import _roundf
        best_overall = []
        total_sols = 0
        qpos = 0
        R_total = len(roots_pd)
        lane_roots = np.zeros((B, nfix))

        def make_np_state(xs_b, pd_b, live):
            R = xs_b.shape[0]
            cs = np.zeros((R, m))
            cs[:, :m_real] = cp0[:m_real][None, :] - \
                (xs_b @ mut[:m_real, m_real:d].T if nfix else 0.0)
            x = np.zeros((R, m))
            center = np.zeros((R, m))
            dxa = np.ones((R, m))
            ddxa = np.ones((R, m))
            partdist = np.zeros((R, m + 1))
            k0 = m - 1
            center[:, k0] = cs[:, k0]
            xr = np.vectorize(_roundf, otypes=[np.float64])(center[:, k0])
            zerop = live & (pd_b == 0) & is_svp
            x[:, k0] = np.where(zerop, np.maximum(xr, 0.0), xr)
            dxa[:, k0] = ddxa[:, k0] = np.where(center[:, k0] >= x[:, k0],
                                                1.0, -1.0)
            partdist[:, k0] = pd_b
            return {"x": x, "dx": dxa, "ddx": ddxa, "center": center,
                    "partdist": partdist, "cs": cs,
                    "k": np.full(R, k0, dtype=np.int32),
                    "active": live.copy(),
                    "best_dist": np.full(R, np.inf),
                    "best_dev": np.zeros((R, m)),
                    "sol_count": np.zeros(R, dtype=np.float64)}

        state_np = None
        while True:
            if state_np is None:
                take = min(B, R_total - qpos)
                if take <= 0:
                    break
                xs_b = np.zeros((B, nfix))
                pd_b = np.zeros(B)
                live = np.zeros(B, dtype=bool)
                sel = slice(qpos, qpos + take)
                ok = roots_pd[sel] <= A
                xs_b[:take][ok] = roots_x[sel][ok]
                pd_b[:take][ok] = roots_pd[sel][ok]
                live[:take] = ok
                qpos += take
                lane_roots = xs_b
                state_np = make_np_state(xs_b, pd_b, live)
            else:
                active = state_np["active"]
                done = ~active
                bd = state_np["best_dist"]
                for i in np.where(done & np.isfinite(bd))[0]:
                    best_overall.append(
                        (float(bd[i]),
                         np.concatenate([state_np["best_dev"][i][:m_real],
                                         lane_roots[i]])))
                    state_np["best_dist"][i] = np.inf
                if not count_mode and best_overall:
                    A = min(A, min(t[0] for t in best_overall))
                n_active = int(active.sum())
                if n_active == 0 and qpos >= R_total:
                    break
                nfree = B - n_active
                if nfree and qpos < R_total:
                    chunk = slice(qpos, min(qpos + nfree, R_total))
                    ok = roots_pd[chunk] <= A
                    xs_f = roots_x[chunk][ok][:nfree]
                    pd_f = roots_pd[chunk][ok][:nfree]
                    qpos += chunk.stop - chunk.start
                    if len(pd_f):
                        fresh = make_np_state(xs_f, pd_f,
                                              np.ones(len(pd_f), dtype=bool))
                        slots = np.where(done)[0][:len(pd_f)]
                        for key in fresh:
                            state_np[key][slots] = fresh[key]
                        lane_roots[slots] = xs_f
                elif n_active == 0:
                    break

            state = {k: jnp.asarray(v) for k, v in state_np.items()}
            state["A"] = jnp.asarray(A, dtype=jnp.float64)
            state["nodes"] = jnp.zeros((m,), dtype=jnp.float64)
            state["steps"] = jnp.asarray(0, dtype=jnp.int32)
            with self.mesh:
                state = sweep(jnp.asarray(mut_pad), jnp.asarray(rdiag_pad),
                              jnp.asarray(prune_pad), state)
            state_np = {k: np.array(v) for k, v in state.items()}
            self.nodes[:m] += state_np.pop("nodes").astype(np.int64)
            total_sols += int(state_np.pop("sol_count").sum())
            state_np["sol_count"] = np.zeros(B, dtype=np.float64)
            A = min(A, float(state_np.pop("A")))
            state_np.pop("steps")
            livebd = np.isfinite(state_np["best_dist"])
            if livebd.any() and not count_mode:
                A = min(A, float(state_np["best_dist"][livebd].min()))

        if state_np is not None:
            bd = state_np["best_dist"]
            for i in np.where(np.isfinite(bd))[0]:
                best_overall.append(
                    (float(bd[i]),
                     np.concatenate([state_np["best_dev"][i][:m_real],
                                     lane_roots[i]])))

        best_overall.sort(key=lambda t: t[0])
        maxdist_out = maxdist
        if count_mode:
            evaluator.sol_count += total_sols
            return maxdist_out, self.nodes
        for dist, full in best_overall[:max(evaluator.max_sols * 4, 8)]:
            maxdist_out = evaluator.eval_sol(list(full), dist, maxdist_out)
        return maxdist_out, self.nodes
