"""Pallas enumeration kernel: VMEM-resident, register-tracked lockstep DFS.

The XLA while_loop kernel in enum/tpu.py advances one tree node per lane
per step with every per-lane value gathered from (B, m) state through
one-hot masks — ~40 full-array VPU passes per step, plus an HBM
round-trip of the loop carry.  This kernel is the TPU-native redesign:

- **Chunked VMEM residency**: one pl.pallas_call runs CHUNK steps with
  all state pinned in VMEM, so steady-state cost is pure VPU/MXU work
  (the ~ms per-launch latency of the device attachment is amortized
  over thousands of steps).
- **Transposed SoA layout** ``(m, B)``: lanes ride the 128-wide vector
  lane axis, tree levels the sublane axis.
- **Register-tracked DFS head**: the quantities of the *current* level
  (x, center, partdist, rdiag, prune) are (1, B) registers updated
  incrementally; (m, B) arrays are touched only on level changes
  (save on descend, restore on ascend), cutting per-step work to ~15
  full-array passes + one MXU matmul.
- **Stateless zig-zag**: the reference keeps dx/ddx arrays for the
  sibling ordering (enumerate_base.h:145-172); here the next sibling is
  the reflection x' = 2*round(c) - x (+step toward c's side), a pure
  function of (x, c), so the dx/ddx state vanishes entirely.
- **Fused mu-row fetch**: one (m+8, m) x (m, B) MXU matmul per step
  fetches the mu row of the level being entered/left AND rdiag/prune at
  the target level (extra operand rows carry rdiag, prune and their
  shift-by-one), replacing four masked gathers.
- **Leaf-range processing**: a lane visiting level 1 absorbs the whole
  level-0 sibling range analytically: count = #integers in [c-w, c+w],
  w = sqrt((prune_0*A - pd)/r_0), best leaf = nearest integer to c.
  Endpoints get one direct bound test each so counts stay bit-identical
  to the stepwise kernel in count mode (the per-leaf test is monotone
  in |x-c|).
- **Barren-descend lookahead**: a passing node whose child range is
  empty (the nearest-integer child center already violates the child
  bound — the same test the child step would run) advances its
  sibling in the same step instead of descending and failing next step.
  In bulge-shaped trees (pruned BKZ blocks, fixed-radius counting) the
  deepest visited nodes are mostly barren, so this removes ~25-35% of
  all steps while leaving the visited-node set and per-level counters
  unchanged up to f32 restore rounding: skipping the barren descend also
  skips the cs -= x*col / cs += x*col round trip on rows below, and
  fl(fl(a-t)+t) == a is not guaranteed in f32, so sibling subtrees after
  a barren node may diverge from the stepwise kernel at ULP level and
  flip marginal bound tests. (The skipped round trip *removes* rounding;
  the reference never does subtract-restore either,
  enumerate_base.cpp:152-247. Do not assert bit-exact node-count parity
  between this kernel and the XLA kernel.)

Tree semantics (zig-zag sibling order, SVP symmetry breaking
`next_pos_up`, per-level pruning bounds, per-level node counters,
one-best-per-lane capture) match enum/tpu.py and the reference
(enumerate_base.h:79-172); the host driver there is reused.  f32 only —
Mosaic has no f64; proved/error-bounded f64 paths stay on the XLA
kernel.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np

from ..jaxsetup import jax, jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_available", "_enum_run_pallas", "_enum_run_pallas_grouped"]

_INTERPRET = os.environ.get("FPLLL_TPU_PALLAS_INTERPRET", "0") == "1"
_CHUNK = int(os.environ.get("FPLLL_TPU_PALLAS_CHUNK", "2048"))
_F = jnp.float32
_I = jnp.int32
_XR = 8          # extra rows appended to the matmul operand


def pallas_available() -> bool:
    """Pallas path usable: real TPU backend, or interpret mode forced."""
    if _INTERPRET:
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


# v5e has 128M VMEM per core; the default scoped-vmem ceiling is 16M, so
# both pallas_call sites raise it explicitly and the tile model budgets
# against that raised limit.
_VMEM_LIMIT = 100 << 20

def _tile_fits(m: int, tile: int, vmem_budget: int = 80 << 20) -> bool:
    """True when the VMEM-resident footprint for (m, tile) fits the
    raised scoped-vmem limit with headroom. Model calibrated against the
    compiler's reported scoped allocations (m=40: 22.75M at tile=8192
    single-cell, 16.53M at tile=4096 gridded with double-buffered
    windows): ~26 (m, B) f32 planes + ~96 (1, B) rows covers both."""
    return (26 * m + 96) * 4 * tile <= vmem_budget


_MAX_TILE = int(os.environ.get("FPLLL_TPU_PALLAS_MAX_TILE", "0"))


def pallas_tile(m: int, batch: int) -> int:
    """Largest power-of-two lane tile (multiple of 128, dividing batch)
    whose VMEM state fits; 0 if none does. Batches above the tile run as
    a Pallas grid over lane tiles (sequential cells, same kernel).
    FPLLL_TPU_PALLAS_MAX_TILE caps the tile (tests / hardware tuning)."""
    tile = batch
    while tile >= 128 and (batch % tile or not _tile_fits(m, tile) or
                           (_MAX_TILE and tile > _MAX_TILE)):
        tile //= 2
    return tile if tile >= 128 else 0


def pallas_batch_fits(m: int, batch: int) -> bool:
    """The (m, batch) config can run on the Pallas path (possibly as a
    lane-tiled grid)."""
    return pallas_tile(m, batch) > 0


def _cround(x):
    """C round(): halves away from zero, elementwise."""
    return jnp.trunc(x + jnp.where(x >= 0, jnp.float32(0.5),
                                   jnp.float32(-0.5)))


# state array order (all aliased in/out):
#   x_arr (m,B)  pd_arr (m,B)  cs (m,B)  bdev (m,B)
#   k (1,B)i32  act (1,B)i32  xk ck pdk rk prk bdist (1,B)f32
# the in-kernel-root-queue variant appends: ridx bri (1,B)i32
_N_STATE = 12


def _make_chunk_kernel(m: int, B: int, chunk: int, is_svp: bool,
                       count_mode: bool, wide_scalars: bool = False,
                       rq_nfixp: int = -1, rq_R: int = 0,
                       rq_grid: bool = False, rq_G_real: int = 0):
    """wide_scalars: A/steps outputs are (1, B) VMEM rows (broadcast per
    lane tile) instead of (1, 1) SMEM scalars — the lane-tiled grid path
    needs this because TPU lowering rejects (1, 1) blocks over a
    (grid, 1) array.

    rq_nfixp >= 0 enables the IN-KERNEL ROOT QUEUE: the packed root
    array lives in VMEM and one root is popped per step into the first
    dead lane (the device-resident swirlys queue of enum/tpu.py moved
    inside the chunk loop). Without it, lanes dying mid-chunk idle until
    the next XLA-level refill — on pruned BKZ windows that left ~90% of
    lanes dead for most of the walk. Roots are sorted by pd ascending,
    so the first bound-dead root drains the whole remaining queue in
    O(1). Extra state rows ridx/bri attribute each lane's current root
    and the root of its best solution.

    rq_grid runs the rq kernel as one cell of a grid over INDEPENDENT
    window problems (the grouped-trial launch of the native BKZ loop:
    G rerandomized trials enumerated in ONE kernel launch, the
    many-walkers-one-launch analogue of enum-parallel/enumeration.h:
    412-505). Per-problem quantities (Mx, mut_fix, cp0, root queue
    segment, bound A, cursor, m_real) are selected by program_id via
    BlockSpecs; scalar carries (A/steps/cursor) ride (1, B) VMEM rows
    instead of (1, 1) SMEM blocks, which TPU lowering rejects over a
    (grid, 1) array."""
    rq = rq_nfixp >= 0
    n_state = _N_STATE + (2 if rq else 0)
    # trace-time ablation knob (perf diagnosis ONLY — wrong results):
    # "nocs" skips the cs update, "nofetch" replaces the fused matmul
    # with constants, "noleaf" skips the leaf-range math, "nosave"
    # skips the descend save/count writes
    _ablate = os.environ.get("FPLLL_TPU_PALLAS_ABLATE", "")

    def kernel(Mx_ref, A_ref, *refs):
        ash_ref = None
        if rq:
            cur_ref = refs[0]
            mr_ref = refs[1]      # topmost real level + 1 (m_real), SMEM
            MxF_ref = refs[2]
            cp0C_ref = refs[3]
            rootsP_ref = refs[4]  # HBM-resident; groups DMA'd on demand
            if rq_grid:
                roots_vmem_ref = refs[-4]
                roots_sem_ref = refs[-3]
                cur_s = refs[-2]
                ash_ref = refs[-1]  # SMEM shared bound, persists across
                #                     grid cells: the trials search the
                #                     SAME lattice, so any trial's best
                #                     distance bounds every other trial
                #                     (enumlib's shared shrinking A,
                #                     enum-parallel/enumeration.h:68-83)
                refs = refs[5:-4]
            else:
                roots_vmem_ref = refs[-3]
                roots_sem_ref = refs[-2]
                cur_s = refs[-1]  # SMEM cursor (mutable inside pl.when)
                refs = refs[5:-3]
            cur_s[0, 0] = cur_ref[0, 0]
        if rq and rq_grid:
            # this cell's segment of the stacked per-problem root queues
            _rows_pg = ((rq_nfixp + 1 + 7) // 8) * 8
            rq_base = pl.program_id(0) * jnp.int32((rq_R // 128) * _rows_pg)
        else:
            rq_base = jnp.int32(0)
        ins = refs[:n_state]
        (x_o, pd_o, cs_o, bdev_o, k_o, act_o, xk_o, ck_o, pdk_o, rk_o,
         prk_o, bdist_o) = refs[n_state:n_state + _N_STATE]
        if rq:
            ridx_o, bri_o = refs[n_state + _N_STATE:2 * n_state]
        tail = refs[2 * n_state:]
        A_o, nodes_o, leaf0_o, sol_o, steps_o = tail[:5]
        if rq:
            cur_o = tail[5]
        # aliased HBM buffers still get distinct VMEM windows: seed the
        # output windows once per chunk
        for i_ref, o_ref in zip(ins, refs[n_state:2 * n_state]):
            o_ref[:] = i_ref[:]
        nodes_o[:] = jnp.zeros((m, B), _F)
        leaf0_o[:] = jnp.zeros((1, B), _F)
        sol_o[:] = jnp.zeros((1, B), _F)

        rows = jax.lax.broadcasted_iota(_I, (m, B), 0)
        row0 = rows == 0
        row1 = rows == 1
        Mx = Mx_ref[:]                      # (m+_XR, m)
        r0 = Mx_ref[m, 0]
        pr0 = Mx_ref[m + 1, 0]
        mu10 = Mx_ref[0, 1]                 # mu[1,0]
        zero = jnp.float32(0.0)
        one = jnp.float32(1.0)
        inf = jnp.float32(np.inf)

        def step(carry):
            if rq:
                i, _, A = carry
            else:
                i, _, A = carry
            k = k_o[0, :]
            act = act_o[0, :] != 0
            xk = xk_o[0, :]
            ck = ck_o[0, :]
            pdk = pdk_o[0, :]
            rk = rk_o[0, :]
            prk = prk_o[0, :]
            bdist = bdist_o[0, :]

            kc = jnp.clip(k, jnp.int32(0), jnp.int32(m - 1))
            alpha = xk - ck
            newdist = pdk + alpha * alpha * rk
            ok = act & (newdist <= prk * A)
            leafp = kc == 1
            dcand = ok & ~leafp             # descend candidates
            leaf = ok & leafp
            fail = act & ~ok

            # ---- leaf-range processing (whole level-0 sibling range) ----
            c0 = cs_o[0, :] - xk * mu10
            bound0 = pr0 * A
            room = bound0 - newdist
            if "noleaf" in _ablate:
                w = room
            else:
                w = jnp.sqrt(jnp.maximum(room, zero) / r0)
            lo = jnp.ceil(c0 - w)
            hi = jnp.floor(c0 + w)

            def leaf_ok(xv):
                a0 = xv - c0
                return newdist + a0 * a0 * r0 <= bound0

            # one endpoint correction each way keeps f32 counts identical
            # to the stepwise per-node bound test
            hi = hi + jnp.where(leaf_ok(hi + one), one, zero)
            hi = hi - jnp.where(~leaf_ok(hi), one, zero)
            lo = lo - jnp.where(leaf_ok(lo - one), one, zero)
            lo = lo + jnp.where(~leaf_ok(lo), one, zero)
            if is_svp:
                trivial = newdist == zero
                lo = jnp.where(trivial, jnp.maximum(lo, zero), lo)
            cnt = jnp.maximum(hi - lo + one, zero)
            cnt = jnp.where(leaf, cnt, zero)
            if is_svp:
                solc = jnp.where(trivial, jnp.maximum(cnt - one, zero),
                                 cnt)
            else:
                solc = cnt
            sol_o[0, :] = sol_o[0, :] + jnp.where(leaf, solc, zero)
            leaf0_o[0, :] = leaf0_o[0, :] + cnt

            xstar = jnp.clip(_cround(c0), lo, hi)
            if is_svp:
                xbest = jnp.where(trivial, one, xstar)
                have = jnp.where(trivial, hi, cnt) >= one
            else:
                xbest = xstar
                have = cnt > zero
            ab = xbest - c0
            dbest = newdist + ab * ab * r0
            valid = leaf & have
            better = valid & (dbest < bdist)
            bdist = jnp.where(better, dbest, bdist)
            if not count_mode:
                cand = jnp.where(valid, dbest, inf)
                # reduce to (1,) then extract: scalar-shaped reductions
                # proxy-lower through 64-bit temporaries under x64
                A = jnp.minimum(A, jnp.min(cand[None, :], axis=1)[0])

            n_better = jnp.sum(jnp.where(better, one, zero)[None, :],
                               axis=1)[0]

            @pl.when(n_better > zero)
            def _():
                # full solution = best leaf + current level-1 x + saved
                # upper path
                full = jnp.where(row0, xbest[None, :],
                                 jnp.where(row1, xk[None, :], x_o[:]))
                bdev_o[:] = jnp.where(better[None, :], full, bdev_o[:])

            if rq:  # attribute the improvement to the lane's current root
                bri_o[0, :] = jnp.where(better, ridx_o[0, :], bri_o[0, :])

            # ---- one fused fetch: mu row + rdiag/prune at the target ----
            # rows of Mx: [0:m] = mu^T strictly-above-diagonal (so the cs
            # update needs no triangle mask), m = rdiag, m+1 = prune,
            # m+2 = rdiag shifted down one, m+3 = prune shifted,
            # m+4 = superdiagonal mu[j-1, j].
            # sel level: fail lanes fetch the ascend target kc+1; all
            # passing lanes (descend candidates AND in-level siblings)
            # fetch kc itself, so the select is known before the barren
            # lookahead resolves.
            k_sib = jnp.where(fail, kc + 1, kc)
            lane_done = fail & (k_sib >= m)
            ks = jnp.clip(k_sib, jnp.int32(0), jnp.int32(m - 1))
            oh_sel = rows == ks[None, :]
            oh_self = jnp.where(oh_sel, one, zero)
            # full-precision fetch: the one-hot selection must return the
            # exact f32 mu/rdiag/prune values (default MXU precision
            # truncates operands to bf16; Mosaic does not support
            # per-operand precision, which could halve the passes here)
            if "nofetch" in _ablate:
                col = jnp.broadcast_to(Mx_ref[:, 0:1], (m + _XR, B))
            else:
                col = jax.lax.dot(Mx, oh_self, preferred_element_type=_F,
                                  precision=jax.lax.Precision.HIGHEST)
            r_sel = col[m, :]
            p_sel = col[m + 1, :]
            r_dn = col[m + 2, :]
            p_dn = col[m + 3, :]
            mud1 = col[m + 4, :]            # mu[ks-1, ks]

            # ---- barren lookahead: child center + first-child test ------
            # c_child = cs[kc-1] - xk*mu[kc-1, kc] matches the center the
            # child step would compute from the in-array update, assuming
            # XLA/Mosaic lowers both mul+add sites without asymmetric FMA
            # contraction (XLA's default); the failing child was never
            # counted, so skipping the descend changes no counts.
            kdn = jnp.maximum(kc - 1, jnp.int32(0))
            oh_dn = rows == kdn[None, :]
            cdn0 = jnp.sum(jnp.where(oh_dn, cs_o[:], zero), axis=0)
            c_child = cdn0 - xk * mud1
            x_first = _cround(c_child)
            if is_svp:
                x_first = jnp.where(newdist == zero,
                                    jnp.maximum(x_first, zero), x_first)
            a_dn = x_first - c_child
            dmin_child = newdist + a_dn * a_dn * r_dn
            barren = dcand & (dmin_child > p_dn * A)
            descend = dcand & ~barren

            # ---- restores needed by ascending lanes (all at row ks) -----
            xs = jnp.sum(jnp.where(oh_sel, x_o[:], zero), axis=0)
            pds = jnp.sum(jnp.where(oh_sel, pd_o[:], zero), axis=0)
            csel = jnp.sum(jnp.where(oh_sel, cs_o[:], zero), axis=0)

            sib = leaf | fail | barren
            do_sib = sib & ~lane_done
            asc = do_sib & fail
            k_new = jnp.where(descend, kc - 1, jnp.where(do_sib, k_sib, k))

            # ---- cs update (descend subtracts, ascend restores) ---------
            # ascend target center needs no post-update read: cs_new[ks] =
            # cs_old[ks] + xs*col[ks] and col[ks] = 0 (strict upper tri).
            coeff = jnp.where(descend, -xk, jnp.where(asc, xs, zero))
            if "nocs" not in _ablate:
                cs_o[:] = cs_o[:] + coeff[None, :] * col[:m, :]
            c_t = jnp.where(descend, c_child, csel)

            # ---- saves by descending lanes; per-level node counters -----
            save = oh_sel & descend[None, :]
            if "nosave" not in _ablate:
                x_o[:] = jnp.where(save, xk[None, :], x_o[:])
                pd_o[:] = jnp.where(save, pdk[None, :], pd_o[:])
                # count every passing node at its level
                nodes_o[:] = nodes_o[:] + jnp.where(oh_sel & ok[None, :],
                                                    one, zero)

            # ---- new register state -------------------------------------
            # sibling (leaf/barren stay in level; ascend to ks after
            # restore): stateless zig-zag around the level's rounded center
            sib_c = jnp.where(asc, c_t, ck)
            sib_x = jnp.where(asc, xs, xk)
            sib_pd = jnp.where(asc, pds, pdk)
            cr = _cround(sib_c)
            d0 = jnp.where(sib_c >= cr, one, -one)
            p = sib_x - cr
            p_adv = -p + jnp.where(p * d0 <= zero, d0, zero)
            x_zz = cr + p_adv
            if is_svp:
                x_sib = jnp.where(sib_pd == zero, sib_x + one, x_zz)
            else:
                x_sib = x_zz

            xk_n = jnp.where(descend, x_first, jnp.where(do_sib, x_sib, xk))
            ck_n = jnp.where(descend, c_t, jnp.where(asc, c_t, ck))
            pdk_n = jnp.where(descend, newdist,
                              jnp.where(asc, pds, pdk))
            rk_n = jnp.where(descend, r_dn, jnp.where(asc, r_sel, rk))
            prk_n = jnp.where(descend, p_dn, jnp.where(asc, p_sel, prk))
            act_new = act & ~lane_done
            act_i = jnp.where(act_new, jnp.int32(1), jnp.int32(0))

            k_o[0, :] = k_new
            act_o[0, :] = act_i
            xk_o[0, :] = xk_n
            ck_o[0, :] = ck_n
            pdk_o[0, :] = pdk_n
            rk_o[0, :] = rk_n
            prk_o[0, :] = prk_n
            bdist_o[0, :] = bdist

            if not rq:
                alive = jnp.sum(act_i[None, :], axis=1, dtype=_I)[0] > 0
                return (i + jnp.int32(1), alive, A)

            # ---- in-kernel root-queue pop (up to POPW roots per step) ---
            # cursor lives in SMEM scratch so the whole pop — DMA of the
            # cursor's 128-root group, one-hot extract, lane assignment —
            # runs only on steps that actually have a dead lane.  Round-5
            # profiling showed root-heavy launches (R ~ 100k, subtree
            # sizes ~100 nodes) spending nearly EVERY step popping: at
            # one root per step the queue drain itself lower-bounds the
            # step count by R.  The pop now assigns up to POPW dead lanes
            # from the same DMA'd group in one step (one (128, POPW)
            # selection matmul + one (m, POPW) center matmul), lifting
            # the refill ceiling 8x.
            nfixp = rq_nfixp
            rows_pg = ((nfixp + 1 + 7) // 8) * 8  # sublane-aligned group
            POPW = int(os.environ.get("FPLLL_TPU_POPW", "8"))
            deadv = act_i == 0
            n_dead = jnp.sum(deadv[None, :].astype(_I), axis=1,
                             dtype=_I)[0]
            lanes = jax.lax.broadcasted_iota(_I, (1, B), 1)[0, :]
            cur_now = cur_s[0, 0]
            # fire the (heavier) multi-pop only once enough lanes are
            # dead to use most of its width; near the end of the queue
            # any dead lane pops so the drain finishes promptly
            thresh = jnp.minimum(jnp.int32(max(POPW // 2, 1)),
                                 jnp.int32(rq_R) - cur_now)
            do_pop = (n_dead >= thresh) & (n_dead > jnp.int32(0)) & \
                (cur_now < jnp.int32(rq_R))

            mr1 = mr_ref[0, 0] - jnp.int32(1)   # topmost real level

            @pl.when(do_pop)
            def _():
                g = cur_now // jnp.int32(128)
                l = cur_now - g * jnp.int32(128)
                # never advance past what dead lanes can actually absorb:
                # an uncapped advance would skip (lose) whole subtrees
                navail = jnp.minimum(
                    jnp.minimum(jnp.int32(POPW), n_dead),
                    jnp.minimum(jnp.int32(128) - l,
                                jnp.int32(rq_R) - cur_now))
                copy = pltpu.make_async_copy(
                    rootsP_ref.at[pl.ds(rq_base + g * rows_pg, rows_pg), :],
                    roots_vmem_ref, roots_sem_ref)
                copy.start()
                copy.wait()
                blk = roots_vmem_ref[:]
                # rank dead lanes (inclusive prefix sum via a log-depth
                # shift-add network; Mosaic has no cumsum primitive);
                # lane with rank p takes root cur_now+p
                ps = deadv.astype(_F)[None, :]          # (1, B)
                sh = 1
                while sh < B:
                    ps = ps + jnp.concatenate(
                        [jnp.zeros((1, sh), _F), ps[:, :B - sh]], axis=1)
                    sh *= 2
                rank = ps[0, :].astype(_I) - jnp.int32(1)
                take = deadv & (rank < navail)
                ohr = jnp.where(
                    (jax.lax.broadcasted_iota(_I, (POPW, B), 0) ==
                     rank[None, :]) & take[None, :], one, zero)  # (POPW,B)
                iot128 = jax.lax.broadcasted_iota(_I, (128, POPW), 0)
                iotP = jax.lax.broadcasted_iota(_I, (128, POPW), 1)
                ohlP = jnp.where((iot128 == l + iotP) & (iotP < navail),
                                 one, zero)                      # (128,POPW)
                rootcols = jax.lax.dot_general(
                    blk, ohlP, (((1,), (0,)), ((), ())),
                    preferred_element_type=_F,
                    precision=jax.lax.Precision.HIGHEST)  # (rows_pg, POPW)
                pdv = jax.lax.dot_general(
                    rootcols[nfixp:nfixp + 1, :], ohr,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=_F,
                    precision=jax.lax.Precision.HIGHEST)[0, :]   # (B,)
                livev = take & (pdv <= A)
                if nfixp:
                    csn_all = cp0C_ref[:] - jax.lax.dot(
                        MxF_ref[:], rootcols[:nfixp, :],
                        preferred_element_type=_F,
                        precision=jax.lax.Precision.HIGHEST)     # (m, POPW)
                else:
                    csn_all = jnp.broadcast_to(cp0C_ref[:], (m, POPW))
                cs_new = jax.lax.dot(
                    csn_all, ohr, preferred_element_type=_F,
                    precision=jax.lax.Precision.HIGHEST)         # (m, B)
                rpd0 = jnp.where(livev, pdv, zero)
                c0v = cs_new[m - 1, :]
                x0v = jnp.trunc(c0v + jnp.where(c0v >= zero,
                                                jnp.float32(0.5),
                                                jnp.float32(-0.5)))
                if is_svp:
                    x0v = jnp.where(rpd0 == zero, jnp.maximum(x0v, zero),
                                    x0v)
                selr = take[None, :]
                cs_o[:] = jnp.where(selr, cs_new, cs_o[:])
                k_o[0, :] = jnp.where(take, jnp.int32(m - 1), k_o[0, :])
                act_o[0, :] = jnp.where(take,
                                        livev.astype(_I), act_o[0, :])
                xk_o[0, :] = jnp.where(take, x0v, xk_o[0, :])
                ck_o[0, :] = jnp.where(take, c0v, ck_o[0, :])
                pdk_o[0, :] = jnp.where(take, rpd0, pdk_o[0, :])
                rk_o[0, :] = jnp.where(take, Mx_ref[m, m - 1], rk_o[0, :])
                prk_o[0, :] = jnp.where(take, Mx_ref[m + 1, m - 1],
                                        prk_o[0, :])
                ridx_o[0, :] = jnp.where(take, cur_now + rank,
                                         ridx_o[0, :])
                # sorted ascending pd: a bound-dead root (or the finite
                # pd sentinel of the padding) drains the rest in O(1)
                n_live = jnp.sum(jnp.where(livev, jnp.int32(1),
                                           jnp.int32(0))[None, :],
                                 axis=1, dtype=_I)[0]
                cur_s[0, 0] = jnp.where(n_live < navail,
                                        jnp.int32(rq_R),
                                        cur_now + navail)

            # ---- top-level sibling donation (queue empty) ---------------
            # The terminal tail of a pruned search is a handful of giant
            # subtree walks with every other lane dead (the analogue of
            # enumlib's work stealing, enum-parallel/enumeration.h:460).
            # A dead lane adopts the NEXT top-level sibling of the
            # deepest live lane's current root: the donor's saved pd at
            # the top real level is set to +inf so its own ascent stops
            # there, and the adoptee continues the zig-zag from the
            # donor's saved x — splitting the remaining top siblings off
            # one subtree at a time without host involvement.
            n_act = jnp.sum(act_o[0, :][None, :], axis=1, dtype=_I)[0]
            # donate only once the root queue is exhausted: while roots
            # remain, a sub-threshold dead count just waits for the next
            # gated multi-pop (donating mid-queue would race the queue
            # and pay the 2-DMA donation cost on ordinary steps)
            do_donate = (cur_now >= jnp.int32(rq_R)) & \
                (n_dead > jnp.int32(0)) & \
                (n_act > jnp.int32(0)) & (mr1 >= jnp.int32(1))

            @pl.when(do_donate)
            def _():
                rows_m = jax.lax.broadcasted_iota(_I, (m, B), 0)
                k_row = k_o[0, :]
                # stealable levels of each lane: strictly above its
                # current position, at or below the top real level, and
                # not yet donated away (saved pd still finite)
                elig = (rows_m > k_row[None, :]) & \
                    (rows_m <= mr1[None, None]) & \
                    (pd_o[:] < jnp.float32(1e30))
                has_steal = jnp.sum(jnp.where(elig, one, zero),
                                    axis=0) > zero
                donor_ok = (act_o[0, :] != 0) & has_steal
                kk = jnp.where(donor_ok, k_row, jnp.int32(m))
                mnk = jnp.min(kk[None, :], axis=1)[0]
                dn_sel = donor_ok & (k_row == mnk)
                dn = jnp.min(jnp.where(dn_sel, lanes[None, :],
                                       jnp.int32(B)), axis=1)[0]
                have = dn < jnp.int32(B)
                dcol = lanes == dn
                # topmost stealable level of the chosen donor
                jcand = jnp.max(jnp.where(elig & dcol[None, :], rows_m,
                                          jnp.int32(-1)), axis=0)  # (B,)
                jstar = jnp.max(jcand[None, :], axis=1)[0]
                jrow = rows_m == jstar[None, None]
                xcol = jnp.sum(jnp.where(dcol[None, :], x_o[:], zero),
                               axis=1)             # (m,) donor path
                vj = jnp.sum(jnp.sum(jnp.where(jrow & dcol[None, :],
                                               x_o[:], zero),
                                     axis=0)[None, :], axis=1)[0]
                pdj = jnp.sum(jnp.sum(jnp.where(jrow & dcol[None, :],
                                                pd_o[:], zero),
                                      axis=0)[None, :], axis=1)[0]
                ridx_dn = jnp.sum(jnp.where(dcol, ridx_o[0, :],
                                            jnp.int32(0))[None, :],
                                  axis=1, dtype=_I)[0]
                # adoptee center sums = fresh root sums minus the donor's
                # path contributions for levels (jstar, mr1]
                rc = jnp.clip(ridx_dn, jnp.int32(0), jnp.int32(rq_R - 1))
                g2 = rc // jnp.int32(128)
                l2 = rc - g2 * jnp.int32(128)
                copy2 = pltpu.make_async_copy(
                    rootsP_ref.at[pl.ds(rq_base + g2 * rows_pg, rows_pg), :],
                    roots_vmem_ref, roots_sem_ref)
                copy2.start()
                copy2.wait()
                blk2 = roots_vmem_ref[:]
                ohl2 = jnp.where(
                    jax.lax.broadcasted_iota(_I, (1, 128), 1) == l2, one,
                    zero)
                rootcol2 = jax.lax.dot_general(
                    blk2, ohl2, (((1,), (1,)), ((), ())),
                    preferred_element_type=_F,
                    precision=jax.lax.Precision.HIGHEST)
                if nfixp:
                    csn2 = cp0C_ref[:] - jax.lax.dot(
                        MxF_ref[:], rootcol2[:nfixp, :],
                        preferred_element_type=_F,
                        precision=jax.lax.Precision.HIGHEST)
                else:
                    csn2 = cp0C_ref[:]
                iot_m = jax.lax.broadcasted_iota(_I, (m, 1), 0)
                xmask = jnp.where((iot_m > jstar) & (iot_m <= mr1),
                                  xcol[:, None], zero)      # (m, 1)
                csn_f = csn2 - jax.lax.dot(
                    Mx_ref[pl.ds(0, m), :], xmask,
                    preferred_element_type=_F,
                    precision=jax.lax.Precision.HIGHEST)
                c2 = jnp.sum(jnp.where(iot_m == jstar, csn_f, zero),
                             axis=0)[0]
                # zig-zag successor of the donor's saved x at jstar
                cr2 = jnp.trunc(c2 + jnp.where(c2 >= zero,
                                               jnp.float32(0.5),
                                               jnp.float32(-0.5)))
                d02 = jnp.where(c2 >= cr2, one, -one)
                p2 = vj - cr2
                p2a = -p2 + jnp.where(p2 * d02 <= zero, d02, zero)
                x2 = cr2 + p2a
                if is_svp:
                    x2 = jnp.where(pdj == zero, vj + one, x2)
                iot_r = jax.lax.broadcasted_iota(_I, (1, m), 1)
                r2 = jnp.sum(jnp.where(iot_r == jstar,
                                       Mx_ref[pl.ds(m, 1), :], zero),
                             axis=1)[0]
                pr2 = jnp.sum(jnp.where(iot_r == jstar,
                                        Mx_ref[pl.ds(m + 1, 1), :], zero),
                              axis=1)[0]
                mn2 = jnp.min(jnp.where(deadv[None, :], lanes[None, :],
                                        jnp.int32(B)), axis=1)[0]
                sel2 = deadv & (lanes == mn2) & have
                selr2 = sel2[None, :]
                above = rows_m > jstar[None, None]
                cs_o[:] = jnp.where(selr2, csn_f, cs_o[:])
                # the adoptee inherits the donor's upper path (solution
                # reconstruction) and poisoned pd above jstar (its own
                # ascent must stop there)
                x_o[:] = jnp.where(selr2 & above, xcol[:, None], x_o[:])
                pd_o[:] = jnp.where(selr2 & above,
                                    jnp.float32(jnp.inf), pd_o[:])
                k_o[0, :] = jnp.where(sel2, jstar, k_o[0, :])
                act_o[0, :] = jnp.where(sel2, jnp.int32(1), act_o[0, :])
                xk_o[0, :] = jnp.where(sel2, x2, xk_o[0, :])
                ck_o[0, :] = jnp.where(sel2, c2, ck_o[0, :])
                pdk_o[0, :] = jnp.where(sel2, pdj, pdk_o[0, :])
                rk_o[0, :] = jnp.where(sel2, r2, rk_o[0, :])
                prk_o[0, :] = jnp.where(sel2, pr2, prk_o[0, :])
                ridx_o[0, :] = jnp.where(sel2, ridx_dn, ridx_o[0, :])
                # cap the donor's own ascent at the donated level
                pd_o[:] = jnp.where(jrow & (dcol & have)[None, :],
                                    jnp.float32(jnp.inf), pd_o[:])

            alive = (jnp.sum(act_o[0, :][None, :], axis=1, dtype=_I)[0] >
                     jnp.int32(0)) | (cur_s[0, 0] < jnp.int32(rq_R))
            return (i + jnp.int32(1), alive, A)

        def cond(carry):
            i, alive, _ = carry
            return (i < jnp.int32(chunk)) & alive

        A_start = A_ref[0, 0]
        if ash_ref is not None:
            @pl.when(pl.program_id(0) == 0)
            def _():
                ash_ref[0, 0] = jnp.float32(np.inf)
            A_start = jnp.minimum(A_start, ash_ref[0, 0])
        i_fin, _, A_fin = jax.lax.while_loop(
            cond, step, (jnp.int32(0), jnp.bool_(True), A_start))
        if ash_ref is not None:
            @pl.when(pl.program_id(0) < jnp.int32(rq_G_real))
            def _():
                ash_ref[0, 0] = jnp.minimum(ash_ref[0, 0], A_fin)
        if rq:
            if wide_scalars:
                cur_o[0, :] = jnp.full((B,), cur_s[0, 0], _I)
            else:
                cur_o[0, 0] = cur_s[0, 0]
        if wide_scalars:
            A_o[0, :] = jnp.full((B,), A_fin, _F)
            steps_o[0, :] = jnp.full((B,), i_fin, _I)
        else:
            A_o[0, 0] = A_fin
            steps_o[0, 0] = i_fin

    return kernel


@partial(jax.jit, static_argnames=("m", "B", "chunk", "is_svp",
                                   "count_mode", "nfixp", "R"))
def _chunk_call_rq(Mx, A, cur, mr, MxF, cp0C, rootsP, x, pd, cs, bdev, k,
                   act, xk, ck, pdk, rk, prk, bdist, ridx, bri, m: int,
                   B: int, chunk: int, is_svp: bool, count_mode: bool,
                   nfixp: int, R: int):
    """One VMEM-resident chunk with the IN-KERNEL root queue (single
    tile only; the lane-tiled grid keeps the XLA-level refill)."""
    n_state = _N_STATE + 2
    rows_pg = ((nfixp + 1 + 7) // 8) * 8
    kernel = _make_chunk_kernel(m, B, chunk, is_svp, count_mode,
                                rq_nfixp=nfixp, rq_R=R)
    smem = partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    vmem = partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    mB = jax.ShapeDtypeStruct((m, B), _F)
    oBf = jax.ShapeDtypeStruct((1, B), _F)
    oBi = jax.ShapeDtypeStruct((1, B), _I)
    return pl.pallas_call(
        kernel,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        scratch_shapes=[pltpu.VMEM((rows_pg, 128), _F),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SMEM((1, 1), _I)],
        in_specs=[vmem(), smem((1, 1)), smem((1, 1)), smem((1, 1)),
                  vmem(), vmem(),
                  pl.BlockSpec(memory_space=pltpu.ANY)] +
        [vmem()] * n_state,
        out_shape=(mB, mB, mB, mB, oBi, oBi, oBf, oBf, oBf, oBf, oBf,
                   oBf, oBi, oBi,
                   jax.ShapeDtypeStruct((1, 1), _F),    # A
                   mB,                                   # nodes
                   oBf, oBf,                             # leaf0/sol
                   jax.ShapeDtypeStruct((1, 1), _I),     # steps
                   jax.ShapeDtypeStruct((1, 1), _I)),    # cursor
        out_specs=tuple([vmem()] * n_state) + (smem((1, 1)), vmem(),
                                               vmem(), vmem(),
                                               smem((1, 1)),
                                               smem((1, 1))),
        input_output_aliases={i + 7: i for i in range(n_state)},
        interpret=_INTERPRET,
    )(Mx, A, cur, mr, MxF, cp0C, rootsP, x, pd, cs, bdev, k, act, xk, ck,
      pdk, rk, prk, bdist, ridx, bri)


@partial(jax.jit, static_argnames=("G", "m", "B", "chunk", "is_svp",
                                   "nfixp", "R", "G_real"))
def _chunk_call_rq_grouped(Mx, A, cur, mr, MxF, cp0C, rootsP, x, pd, cs,
                           bdev, k, act, xk, ck, pdk, rk, prk, bdist, ridx,
                           bri, G: int, m: int, B: int, chunk: int,
                           is_svp: bool, nfixp: int, R: int,
                           G_real: int = 0):
    """One VMEM-resident chunk over a grid of G INDEPENDENT window
    problems (grouped-trial launch), each cell = the rq kernel on its
    own problem: Mx/MxF/cp0C stacked along rows, lane state stacked
    along lanes ((m, G*B) with columns [g*B, (g+1)*B) = problem g), the
    packed root queues stacked in HBM and offset by program_id.  Cells
    run sequentially on the core — the win is ONE launch and zero host
    round-trips between trials, not intra-launch parallelism."""
    n_state = _N_STATE + 2
    rows_pg = ((nfixp + 1 + 7) // 8) * 8
    kernel = _make_chunk_kernel(m, B, chunk, is_svp, False,
                                wide_scalars=True, rq_nfixp=nfixp, rq_R=R,
                                rq_grid=True, rq_G_real=G_real)
    GB = G * B

    def lane_i(g):
        return (jnp.int32(0), g)

    def row_g(g):
        return (g, jnp.int32(0))

    vmem_m = pl.BlockSpec((m, B), lane_i, memory_space=pltpu.VMEM)
    vmem_1f = pl.BlockSpec((1, B), lane_i, memory_space=pltpu.VMEM)
    vmem_Mx = pl.BlockSpec((m + _XR, m), row_g, memory_space=pltpu.VMEM)
    vmem_MxF = pl.BlockSpec((m, nfixp), row_g, memory_space=pltpu.VMEM)
    vmem_cp0 = pl.BlockSpec((m, 1), row_g, memory_space=pltpu.VMEM)
    state_specs = [vmem_m] * 4 + [vmem_1f] * 10
    mGB = jax.ShapeDtypeStruct((m, GB), _F)
    oGBf = jax.ShapeDtypeStruct((1, GB), _F)
    oGBi = jax.ShapeDtypeStruct((1, GB), _I)
    return pl.pallas_call(
        kernel,
        grid=(G,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        scratch_shapes=[pltpu.VMEM((rows_pg, 128), _F),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SMEM((1, 1), _I),
                        pltpu.SMEM((1, 1), _F)],
        in_specs=[vmem_Mx, vmem_1f, vmem_1f, vmem_1f, vmem_MxF, vmem_cp0,
                  pl.BlockSpec(memory_space=pltpu.ANY)] + state_specs,
        out_shape=(mGB, mGB, mGB, mGB, oGBi, oGBi, oGBf, oGBf, oGBf, oGBf,
                   oGBf, oGBf, oGBi, oGBi,
                   oGBf,                                 # A (per problem)
                   mGB,                                  # nodes
                   oGBf, oGBf,                           # leaf0/sol
                   oGBi,                                 # steps
                   oGBi),                                # cursor
        out_specs=tuple(state_specs) + (vmem_1f, vmem_m, vmem_1f, vmem_1f,
                                        vmem_1f, vmem_1f),
        input_output_aliases={i + 7: i for i in range(n_state)},
        interpret=_INTERPRET,
    )(Mx, A, cur, mr, MxF, cp0C, rootsP, x, pd, cs, bdev, k, act, xk, ck,
      pdk, rk, prk, bdist, ridx, bri)


@partial(jax.jit, static_argnames=("G", "m", "B", "R", "nfixp", "is_svp",
                                   "chunk", "max_steps", "G_real"))
def _enum_run_pallas_grouped(Mx_all, MxF_all, cp0C_all, rootsP_all, A0s,
                             mrs, G: int, m: int, B: int, R: int,
                             nfixp: int, is_svp: bool = True,
                             chunk: int = _CHUNK, max_steps: int = 1 << 30,
                             G_real: int = 0):
    """Enumerate G independent window problems in ONE launch sequence
    (the device side of the native BKZ grouped-trial seam).  All lanes
    start DEAD with per-problem cursors at 0: the in-kernel root queue
    fills them (one pop per step), which avoids shipping the unpacked
    per-problem root arrays to the device twice.  Returns per-problem
    best distance / device-level coordinates / root coordinates and the
    per-level node totals."""
    GB = G * B
    rows_pg = ((nfixp + 1 + 7) // 8) * 8
    st = {
        "x": jnp.zeros((m, GB), _F),
        "pd": jnp.zeros((m, GB), _F),
        "cs": jnp.zeros((m, GB), _F),
        "bdev": jnp.zeros((m, GB), _F),
        "k": jnp.full((1, GB), m - 1, dtype=_I),
        "act": jnp.zeros((1, GB), _I),
        "xk": jnp.zeros((1, GB), _F),
        "ck": jnp.zeros((1, GB), _F),
        "pdk": jnp.zeros((1, GB), _F),
        "rk": jnp.ones((1, GB), _F),
        "prk": jnp.ones((1, GB), _F),
        "bdist": jnp.full((1, GB), jnp.inf, dtype=_F),
        "ridx": jnp.zeros((1, GB), _I),
        "bri": jnp.zeros((1, GB), _I),
        "A": jnp.asarray(A0s, _F).reshape(1, GB),
        "cur": jnp.zeros((1, GB), _I),
        "steps": jnp.asarray(0, dtype=jnp.int64),
        "nodes": jnp.zeros((m,), dtype=jnp.float64),
        "sol_count": jnp.zeros((), dtype=jnp.float64),
    }
    mrs_r = jnp.asarray(mrs, _I).reshape(1, GB)

    def body(s):
        (x, pd, cs, bdev, k, act, xk, ck, pdk, rk, prk, bdist, ridx, bri,
         A, nodes_d, leaf0, sol_d, steps_d, cur) = _chunk_call_rq_grouped(
            Mx_all, s["A"], s["cur"], mrs_r, MxF_all, cp0C_all, rootsP_all,
            s["x"], s["pd"], s["cs"], s["bdev"], s["k"], s["act"], s["xk"],
            s["ck"], s["pdk"], s["rk"], s["prk"], s["bdist"], s["ridx"],
            s["bri"], G=G, m=m, B=B, chunk=chunk, is_svp=True, nfixp=nfixp,
            R=R, G_real=(G_real if G_real else G))
        s = dict(s)
        s.update(x=x, pd=pd, cs=cs, bdev=bdev, k=k, act=act, xk=xk, ck=ck,
                 pdk=pdk, rk=rk, prk=prk, bdist=bdist, ridx=ridx, bri=bri,
                 A=A, cur=cur)
        nsum = jnp.sum(nodes_d, axis=1).astype(jnp.float64)
        nsum = nsum.at[0].add(jnp.sum(leaf0.astype(jnp.float64)))
        s["nodes"] = s["nodes"] + nsum
        s["sol_count"] = s["sol_count"] + jnp.sum(sol_d.astype(jnp.float64))
        s["steps"] = s["steps"] + jnp.max(steps_d).astype(jnp.int64)
        return s

    def cond(s):
        return (jnp.any(s["act"] != 0) | jnp.any(s["cur"] < R)) & \
            (s["steps"] < max_steps)

    out = jax.lax.while_loop(cond, body, st)
    bd = jnp.where(jnp.isfinite(out["bdist"][0, :]), out["bdist"][0, :],
                   jnp.inf).reshape(G, B)
    lane = jnp.argmin(bd, axis=1)                       # (G,)
    cols = jnp.arange(G) * B + lane
    dist_g = bd[jnp.arange(G), lane]
    dev_g = out["bdev"][:, cols].T                      # (G, m)
    bri_g = out["bri"][0, cols]                         # (G,)
    # unpack the winning roots from the packed queue: root ri of problem
    # g lives at rows [g*(R//128)*rows_pg + (ri//128)*rows_pg ... +nfixp),
    # column ri % 128
    base = jnp.arange(G) * ((R // 128) * rows_pg) + \
        (bri_g // 128) * rows_pg
    lanecol = bri_g % 128
    root_g = rootsP_all[base[:, None] + jnp.arange(nfixp)[None, :],
                        lanecol[:, None]]               # (G, nfixp)
    return {
        "dist": dist_g,
        "dev": dev_g,
        "root": root_g,
        "nodes": out["nodes"],
        "steps": out["steps"],
        "A": out["A"][0, :].reshape(G, B)[:, 0],
    }


@partial(jax.jit, static_argnames=("m", "B", "chunk", "is_svp",
                                   "count_mode"))
def _chunk_call(Mx, A, x, pd, cs, bdev, k, act, xk, ck, pdk, rk, prk,
                bdist, m: int, B: int, chunk: int, is_svp: bool,
                count_mode: bool):
    """One VMEM-resident chunk over all B lanes.  When the full-B state
    exceeds VMEM, lanes are tiled over a Pallas grid (sequential cells,
    same kernel per tile); the shrinking bound A is then per-tile within
    the chunk — correct-but-wasteful exactly like enumlib's stale atomic
    bound — and tiles are re-merged (min) between chunks by the caller."""
    tile = pallas_tile(m, B)
    grid = B // tile
    kernel = _make_chunk_kernel(m, tile, chunk, is_svp, count_mode)
    smem = partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    mB = jax.ShapeDtypeStruct((m, B), _F)
    oBf = jax.ShapeDtypeStruct((1, B), _F)
    oBi = jax.ShapeDtypeStruct((1, B), _I)
    if grid == 1:
        vmem = partial(pl.BlockSpec, memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            in_specs=[vmem(), smem((1, 1))] + [vmem()] * _N_STATE,
            out_shape=(mB, mB, mB, mB, oBi, oBi, oBf, oBf, oBf, oBf, oBf,
                       oBf,
                       jax.ShapeDtypeStruct((1, 1), _F),    # A
                       mB,                                   # nodes
                       oBf, oBf,                             # leaf0/sol
                       jax.ShapeDtypeStruct((1, 1), _I)),    # steps
            out_specs=tuple([vmem()] * _N_STATE) + (smem((1, 1)), vmem(),
                                                    vmem(), vmem(),
                                                    smem((1, 1))),
            input_output_aliases={i + 2: i for i in range(_N_STATE)},
            interpret=_INTERPRET,
        )(Mx, A, x, pd, cs, bdev, k, act, xk, ck, pdk, rk, prk, bdist)

    # lane-tiled grid: sequential cells of `tile` lanes each; A/steps come
    # back broadcast across each tile's lane segment and are re-merged to
    # keep the (1, 1) contract
    kernel = _make_chunk_kernel(m, tile, chunk, is_svp, count_mode,
                                wide_scalars=True)

    # index maps must return i32 under jax_enable_x64: a plain Python 0
    # becomes an i64 constant and Mosaic refuses the mixed-width return
    def lane_i(i):
        return (jnp.int32(0), i)

    def const_i(i):
        return (jnp.int32(0), jnp.int32(0))

    vmem_m = pl.BlockSpec((m, tile), lane_i, memory_space=pltpu.VMEM)
    vmem_1 = pl.BlockSpec((1, tile), lane_i, memory_space=pltpu.VMEM)
    vmem_Mx = pl.BlockSpec((m + _XR, m), const_i, memory_space=pltpu.VMEM)
    state_specs = [vmem_m] * 4 + [vmem_1] * 8
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        in_specs=[vmem_Mx, smem((1, 1), const_i)] + state_specs,
        out_shape=(mB, mB, mB, mB, oBi, oBi, oBf, oBf, oBf, oBf, oBf,
                   oBf,
                   oBf,                                   # A (per lane)
                   mB,                                    # nodes
                   oBf, oBf,                              # leaf0/sol
                   oBi),                                  # steps (per lane)
        out_specs=tuple(state_specs) + (vmem_1, vmem_m,
                                        vmem_1, vmem_1,
                                        vmem_1),
        input_output_aliases={i + 2: i for i in range(_N_STATE)},
        interpret=_INTERPRET,
    )(Mx, A, x, pd, cs, bdev, k, act, xk, ck, pdk, rk, prk, bdist)
    # merge per-tile A (min) and steps (max) back to the (1, 1) contract
    res = list(out)
    res[12] = jnp.min(res[12], axis=1, keepdims=True)
    res[16] = jnp.max(res[16], axis=1, keepdims=True)
    return tuple(res)


@partial(jax.jit, static_argnames=("m", "is_svp", "count_mode", "max_steps",
                                   "batch", "chunk"))
def _enum_run_pallas(mut, rdiag, prune, mut_fix, cp0, roots_x, roots_pd, A0,
                     m: int, is_svp: bool, count_mode: bool, max_steps: int,
                     batch: int = 4096, chunk: int = _CHUNK,
                     m_real=None):
    """Drop-in replacement for tpu._enum_run (same contract; f32 only):
    outer XLA loop alternates VMEM-resident Pallas chunks with root-queue
    refills of finished lanes.  `mut` follows the driver convention
    mut = mu^T (extenum contract, enumerate_ext.cpp:67-78).  m_real (the
    first virtual bucket-padding level; dynamic, defaults to m) feeds the
    in-kernel work-donation of the root-queue variant."""
    if m_real is None:
        m_real = m
    B = batch
    R = roots_x.shape[0]
    nfix = roots_x.shape[1]
    mut_f = jnp.asarray(mut, _F)
    rdiag_f = jnp.asarray(rdiag, _F)
    prune_f = jnp.asarray(prune, _F)
    cp0_c = jnp.asarray(cp0, _F).reshape(m, 1)
    mut_fix_f = jnp.asarray(mut_fix, _F)
    roots_x_f = jnp.asarray(roots_x, _F)
    roots_pd_f = jnp.asarray(roots_pd, _F)

    # matmul operand: mu rows (strict upper of mu^T, so fetched columns
    # are already zero at and above the fetched level) + rdiag/prune and
    # their shift-down-by-one in extra rows + the superdiagonal (for the
    # barren lookahead's child-center completion)
    Mx = jnp.zeros((m + _XR, m), _F)
    Mx = Mx.at[:m, :].set(jnp.triu(mut_f, 1))
    Mx = Mx.at[m, :].set(rdiag_f)
    Mx = Mx.at[m + 1, :].set(prune_f)
    Mx = Mx.at[m + 2, :].set(jnp.concatenate([rdiag_f[:1], rdiag_f[:-1]]))
    Mx = Mx.at[m + 3, :].set(jnp.concatenate([prune_f[:1], prune_f[:-1]]))
    Mx = Mx.at[m + 4, 1:].set(jnp.diagonal(mut_f, offset=1))

    r_top = rdiag_f[m - 1]
    p_top = prune_f[m - 1]

    def make_fresh(rx, rpd):
        """Transposed state from root rows rx (B, nfix), rpd (B,)."""
        if nfix:
            cs = cp0_c - jax.lax.dot(mut_fix_f, rx.T,
                                     preferred_element_type=_F,
                                     precision=jax.lax.Precision.HIGHEST)
        else:
            cs = jnp.broadcast_to(cp0_c, (m, B))
        c0 = cs[m - 1, :]
        x0 = jnp.trunc(c0 + jnp.where(c0 >= 0, jnp.float32(0.5),
                                      jnp.float32(-0.5)))
        if is_svp:
            x0 = jnp.where(rpd == 0.0, jnp.maximum(x0, 0.0), x0)
        return cs, x0, c0

    # in-kernel root queue: single-tile configs whose packed roots fit
    # VMEM next to the lane state pop fresh subtree roots inside the
    # chunk loop (one per step), instead of idling dead lanes until the
    # next XLA-level refill
    # roots stay HBM-resident (the kernel DMAs one 128-root group at a
    # time), so only the lane state constrains VMEM here
    rq_rows_pg = ((nfix + 1 + 7) // 8) * 8
    use_rq = (pallas_tile(m, B) == B) and nfix > 0 and R % 128 == 0 and \
        os.environ.get("FPLLL_TPU_PALLAS_RQ", "1") != "0"

    idx0 = jnp.arange(B)
    rx0 = roots_x_f[jnp.clip(idx0, 0, R - 1)]
    rpd0 = roots_pd_f[jnp.clip(idx0, 0, R - 1)]
    live0 = (idx0 < R) & jnp.isfinite(rpd0) & (rpd0 <= A0)
    rpd0 = jnp.where(live0, rpd0, 0.0).astype(_F)
    cs0, x0, c0 = make_fresh(rx0, rpd0)
    st = {
        "x": jnp.zeros((m, B), _F),
        "pd": jnp.zeros((m, B), _F),
        "cs": cs0,
        "bdev": jnp.zeros((m, B), _F),
        "k": jnp.full((1, B), m - 1, dtype=_I),
        "act": live0.astype(_I).reshape(1, B),
        "xk": x0.reshape(1, B),
        "ck": c0.reshape(1, B),
        "pdk": rpd0.reshape(1, B),
        "rk": jnp.full((1, B), r_top, _F),
        "prk": jnp.full((1, B), p_top, _F),
        "bdist": jnp.full((1, B), jnp.inf, dtype=_F),
        "A": jnp.asarray(A0, _F).reshape(1, 1),
        "lane_root": rx0,
        "best_root": jnp.zeros((B, nfix), _F),
        "cursor": jnp.asarray(B, dtype=_I),
        "steps": jnp.asarray(0, dtype=jnp.int64),
        "nodes": jnp.zeros((m,), dtype=jnp.float64),
        "sol_count": jnp.zeros((), dtype=jnp.float64),
    }

    if use_rq:
        # pd padding must be a LARGE FINITE sentinel: the in-kernel
        # one-hot selection is an MXU dot, and inf * 0.0 = NaN would
        # poison the popped pd (NaN fails both the live and the drain
        # comparison, wedging the cursor forever)
        pd_fin = jnp.where(jnp.isfinite(roots_pd_f), roots_pd_f,
                           1e30).astype(_F)
        rootsP = jnp.concatenate(
            [roots_x_f, pd_fin[:, None],
             jnp.zeros((R, rq_rows_pg - (nfix + 1)), _F)], axis=1)
        rootsP = rootsP.reshape(R // 128, 128, rq_rows_pg)
        rootsP = rootsP.transpose(0, 2, 1).reshape(
            (R // 128) * rq_rows_pg, 128)
        st_rq = dict(st)
        del st_rq["lane_root"], st_rq["best_root"], st_rq["cursor"]
        st_rq["ridx"] = jnp.clip(idx0, 0, R - 1).astype(_I).reshape(1, B)
        st_rq["bri"] = jnp.zeros((1, B), _I)
        st_rq["curd"] = jnp.full((1, 1), B, _I)
        mrd = jnp.asarray(m_real, _I).reshape(1, 1)

        def body_rq(s):
            (x, pd, cs, bdev, k, act, xk, ck, pdk, rk, prk, bdist, ridx,
             bri, A, nodes_d, leaf0, sol_d, steps_d, curd) = _chunk_call_rq(
                Mx, s["A"], s["curd"], mrd, mut_fix_f, cp0_c, rootsP,
                s["x"],
                s["pd"], s["cs"], s["bdev"], s["k"], s["act"], s["xk"],
                s["ck"], s["pdk"], s["rk"], s["prk"], s["bdist"],
                s["ridx"], s["bri"], m=m, B=B, chunk=chunk, is_svp=is_svp,
                count_mode=count_mode, nfixp=nfix, R=R)
            s = dict(s)
            s.update(x=x, pd=pd, cs=cs, bdev=bdev, k=k, act=act, xk=xk,
                     ck=ck, pdk=pdk, rk=rk, prk=prk, bdist=bdist,
                     ridx=ridx, bri=bri, A=A, curd=curd)
            nsum = jnp.sum(nodes_d, axis=1).astype(jnp.float64)
            nsum = nsum.at[0].add(jnp.sum(leaf0.astype(jnp.float64)))
            s["nodes"] = s["nodes"] + nsum
            s["sol_count"] = s["sol_count"] + jnp.sum(
                sol_d.astype(jnp.float64))
            s["steps"] = s["steps"] + steps_d[0, 0].astype(jnp.int64)
            return s

        def cond_rq(s):
            return (jnp.any(s["act"] != 0) | (s["curd"][0, 0] < R)) & \
                (s["steps"] < max_steps)

        out = jax.lax.while_loop(cond_rq, body_rq, st_rq)
        K = min(B, 128)
        bd = jnp.where(jnp.isfinite(out["bdist"][0, :]),
                       out["bdist"][0, :], jnp.inf)
        negd, idx = jax.lax.top_k(-bd, K)
        broots = roots_x_f[jnp.clip(out["bri"][0, :], 0, R - 1)]
        return {
            "nodes": out["nodes"],
            "best_dist": -negd,
            "best_dev": out["bdev"].T[idx],
            "best_root": broots[idx],
            "sol_count": out["sol_count"],
            "steps": out["steps"],
            "A": out["A"][0, 0],
            "cursor": out["curd"][0, 0],
        }

    def do_refill(s):
        needv = (s["act"][0, :] == 0)
        rank = jnp.cumsum(needv.astype(_I)) - 1
        ridx = s["cursor"] + rank
        can = needv & (ridx < R)
        ridx_c = jnp.clip(ridx, 0, R - 1)
        rx = roots_x_f[ridx_c]
        rpd = roots_pd_f[ridx_c]
        live = can & jnp.isfinite(rpd) & (rpd <= s["A"][0, 0])
        rpd = jnp.where(live, rpd, 0.0).astype(_F)
        fcs, fx0, fc0 = make_fresh(rx, rpd)
        sel = can[None, :]
        s = dict(s)
        s["cs"] = jnp.where(sel, fcs, s["cs"])
        s["k"] = jnp.where(sel, jnp.int32(m - 1), s["k"])
        s["act"] = jnp.where(sel, live[None, :].astype(_I), s["act"])
        s["xk"] = jnp.where(sel, fx0[None, :], s["xk"])
        s["ck"] = jnp.where(sel, fc0[None, :], s["ck"])
        s["pdk"] = jnp.where(sel, rpd[None, :], s["pdk"])
        s["rk"] = jnp.where(sel, r_top, s["rk"])
        s["prk"] = jnp.where(sel, p_top, s["prk"])
        if nfix:
            s["lane_root"] = jnp.where(can[:, None], rx, s["lane_root"])
        s["cursor"] = jnp.minimum(
            s["cursor"] + jnp.sum(needv, dtype=_I), jnp.asarray(R, _I))
        return s

    def body(s):
        bdist_prev = s["bdist"]
        (x, pd, cs, bdev, k, act, xk, ck, pdk, rk, prk, bdist, A,
         nodes_d, leaf0, sol_d, steps_d) = _chunk_call(
            Mx, s["A"], s["x"], s["pd"], s["cs"], s["bdev"], s["k"],
            s["act"], s["xk"], s["ck"], s["pdk"], s["rk"], s["prk"],
            s["bdist"], m=m, B=B, chunk=chunk, is_svp=is_svp,
            count_mode=count_mode)
        s = dict(s)
        s.update(x=x, pd=pd, cs=cs, bdev=bdev, k=k, act=act, xk=xk, ck=ck,
                 pdk=pdk, rk=rk, prk=prk, bdist=bdist, A=A)
        # lane-sums are exact in f32 (per-element counts <= chunk and
        # per-level totals <= B*chunk < 2^24 for default sizes); emulated
        # f64 math is kept off the (m, B) arrays — it costs milliseconds
        # per chunk on TPU.  nodes_d rows already hold per-level counts of
        # every passing node (including level-1 leaf visits); absorbed
        # level-0 ranges arrive via leaf0.
        nsum = jnp.sum(nodes_d, axis=1).astype(jnp.float64)
        nsum = nsum.at[0].add(jnp.sum(leaf0.astype(jnp.float64)))
        s["nodes"] = s["nodes"] + nsum
        s["sol_count"] = s["sol_count"] + jnp.sum(
            sol_d.astype(jnp.float64))
        s["steps"] = s["steps"] + steps_d[0, 0].astype(jnp.int64)
        if nfix:
            improved = (bdist < bdist_prev)[0, :]
            s["best_root"] = jnp.where(improved[:, None], s["lane_root"],
                                       s["best_root"])
        need = jnp.any((s["act"] == 0) & (s["cursor"] < R))
        return jax.lax.cond(need, do_refill, lambda q: q, s)

    def cond(s):
        return (jnp.any(s["act"] != 0) | (s["cursor"] < R)) & \
            (s["steps"] < max_steps)

    out = jax.lax.while_loop(cond, body, st)
    # on-device top-K finalize (cf. tpu._enum_run): trim host transfers
    # to the K best lanes
    K = min(B, 128)
    bd = jnp.where(jnp.isfinite(out["bdist"][0, :]), out["bdist"][0, :],
                   jnp.inf)
    negd, idx = jax.lax.top_k(-bd, K)
    return {
        "nodes": out["nodes"],
        "best_dist": -negd,
        "best_dev": out["bdev"].T[idx],
        "best_root": out["best_root"][idx],
        "sol_count": out["sol_count"],
        "steps": out["steps"],
        "A": out["A"][0, 0],
    }
