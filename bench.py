"""Headline benchmark: enumeration throughput (nodes/sec) of the batched
TPU kernel on a fixed-radius SVP counting workload.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The workload is a deterministic dim-46 q-ary lattice, LLL-reduced, with
the tree searched in count mode (fixed Gaussian-heuristic radius, no
bound shrinking) for a fixed number of lockstep steps — the measurement
therefore covers steady-state kernel throughput, not tree-shape luck.

vs_baseline compares against fplll's single-thread enumeration rate.
The reference cannot be built in this container (no GMP/MPFR), so the
baseline is pinned at 4.0e7 nodes/s — a typical single-core rate for
fplll's compiled enumerators on modern x86, and consistent with the
58M nodes/s our own native C re-implementation of the same loop reaches
on this host (fplll publishes no numbers in-tree; see BASELINE.md).
"""

from __future__ import annotations

import json
import math
import sys
import time

import numpy as np

BASELINE_NODES_PER_SEC = 4.0e7


def build_problem(d: int = 46, seed: int = 7):
    from fplll_tpu.algs.wrapper import lll_reduction
    from fplll_tpu.core.gso import MatGSO
    from fplll_tpu.defs import GSO_INT_GRAM
    from fplll_tpu.nr.fctx import MPCtx
    from fplll_tpu.nr.rng import RandGen
    from fplll_tpu.ops.gen import gen_qary_bits

    RandGen.init_with_seed(seed)
    b = gen_qary_bits(d, d // 2, 20)
    lll_reduction(b)
    gso = MatGSO(b, flags=GSO_INT_GRAM, ctx=MPCtx(90))
    gso.update_gso()
    mut, rdiag, normexp = gso.export_mu_r(0, d)
    log_ball = (d / 2.0) * math.log(math.pi) - math.lgamma(d / 2.0 + 1.0)
    gh2 = math.exp(float(np.mean(np.log(rdiag))) - 2.0 * log_ball / d)
    return mut, rdiag, gh2


def run_steps(mut, rdiag, radius, batch, max_steps, dtype):
    """Step-capped count-mode run through the one-launch kernel."""
    from fplll_tpu.jaxsetup import jax, jnp
    from fplll_tpu.enum.evaluator import FastEvaluator
    from fplll_tpu.enum.tpu import TPUEnumerator, _enum_run

    d = len(rdiag)
    enum = TPUEnumerator(batch=batch, dtype=dtype)
    enum.nodes = np.zeros(d, dtype=np.int64)
    prune = np.ones(d)
    roots_x, roots_pd, m_real = enum._gen_roots(
        mut, rdiag, prune, np.zeros(d), radius, d, True)
    order = np.argsort(roots_pd)
    roots_x, roots_pd = roots_x[order], roots_pd[order]
    nfix = d - m_real
    m = min(((m_real + 7) // 8) * 8, enum.max_device_levels)
    mut_pad = np.zeros((m, m))
    mut_pad[:m_real, :m_real] = mut[:m_real, :m_real]
    rdiag_pad = np.full(m, 1e300 if dtype == jnp.float64 else 1e30)
    rdiag_pad[:m_real] = rdiag[:m_real]
    prune_pad = np.ones(m)
    cp0_pad = np.zeros(m)
    nfix_pad = 0
    while nfix_pad < nfix:
        nfix_pad = 8 if nfix_pad == 0 else nfix_pad * 2
    mut_fix_pad = np.zeros((m, nfix_pad))
    if nfix:
        mut_fix_pad[:m_real, :nfix] = mut[:m_real, m_real:d]
    R_pad = 1024
    while R_pad < len(roots_pd):
        R_pad *= 2
    rx_pad = np.zeros((R_pad, nfix_pad))
    rpd_pad = np.full(R_pad, np.inf)
    rx_pad[:len(roots_pd), :nfix] = roots_x
    rpd_pad[:len(roots_pd)] = roots_pd

    kw = dict(m=m, is_svp=True, count_mode=True, batch=batch)
    from fplll_tpu.enum.pallas_kernel import (pallas_available,
                                              _enum_run_pallas)
    if dtype == jnp.float32 and pallas_available():
        def run():
            return _enum_run_pallas(mut_pad, rdiag_pad, prune_pad,
                                    mut_fix_pad, cp0_pad, rx_pad, rpd_pad,
                                    radius, max_steps=max_steps, **kw)
    else:
        args = tuple(jnp.asarray(a, dtype) for a in
                     (mut_pad, rdiag_pad, prune_pad, mut_fix_pad, cp0_pad,
                      rx_pad, rpd_pad)) + (jnp.asarray(radius, dtype),)

        def run():
            return _enum_run(*args, max_steps=max_steps, **kw)
    # Warm-up executes the EXACT timed executable once (same static args):
    # on the axon tunnel, block_until_ready returns prematurely for the
    # first run of a fresh executable, so timing must cover a repeat run
    # and sync through a real host transfer (np.asarray), not
    # block_until_ready.
    state = run()
    np.asarray(state["nodes"])
    t0 = time.time()
    state = run()
    nodes = float(np.asarray(state["nodes"]).sum())
    dt = time.time() - t0
    return nodes, dt, int(state["steps"])


def main() -> int:
    d = int(sys.argv[1]) if len(sys.argv) > 1 else 46
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    max_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 400000
    from fplll_tpu.jaxsetup import jnp
    mut, rdiag, gh2 = build_problem(d)
    best = 0.0
    for dtype in (jnp.float32,):
        nodes, dt, steps = run_steps(mut, rdiag, 1.1 * gh2, batch, max_steps,
                                     dtype)
        best = max(best, nodes / max(dt, 1e-9))
    print(json.dumps({
        "metric": f"enum_nodes_per_sec_dim{d}",
        "value": round(best, 1),
        "unit": "nodes/s",
        "vs_baseline": round(best / BASELINE_NODES_PER_SEC, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
