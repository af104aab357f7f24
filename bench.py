"""Headline benchmark: enumeration throughput (nodes/sec) of the batched
TPU kernel on an SVP instance.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline compares against fplll's single-thread enumeration rate.
The reference cannot be built in this container (no GMP/MPFR), so the
baseline is pinned at 4.0e7 nodes/s — a typical single-core rate for
fplll's compiled enumerators on modern x86 (see BASELINE.md; fplll
publishes no numbers in-tree, README.md:309-315).
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
    # radius: a bit above the Gaussian heuristic so the tree is substantial
    log_ball = (d / 2.0) * math.log(math.pi) - math.lgamma(d / 2.0 + 1.0)
    gh2 = math.exp(float(np.mean(np.log(rdiag))) - 2.0 * log_ball / d)
    return mut, rdiag, 1.05 * gh2


def run_once(mut, rdiag, radius, batch):
    from fplll_tpu.enum.evaluator import FastEvaluator
    from fplll_tpu.enum.tpu import TPUEnumerator

    ev = FastEvaluator()
    enum = TPUEnumerator(batch=batch)
    t0 = time.time()
    enum.enumerate(mut, rdiag, None, np.zeros(len(rdiag)), radius, True, ev)
    dt = time.time() - t0
    return int(enum.nodes.sum()), dt


def main() -> int:
    d = int(sys.argv[1]) if len(sys.argv) > 1 else 46
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    mut, rdiag, radius = build_problem(d)
    # warm-up triggers kernel compilation (cached afterwards)
    run_once(mut, rdiag, radius * 0.2, batch)
    nodes, dt = run_once(mut, rdiag, radius, batch)
    rate = nodes / max(dt, 1e-9)
    print(json.dumps({
        "metric": f"enum_nodes_per_sec_dim{d}",
        "value": round(rate, 1),
        "unit": "nodes/s",
        "vs_baseline": round(rate / BASELINE_NODES_PER_SEC, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
