"""Virtual-mesh node-throughput table (BASELINE.md config 5).

Runs the same count-mode enumeration through the sharded driver on 1..N
virtual CPU devices. On the host platform all devices share the same
cores, so this measures the PROTOCOL overhead of the sharded path (root
dealing, pmin/psum exchange cadence, per-shard queues) rather than real
scaling — real ICI scaling needs pod hardware; the driver's multichip
dryrun covers compilation. Run:

  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  JAX_PLATFORMS=cpu FPLLL_TPU_PLATFORM=cpu python tools/mesh_scaling.py
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    from fplll_tpu.jaxsetup import jax
    from fplll_tpu.algs.wrapper import lll_reduction
    from fplll_tpu.core.gso import MatGSO
    from fplll_tpu.defs import GSO_INT_GRAM
    from fplll_tpu.enum.evaluator import FastEvaluator
    from fplll_tpu.nr.fctx import MPCtx
    from fplll_tpu.nr.rng import RandGen
    from fplll_tpu.ops.gen import gen_qary_bits
    from fplll_tpu.parallel.mesh import ShardedEnumerator, make_enum_mesh

    d = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    RandGen.init_with_seed(7)
    b = gen_qary_bits(d, d // 2, 20)
    lll_reduction(b)
    gso = MatGSO(b, flags=GSO_INT_GRAM, ctx=MPCtx(90))
    gso.update_gso()
    mut, rdiag, normexp = gso.export_mu_r(0, d)
    log_ball = (d / 2.0) * math.log(math.pi) - math.lgamma(d / 2.0 + 1.0)
    gh2 = math.exp(float(np.mean(np.log(rdiag))) - 2.0 * log_ball / d)
    radius = 1.05 * gh2

    ndev_all = len(jax.devices())
    rows = {}
    for n in [x for x in (1, 2, 4, 8) if x <= ndev_all]:
        se = ShardedEnumerator(make_enum_mesh(n), batch_per_device=256)
        ev = FastEvaluator()
        se.enumerate(mut, rdiag, None, np.zeros(d), radius, True, ev,
                     count_mode=True)           # warm compile
        t0 = time.time()
        ev = FastEvaluator()
        se.enumerate(mut, rdiag, None, np.zeros(d), radius, True, ev,
                     count_mode=True)
        dt = time.time() - t0
        nodes = int(se.nodes.sum())
        rows[n] = {"nodes": nodes, "wall_s": round(dt, 3),
                   "nodes_per_s": round(nodes / max(dt, 1e-9), 1)}
        print(f"devices={n}: {rows[n]}", flush=True)

    # pod-readiness bookkeeping: radius-exchange cadence sensitivity at
    # the full mesh width (staleness tolerance of the pmin protocol,
    # cf. /root/reference/fplll/enum-parallel/enumeration.h:68-83).
    # Larger sync_steps = fewer collectives but staler bounds (wasted
    # nodes); the table seeds the tuning when pod hardware exists.
    sync_rows = {}
    if os.environ.get("FPLLL_TPU_MESH_SYNC_SWEEP", "1") != "0":
        for ss in (512, 1024, 2048, 4096, 8192):
            se = ShardedEnumerator(make_enum_mesh(ndev_all),
                                   batch_per_device=256,
                                   steps_per_sweep=ss)
            ev = FastEvaluator(nr_solutions=1)
            se.enumerate(mut, rdiag, None, np.zeros(d), radius, True, ev)
            t0 = time.time()
            ev = FastEvaluator(nr_solutions=1)
            se.enumerate(mut, rdiag, None, np.zeros(d), radius, True, ev)
            dt = time.time() - t0
            nodes = int(se.nodes.sum())
            sync_rows[ss] = {"nodes": nodes, "wall_s": round(dt, 3)}
            print(f"sync_steps={ss}: {sync_rows[ss]}", flush=True)
    print(json.dumps({"dim": d, "platform": jax.default_backend(),
                      "rows": rows, "sync_sweep": sync_rows}))
    return 0


if __name__ == "__main__":
    main()
