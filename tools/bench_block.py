"""Parameterized BKZ-2.0 e2e leg with device-share accounting.

Usage: python tools/bench_block.py [block] [dim] [seed] [prog,prog,...]

Runs LLL + progressive warm-up tours (untimed), then ONE timed tour at
`block`, and prints a JSON line with wall-clock, total/facade nodes,
device nodes (the share enumerated through the device callback), the
largest grouped-trial launch, and the native phase timers.  This is the
driver for the round-5 "device carries production BKZ nodes" A/B:
run it once normally (TPU) and once with FPLLL_TPU_PLATFORM=cpu or
FPLLL_TPU_HYBRID_NODES=0 (device disabled).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    block = int(sys.argv[1]) if len(sys.argv) > 1 else 70
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 90
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 17
    prog = tuple(int(x) for x in sys.argv[4].split(",")) \
        if len(sys.argv) > 4 else tuple(
            b for b in (40, 50, 60) if b < block)

    from fplll_tpu.algs.bkz import BKZReduction
    from fplll_tpu.algs.bkz_param import BKZParam, load_strategies_json
    from fplll_tpu.algs.wrapper import lll_reduction
    from fplll_tpu.defs import BKZ_GH_BND, BKZ_MAX_LOOPS
    from fplll_tpu.nr.rng import RandGen
    from fplll_tpu.ops.gen import gen_qary_bits

    RandGen.init_with_seed(seed)
    b = gen_qary_bits(d, d // 2, 30)
    lll_reduction(b)
    strategies = load_strategies_json("default.json")

    stats = {"nodes": 0, "dev_nodes": 0, "g_max": 0, "timers": {},
             "phase": {}}
    orig = BKZReduction.bkz

    def spy(self, *a, **k):
        try:
            return orig(self, *a, **k)
        finally:
            stats["nodes"] += self.nodes
            stats["dev_nodes"] += getattr(self, "dev_nodes", 0)
            stats["g_max"] = max(stats["g_max"], getattr(self, "g_max", 0))
            for key, v in getattr(self, "native_timers", {}).items():
                stats["phase"][key] = stats["phase"].get(key, 0.0) + v

    BKZReduction.bkz = spy
    try:
        from fplll_tpu.algs.bkz import bkz_reduction
        t_warm = time.time()
        for warm in prog:
            bkz_reduction(b, BKZParam(block_size=warm, strategies=strategies,
                                      flags=BKZ_MAX_LOOPS | BKZ_GH_BND,
                                      max_loops=1))
        warm_s = time.time() - t_warm
        stats.update(nodes=0, dev_nodes=0, g_max=0, phase={})
        t0 = time.time()
        bkz_reduction(b, BKZParam(block_size=block, strategies=strategies,
                                  flags=BKZ_MAX_LOOPS | BKZ_GH_BND,
                                  max_loops=1))
        dt = time.time() - t0
    finally:
        BKZReduction.bkz = orig
    try:
        from fplll_tpu.native import get_lll_lib
        import ctypes
        lib = get_lll_lib()
        from fplll_tpu.native import get_bkz_lib
        blib = get_bkz_lib()
        if blib is not None:
            out = (ctypes.c_double * 8)()
            blib.bkz_prof(out)
            stats["timers"] = {"t_ugr": round(out[0], 2),
                               "t_red": round(out[1], 2),
                               "t_bf": round(out[2], 2),
                               "babai_calls": int(out[3]),
                               "babai_iters": int(out[4]),
                               "t_rowop": round(out[5], 2),
                               "rowops": int(out[6])}
    except Exception:
        pass
    print(json.dumps({
        "leg": f"bkz2_block{block}_dim{d}_seed{seed}",
        "progressive": list(prog),
        "warmup_wall_s": round(warm_s, 2),
        "tour_wall_s": round(dt, 2),
        "nodes": int(stats["nodes"]),
        "dev_nodes": int(stats["dev_nodes"]),
        "dev_share": round(stats["dev_nodes"] / max(stats["nodes"], 1), 4),
        "g_max": stats["g_max"],
        "nodes_per_sec": round(stats["nodes"] / max(dt, 1e-9), 1),
        "phase": {k: round(v, 2) for k, v in stats["phase"].items()},
        "babai_prof": stats["timers"],
        "platform": os.environ.get("FPLLL_TPU_PLATFORM", "tpu"),
    }))


if __name__ == "__main__":
    main()
