"""Calibrate the BKZ simulator's HKZ tail with this framework's own
HKZ engine.

The Chen-Nguyen simulator (fplll_tpu/algs/simulator.py) fixes the last
45 GSO log-norms of every simulated profile to the AVERAGE profile of an
HKZ-reduced random lattice.  CN11 obtained those 45 constants by Monte
Carlo; instead of hard-coding their published table we re-derive it
in-tree: HKZ-reduce seeded random unit-ish-volume lattices with the
framework's BKZ driver (block = dim), record the volume-normalized
log-norm profiles, and store the average in
fplll_tpu/strategies/hkz_tail.json.

Usage:
  python tools/calibrate_simulator_tail.py [--trials 24] [--dim 45]

Runtime: ~1-2 s per trial at dim 45 on this host (progressive warm-up
30 -> 40 -> HKZ), so the default 24 trials finish in under a minute.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def hkz_log_profile(dim: int, seed: int):
    """HKZ-reduce a seeded random dim-dim lattice and return its
    zero-sum GSO log-norm profile (natural log of ||b_i*||)."""
    from fplll_tpu.algs.bkz import bkz_reduction
    from fplll_tpu.algs.bkz_param import BKZParam, load_strategies_json
    from fplll_tpu.algs.wrapper import lll_reduction
    from fplll_tpu.core.gso import MatGSO
    from fplll_tpu.defs import BKZ_GH_BND, BKZ_MAX_LOOPS, GSO_ROW_EXPO
    from fplll_tpu.nr.rng import RandGen
    from fplll_tpu.ops.gen import gen_qary_bits

    strategies = load_strategies_json("default.json")
    RandGen.init_with_seed(seed)
    b = gen_qary_bits(dim, dim // 2, 30)
    lll_reduction(b)
    for warm in (30, 40):
        if warm < dim:
            bkz_reduction(b, BKZParam(warm, strategies,
                                      flags=BKZ_MAX_LOOPS | BKZ_GH_BND,
                                      max_loops=1))
    param = BKZParam(dim, strategies, flags=BKZ_GH_BND)
    param.delta = 1.0 - 1e-9
    bkz_reduction(b, param)

    m = MatGSO(b, flags=GSO_ROW_EXPO)
    m.update_gso()
    logs = []
    for i in range(dim):
        v, e = m.get_r_exp(i, i)
        # r_ii = ||b_i*||^2 -> log-norm is half the log
        logs.append(0.5 * (math.log(m.ctx.to_float(v)) +
                           e * math.log(2.0)))
    mean = sum(logs) / dim
    return [x - mean for x in logs]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=24)
    ap.add_argument("--dim", type=int, default=45)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "fplll_tpu", "strategies",
        "hkz_tail.json"))
    args = ap.parse_args()

    acc = [0.0] * args.dim
    done = 0
    for t in range(args.trials):
        prof = hkz_log_profile(args.dim, seed=1009 + 37 * t)
        for i in range(args.dim):
            acc[i] += prof[i]
        done += 1
        print(f"trial {t + 1}/{args.trials}: head {prof[0]:.4f} "
              f"tail {prof[-1]:.4f}", flush=True)
    avg = [round(x / done, 8) for x in acc]

    data = {}
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                data = json.load(f)
        except (OSError, ValueError):
            data = {}
    data[str(args.dim)] = avg
    data.setdefault("_meta", {})[str(args.dim)] = {
        "trials": done, "generator": "qary bits=30",
        "tool": "tools/calibrate_simulator_tail.py"}
    with open(args.out, "w") as f:
        json.dump(data, f, indent=1)
    print(f"wrote {args.out} ({done} trials, dim {args.dim})")

    # quick sanity: compare against the GH-recursion fallback
    from fplll_tpu.algs.simulator import _gh_tail
    fb = _gh_tail(args.dim)
    rms = math.sqrt(sum((a - b) ** 2 for a, b in zip(avg, fb)) / args.dim)
    print(f"rms deviation from GH-recursion fallback: {rms:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
