"""Measure preprocessing chains against real window cost.

Round-3 strategies used a fixed `[beta-20]` preprocessing rule and a
hand-waved `100*beta^2` preprocessing node cost in the pruner's
repeated-cost target (the reference ships strategizer-tuned chains,
/root/reference/NEWS:9-10, selected in bkz_param.cpp:62-78). This tool
replaces both with measurements:

for each block size, it progressively reduces a fixed basis, then times
`svp_reduction` windows under each candidate chain (everything runs the
native BKZ core, so one configuration is milliseconds-to-seconds), and
separately counts the nodes of one preprocessing pass. The result JSON
feeds tools/gen_strategies.py --calibration.

Usage:
  python tools/calibrate_preproc.py --blocks 40,50,60,70,80,90 \
      --out tools/preproc_calibration.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def candidate_chains(beta: int):
    # the empty chain is only bounded for small blocks (block-50 windows
    # without preprocessing already measured ~350x slower; at block 70 a
    # single unpreprocessed window can run for hours)
    outs = [[]] if beta < 55 else []
    # round-5 beta-80 measurement: cost grows monotonically with the
    # chain block (gap 24 best of the old set), so big blocks probe
    # wider gaps too
    gaps = (32, 28, 24, 20, 16, 12) if beta >= 75 else (24, 20, 16, 12)
    for gap in gaps:
        if beta - gap >= 10:
            outs.append([beta - gap])
    # two-stage chains for big blocks (strategizer-style ladders)
    if beta >= 60:
        outs.append([beta - 30, beta - 15])
        outs.append([beta - 36, beta - 18])
    return outs


def measure_block(beta: int, reps: int, budget_s: float,
                  min_succ: float = 0.5):
    import numpy as np

    from fplll_tpu.algs.bkz import BKZReduction
    from fplll_tpu.algs.bkz_param import BKZParam, load_strategies_json
    from fplll_tpu.algs.lll import LLLReduction
    from fplll_tpu.algs.wrapper import lll_reduction
    from fplll_tpu.algs.bkz import bkz_reduction
    from fplll_tpu.core.gso import MatGSO
    from fplll_tpu.defs import (BKZ_GH_BND, BKZ_MAX_LOOPS, GSO_ROW_EXPO,
                                LLL_DEF_DELTA, LLL_DEF_ETA, LLL_DEFAULT)
    from fplll_tpu.nr.rng import RandGen
    from fplll_tpu.ops.gen import gen_qary_bits

    d = beta + 15
    RandGen.init_with_seed(1000 + beta)
    base = gen_qary_bits(d, d // 2, 25)
    lll_reduction(base)
    strategies = load_strategies_json("default.json")
    # progressive warm-up to ~(beta-20) quality: the profile the FIRST
    # block-beta windows of a progressive schedule actually see (warming
    # all the way to beta-10 turns every window into a trivial
    # maintenance window and preprocessing can never pay off)
    for blk in range(30, beta - 15, 10):
        bkz_reduction(base, BKZParam(blk, strategies,
                                     flags=BKZ_MAX_LOOPS | BKZ_GH_BND,
                                     max_loops=1))

    rows = {}
    for chain in candidate_chains(beta):
        strategies[beta].preprocessing_block_sizes = list(chain)
        param = BKZParam(beta, strategies, flags=BKZ_GH_BND)
        # calibration budget: at block >= 80 the default 0.5 success
        # budget runs ~20-70 trials per window (p ~ 0.01-0.03); chain
        # RANKING only needs a few trials, so the calibration success
        # target is lowered — relative chain cost is what's measured
        param.min_success_probability = min_succ
        wall = 0.0
        nodes = 0
        n = 0
        t_all = time.time()
        for rep in range(reps):
            b = base.copy()
            m_gso = MatGSO(b, flags=GSO_ROW_EXPO)
            lll_obj = LLLReduction(m_gso, LLL_DEF_DELTA, LLL_DEF_ETA,
                                   LLL_DEFAULT)
            bkz_obj = BKZReduction(m_gso, lll_obj, param)
            RandGen.init_with_seed(7 * beta + rep)
            t0 = time.time()
            bkz_obj.svp_reduction(rep, beta, param)
            wall += time.time() - t0
            nodes += bkz_obj.nodes
            n += 1
            if time.time() - t_all > budget_s:
                break
        rows[",".join(map(str, chain)) or "-"] = {
            "wall_s": round(wall / max(n, 1), 4),
            "nodes": int(nodes / max(n, 1)),
            "reps": n,
        }
        print(f"  beta={beta} chain={chain or '[]'}: "
              f"{rows[','.join(map(str, chain)) or '-']}", flush=True)

    # measured preprocessing node cost: one pass of the best chain's
    # tours over the block (the pruner's repeated-cost unit)
    best_chain = min(rows, key=lambda k: rows[k]["wall_s"])
    chain = [int(x) for x in best_chain.split(",")] if best_chain != "-" \
        else []
    pre_nodes = 0
    if chain:
        strategies[beta].preprocessing_block_sizes = list(chain)
        param = BKZParam(beta, strategies, flags=BKZ_GH_BND)
        b = base.copy()
        m_gso = MatGSO(b, flags=GSO_ROW_EXPO)
        lll_obj = LLLReduction(m_gso, LLL_DEF_DELTA, LLL_DEF_ETA,
                               LLL_DEFAULT)
        bkz_obj = BKZReduction(m_gso, lll_obj, param)
        bkz_obj.svp_preprocessing(0, beta, param)
        pre_nodes = int(bkz_obj.nodes)
    return {"chains": rows, "best_chain": chain,
            "preproc_nodes": max(pre_nodes, 1)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", default="40,50,60,70,80,90")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--budget-s", type=float, default=240.0)
    ap.add_argument("--min-succ", type=float, default=0.5)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "preproc_calibration.json"))
    args = ap.parse_args()
    out = {}
    if os.path.exists(args.out):     # incremental: resume/merge
        with open(args.out) as f:
            out = json.load(f)
    for beta in (int(x) for x in args.blocks.split(",")):
        print(f"calibrating beta={beta}", flush=True)
        out[str(beta)] = measure_block(beta, args.reps, args.budget_s,
                                       args.min_succ)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)   # write after every block
    print("wrote", args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
