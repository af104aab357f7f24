"""A/B a strategy fragment's pruning sets against the shipped ones.

Measures svp_reduction wall/nodes on the first window of a warmed
block-beta profile (same harness as tools/calibrate_preproc.py) with
the CURRENT default.json pruning versus a fragment's pruning for the
same block, same chains, same seeds — the validation gate for the
simulated-shape strategies (tools/gen_strategies.py block_shape).

Usage:
  python tools/ab_pruning.py --beta 80 --frag /tmp/frag_sim_71_91.json \
      [--reps 2] [--min-succ 0.3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def measure(beta: int, strategies, reps: int, min_succ: float,
            budget_s: float = 400.0):
    from fplll_tpu.algs.bkz import BKZReduction
    from fplll_tpu.algs.bkz_param import BKZParam
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
    for blk in range(30, beta - 15, 10):
        bkz_reduction(base, BKZParam(blk, strategies,
                                     flags=BKZ_MAX_LOOPS | BKZ_GH_BND,
                                     max_loops=1))
    param = BKZParam(beta, strategies, flags=BKZ_GH_BND)
    param.min_success_probability = min_succ
    wall = nodes = n = 0
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
    return wall / max(n, 1), nodes / max(n, 1), n


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--beta", type=int, required=True)
    ap.add_argument("--frag", required=True)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--min-succ", type=float, default=0.3)
    args = ap.parse_args()

    from fplll_tpu.algs.bkz_param import (PruningParams, Strategy,
                                          load_strategies_json,
                                          strategy_full_path)

    with open(args.frag) as f:
        frag = {e["block_size"]: e for e in json.load(f)}
    if args.beta not in frag:
        print(f"fragment has no block {args.beta}")
        return 1

    base_strats = load_strategies_json(strategy_full_path("default.json"))
    w_old, n_old, r_old = measure(args.beta, base_strats, args.reps,
                                  args.min_succ)
    print(f"OLD pruning: wall {w_old:.3f} s, nodes {n_old:.3e} "
          f"({r_old} reps)", flush=True)

    new_strats = load_strategies_json(strategy_full_path("default.json"))
    e = frag[args.beta]
    st = new_strats[args.beta]
    st.pruning_parameters = [
        PruningParams(gh_factor=s[0], coefficients=list(s[1]),
                      expectation=s[2])
        for s in e["pruning_parameters"]]
    w_new, n_new, r_new = measure(args.beta, new_strats, args.reps,
                                  args.min_succ)
    print(f"NEW pruning: wall {w_new:.3f} s, nodes {n_new:.3e} "
          f"({r_new} reps)")
    print(f"ratio wall {w_new / max(w_old, 1e-9):.3f}, "
          f"nodes {n_new / max(n_old, 1):.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
