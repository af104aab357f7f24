"""Regenerate fplll_tpu/strategies/default.json with our own pruner.

The reference ships precomputed BKZ-2.0 reduction strategies tuned up to
block size 90 with several pruning-coefficient sets per block
(/root/reference/NEWS:9-10; the file itself is stripped from the mirror,
/root/reference/.MISSING_LARGE_BLOBS).  This tool reproduces that
artifact with the in-tree GNR pruner (fplll_tpu/pruner): for every block
size it optimizes pruning coefficients over a simulated-GSA block shape
at several radius factors, warm-starting each factor from the previous
one, and records [gh_factor, coefficients, expectation] triples in the
byte-compatible strategies JSON format (bkz_param.cpp:80-157).

Target success probabilities follow the extreme-pruning regime: ~0.5 per
trial up to block 60 (one or two rerandomized trials), decaying to ~0.05
by block 90 (many cheap trials — the BKZ driver loops until its
min_success_probability budget is met, bkz.cpp:300-344).

Usage:
  python tools/gen_strategies.py --blocks 61:91 --out /tmp/frag_61_91.json
  python tools/gen_strategies.py --merge /tmp/frag_*.json   # writes default.json
"""

from __future__ import annotations

import argparse
import glob
import json
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

GH_FACTORS = (1.0, 1.05, 1.1, 1.15)
MIN_PRUNED_BLOCK = 26     # below this, unpruned enumeration is cheap enough


def delta_beta(b: int) -> float:
    """Root-Hermite factor of BKZ-beta (Chen's asymptotic formula)."""
    return ((b / (2 * math.pi * math.e)) *
            (math.pi * b) ** (1.0 / b)) ** (1.0 / (2 * (b - 1)))


def gsa_shape(beta: int):
    """Simulated GSO block of a BKZ-beta-reduced basis: geometric decay
    with the GSA slope for this block size (norm scale cancels out)."""
    ld = math.log(delta_beta(max(beta, 40)))
    return [math.exp(-4.0 * ld * i) for i in range(beta)]


SIMULATED_SHAPE_MIN_BLOCK = 71


def block_shape(beta: int):
    """GSO shape the pruner optimizes over.  Blocks above ~70 use the
    Chen-Nguyen BKZ-simulator profile of a basis preprocessed at this
    block's strongest preprocessing stage (the GSA slope is a poor model
    there: real profiles bulge at the head and the strategizer that
    produced the reference's shipped strategies worked from measured
    profiles, /root/reference/NEWS:9-10); smaller blocks keep the GSA
    shape, which the round-4 calibration validated against measured
    node counts."""
    if beta >= SIMULATED_SHAPE_MIN_BLOCK:
        chain = preproc_sizes(beta)
        pre = max(chain) if chain else 0
        if pre >= 40:
            from fplll_tpu.algs.simulator import simulated_block_shape
            return simulated_block_shape(beta, pre)
    return gsa_shape(beta)


def gh_of(r):
    n = len(r)
    logvol = sum(math.log(x) for x in r)
    lb = (n / 2.0) * math.log(math.pi) - math.lgamma(n / 2.0 + 1.0)
    return math.exp(logvol / n - 2.0 * lb / n)


def target_prob(beta: int) -> float:
    """Overall success budget per window: the BKZ driver retries
    (rerandomize -> preprocess -> enumerate) until the leftover failure
    probability drops under 1 - min_success_probability = 0.5
    (bkz.cpp:300-344), so the strategy optimizes the REPEATED cost for
    an overall 0.5 — the optimizer chooses the per-trial probability
    itself, balancing tree cost against preproc_cost(beta) retrial
    overhead (cheap low-probability trials win at high blocks; the
    round-3 calibration measured p = 0.5 at block 60 as ~23x more
    expensive per window than p = 0.3)."""
    return 0.5


_CALIBRATION = None


def _calibration():
    """Measured chains + preprocessing node costs from
    tools/calibrate_preproc.py (round-4 replacement for the [beta-20]
    rule and the 100*beta^2 guess); interpolated between measured
    blocks, absent file falls back to the old rules."""
    global _CALIBRATION
    if _CALIBRATION is None:
        path = os.path.join(os.path.dirname(__file__),
                            "preproc_calibration.json")
        try:
            with open(path) as f:
                _CALIBRATION = {int(k): v for k, v in json.load(f).items()}
        except OSError:
            _CALIBRATION = {}
    return _CALIBRATION


def _nearest_measured(beta: int):
    cal = _calibration()
    if not cal:
        return None
    key = min(cal, key=lambda b: abs(b - beta))
    return key, cal[key]


def preproc_cost(beta: int) -> float:
    """Node-cost of one preprocessing pass over a block. Measured points
    (tools/calibrate_preproc.py on the bench profiles): ~2.0e4 nodes at
    block 40, ~4.3e5 at block 60; log-linear fit between/beyond (the
    growth rate ~10^0.066 per block matches the repeated-cost curve the
    strategizer observes). Replaces the round-1 100*beta^2 guess, which
    undercounted block-60+ preprocessing by ~10x."""
    near = _nearest_measured(beta)
    if near and near[1].get("preproc_nodes", 1) > 1:
        key, row = near
        return max(row["preproc_nodes"] *
                   10.0 ** (0.0665 * (beta - key)), 1.0)
    return 10.0 ** (4.3 + 0.0665 * (beta - 40))


def preproc_sizes(beta: int):
    """Measured chain rule (tools/calibrate_preproc.py, two calibration
    runs): single-stage chains beat two-stage ladders at every measured
    block, and the best gap widens with the block — [26] at block 50
    (0.41 s vs 2.27 s for [30]), [36] at 60 (10.9 s vs 15.0 s for [40]),
    [46] at 70 (80 s vs 382 s for [50]); block 40 prefers [20]. Rule:
    one stage, gap 24 from block 45 up, gap 20 below (replaces the
    round-1 [beta-20] rule everywhere)."""
    near = _nearest_measured(beta)
    if near is not None:
        key, row = near
        chain = [c + (beta - key) for c in row.get("best_chain", [])]
        chain = [c for c in chain if 10 <= c < beta]
        # the noisy beta=50 run measured the empty chain fastest on its
        # two maintenance windows; the first-tour measurement of the
        # other run (10.6 s vs 0.03 s) says otherwise — never emit an
        # empty chain for pruned blocks
        if chain or beta < 45:
            return chain
    gap = 24 if beta >= 45 else 20
    return [beta - gap] if beta - gap >= 10 else []


def gen_block(beta: int):
    from fplll_tpu.pruner.pruner import prune
    from fplll_tpu.defs import (PRUNER_GRADIENT, PRUNER_NELDER_MEAD,
                                PRUNER_METRIC_PROBABILITY_OF_SHORTEST,
                                PRUNER_START_FROM_INPUT)
    from fplll_tpu.algs.bkz_param import PruningParams

    r = block_shape(beta)
    gh = gh_of(r)
    sets = []
    warm = PruningParams()
    for gf in GH_FACTORS:
        flags = PRUNER_GRADIENT | PRUNER_NELDER_MEAD
        if warm.coefficients:
            flags |= PRUNER_START_FROM_INPUT
        warm = prune(gf * gh, preproc_cost(beta), r, target_prob(beta),
                     PRUNER_METRIC_PROBABILITY_OF_SHORTEST, flags,
                     pruning=warm)
        sets.append([round(warm.gh_factor, 6),
                     [round(float(c), 6) for c in warm.coefficients],
                     round(float(warm.expectation), 6)])
    return {"block_size": beta,
            "preprocessing_block_sizes": preproc_sizes(beta),
            "pruning_parameters": sets}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", help="a:b python-range of block sizes")
    ap.add_argument("--out", help="fragment output path")
    ap.add_argument("--merge", nargs="*", help="fragment globs to merge")
    args = ap.parse_args()
    if args.blocks is None and args.merge is None:
        ap.error("one of --blocks or --merge is required")
    if args.blocks is not None and args.out is None and args.merge is None:
        ap.error("--blocks requires --out")

    here = os.path.dirname(os.path.abspath(__file__))
    default_path = os.path.join(here, "..", "fplll_tpu", "strategies",
                                "default.json")

    if args.merge is not None:
        with open(default_path) as f:
            current = {e["block_size"]: e for e in json.load(f)}
        for pat in args.merge:
            for frag in sorted(glob.glob(pat)):
                with open(frag) as f:
                    for e in json.load(f):
                        current[e["block_size"]] = e
        top = max(current)
        merged = []
        for bs in range(1, top + 1):
            merged.append(current.get(
                bs, {"block_size": bs, "preprocessing_block_sizes": [],
                     "pruning_parameters": []}))
        with open(default_path, "w") as f:
            json.dump(merged, f)
        print(f"wrote {default_path}: blocks 1..{top}, "
              f"{sum(1 for e in merged if e['pruning_parameters'])} pruned")
        return 0

    lo, hi = (int(x) for x in args.blocks.split(":"))
    out = []
    for beta in range(lo, hi):
        if beta < MIN_PRUNED_BLOCK:
            continue
        e = gen_block(beta)
        out.append(e)
        print(f"block {beta}: {len(e['pruning_parameters'])} sets, "
              f"p={[s[2] for s in e['pruning_parameters']]}", flush=True)
    with open(args.out, "w") as f:
        json.dump(out, f)
    return 0


if __name__ == "__main__":
    main()
