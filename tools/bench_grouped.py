import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import math, time, os, sys
import numpy as np
from fplll_tpu.jaxsetup import jax, jnp
import fplll_tpu as fl
from fplll_tpu.algs.bkz import bkz_reduction, BKZReduction
from fplll_tpu.algs.bkz_param import BKZParam, load_strategies_json
from fplll_tpu.algs.wrapper import lll_reduction
from fplll_tpu.core.gso import MatGSO
from fplll_tpu.defs import BKZ_GH_BND, BKZ_MAX_LOOPS, GSO_ROW_EXPO
from fplll_tpu.nr.rng import RandGen
from fplll_tpu.ops.gen import gen_qary_bits
from fplll_tpu.enum.tpu import _grouped_device_windows, gh_tree_estimate
from fplll_tpu.native import native_enumerate
import random

bs = int(sys.argv[1]) if len(sys.argv) > 1 else 64
G = int(sys.argv[2]) if len(sys.argv) > 2 else 8

RandGen.init_with_seed(11)
b = gen_qary_bits(80, 40, 30)
lll_reduction(b)
strategies = load_strategies_json('default.json')
bkz_reduction(b, BKZParam(40, strategies, flags=BKZ_MAX_LOOPS | BKZ_GH_BND, max_loops=1))
prune = np.asarray(strategies[bs].pruning_parameters[0].coefficients)

# G rerandomized variants of the SAME block [0, bs)
rng = random.Random(5)
muts, rdiags, maxds = [], [], []
for g in range(G):
    bb = b.copy()
    if g:
        for _ in range(3 * bs):
            i = rng.randrange(1, bs); j = rng.randrange(1, bs)
            if i != j:
                bb.a[i] = bb.a[i] + (1 if rng.random() < .5 else -1) * bb.a[j]
        lll_reduction(bb)   # light cleanup like preprocessing
    m0 = MatGSO(bb, flags=GSO_ROW_EXPO); m0.update_gso()
    mut, rdiag, _ = m0.export_mu_r(0, bs)
    logrd = float(np.mean(np.log(rdiag)))
    tgh = math.exp(math.lgamma(bs/2+1.0) * 2 / bs) / math.pi
    maxdist = min(0.99 * rdiag[0], tgh * 1.1 * math.exp(logrd))
    muts.append(np.asarray(mut)); rdiags.append(np.asarray(rdiag)); maxds.append(maxdist)
muts = np.stack(muts); rdiags = np.stack(rdiags); maxds = np.asarray(maxds)
est = sum(gh_tree_estimate(rdiags[g], prune, maxds[g]) for g in range(G))
print(f'bs={bs} G={G} union est={est:.3g}')

out = _grouped_device_windows(muts, rdiags, prunes=np.stack([prune]*G), maxdists=maxds)
t_best = 1e9
for _ in range(3):
    t0 = time.time()
    out = _grouped_device_windows(muts, rdiags, np.stack([prune]*G), maxds)
    dt = time.time() - t0
    t_best = min(t_best, dt)
dists, sols, nodes = out
print(f'grouped: {t_best:.3f}s nodes={nodes:.4g} rate={nodes/t_best:.3g} best={np.nanmin(np.where(np.isfinite(dists), dists, np.nan)):.5g}')
# C anchor on trial 0 only
t0 = time.time()
ref = native_enumerate(muts[0], rdiags[0], prune, None, maxds[0], True, False, False)
dt0 = time.time() - t0
print(f'C trial0: {dt0:.3f}s nodes={ref[4].sum():.4g} best={ref[1]:.5g}')
