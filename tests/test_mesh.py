"""Multi-device sharded enumeration tests (8-device virtual mesh from
conftest; the multi-host-emulation strategy of SURVEY §4)."""

import math

import numpy as np
import pytest

from fplll_tpu.algs.wrapper import lll_reduction
from fplll_tpu.core.gso import MatGSO
from fplll_tpu.defs import GSO_INT_GRAM
from fplll_tpu.enum.cpu import EnumerationDyn
from fplll_tpu.enum.evaluator import FastEvaluator
from fplll_tpu.nr.fctx import MPCtx
from fplll_tpu.nr.rng import RandGen
from fplll_tpu.ops import gen
from fplll_tpu.parallel.mesh import ShardedEnumerator, make_enum_mesh


def exact_norm(b, coords):
    v = [sum(int(round(c)) * int(b.a[i, j]) for i, c in enumerate(coords))
         for j in range(b.ncols)]
    return sum(x * x for x in v)


@pytest.fixture(scope="module")
def mesh():
    from fplll_tpu.jaxsetup import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    return make_enum_mesh()


@pytest.mark.parametrize("d,seed", [(20, 2), (26, 4)])
def test_sharded_matches_oracle(mesh, d, seed):
    RandGen.init_with_seed(seed)
    b = gen.gen_uniform(d, 12)
    lll_reduction(b)
    gso = MatGSO(b, flags=GSO_INT_GRAM, ctx=MPCtx(70))
    gso.update_gso()
    mut, rdiag, normexp = gso.export_mu_r(0, d)
    A0 = min(float(gso.get_int_gram(i, i)) for i in range(d)) * 1.00001
    A = math.ldexp(A0, -normexp)

    ev_c = FastEvaluator()
    EnumerationDyn(gso, ev_c).enumerate(0, d, A0, 0)
    cnorm = exact_norm(b, ev_c.begin()[1])

    ev = FastEvaluator()
    ev.set_normexp(normexp)
    se = ShardedEnumerator(mesh, batch_per_device=64)
    se.enumerate(mut, rdiag, None, np.zeros(d), A, True, ev)
    assert not ev.empty()
    assert exact_norm(b, ev.begin()[1]) == cnorm
    assert se.nodes.sum() > 0


def test_facade_routes_through_mesh(mesh, monkeypatch):
    """With >1 device visible the enumeration facade must pick the
    sharded multi-chip driver automatically (the analogue of enumlib
    auto-registering as the default extenum,
    /root/reference/fplll/enum/enumerate_ext.cpp:34-38)."""
    from fplll_tpu.enum import tpu as enum_tpu
    from fplll_tpu.enum.api import Enumeration

    monkeypatch.setattr(enum_tpu, "_MIN_TPU_DIM", 12)
    # disable the budgeted native-first hybrid: this test checks the
    # mesh routing itself, which only engages on trees too big for it
    monkeypatch.setenv("FPLLL_TPU_HYBRID_NODES", "0")
    d, seed = 20, 2
    RandGen.init_with_seed(seed)
    b = gen.gen_uniform(d, 12)
    lll_reduction(b)
    gso = MatGSO(b, flags=GSO_INT_GRAM, ctx=MPCtx(70))
    gso.update_gso()
    A0 = min(float(gso.get_int_gram(i, i)) for i in range(d)) * 1.00001

    ev_c = FastEvaluator()
    EnumerationDyn(gso, ev_c).enumerate(0, d, A0, 0)
    cnorm = exact_norm(b, ev_c.begin()[1])

    before = ShardedEnumerator.launches
    ev = FastEvaluator()
    facade = Enumeration(gso, ev)
    facade.enumerate(0, d, A0, 0)
    assert ShardedEnumerator.launches > before
    assert not ev.empty()
    assert exact_norm(b, ev.begin()[1]) == cnorm
    assert facade.get_nodes() > 0


def test_sharded_f32_matches_f64(mesh):
    """f32 sharded tree with bound slack must find the same shortest
    vector as the f64 tree (candidates are re-verified exactly)."""
    from fplll_tpu.jaxsetup import jnp

    d, seed = 22, 9
    RandGen.init_with_seed(seed)
    b = gen.gen_uniform(d, 10)
    lll_reduction(b)
    gso = MatGSO(b, flags=GSO_INT_GRAM, ctx=MPCtx(70))
    gso.update_gso()
    mut, rdiag, normexp = gso.export_mu_r(0, d)
    A0 = min(float(gso.get_int_gram(i, i)) for i in range(d)) * 1.00001
    A = math.ldexp(A0, -normexp)

    sols = {}
    for dt in (jnp.float64, jnp.float32):
        ev = FastEvaluator()
        ev.set_normexp(normexp)
        se = ShardedEnumerator(mesh, batch_per_device=64, dtype=dt)
        se.enumerate(mut, rdiag, None, np.zeros(d), A, True, ev)
        assert not ev.empty()
        sols[str(jnp.dtype(dt))] = exact_norm(b, ev.begin()[1])
    assert sols["float32"] == sols["float64"]


def test_sharded_count_mode(mesh, lattice_dir):
    """Leech list-CVP count through the mesh path."""
    from fplll_tpu.ops.intmat import read_matrix

    b = read_matrix(f"{lattice_dir}/example_list_cvp_in_lattice")
    lll_reduction(b)
    gso = MatGSO(b, flags=GSO_INT_GRAM, ctx=MPCtx(70))
    gso.update_gso()
    mut, rdiag, normexp = gso.export_mu_r(0, 24)
    rad = math.ldexp(32.5, -normexp)
    ev = FastEvaluator(nr_solutions=999999)
    se = ShardedEnumerator(mesh, batch_per_device=128)
    se.enumerate(mut, rdiag, None, np.zeros(24), rad, False, ev,
                 count_mode=True)
    assert ev.sol_count == 196561


@pytest.mark.parametrize("d,seed", [(22, 5)])
def test_sharded_dd32_matches_oracle(mesh, d, seed):
    """Certified-precision (dd32 f32-pair) trees now run the mesh path
    too (round-2 gap: the sharded driver carried no dd state, so every
    proved SVP/CVP search was single-chip by construction)."""
    RandGen.init_with_seed(seed)
    b = gen.gen_uniform(d, 12)
    lll_reduction(b)
    gso = MatGSO(b, flags=GSO_INT_GRAM, ctx=MPCtx(70))
    gso.update_gso()
    mut, rdiag, normexp = gso.export_mu_r(0, d)
    A0 = min(float(gso.get_int_gram(i, i)) for i in range(d)) * 1.00001
    A = math.ldexp(A0, -normexp)

    ev_c = FastEvaluator()
    EnumerationDyn(gso, ev_c).enumerate(0, d, A0, 0)
    cnorm = exact_norm(b, ev_c.begin()[1])

    ev = FastEvaluator()
    ev.set_normexp(normexp)
    se = ShardedEnumerator(mesh, batch_per_device=64, dtype="dd32")
    se.enumerate(mut, rdiag, None, np.zeros(d), A, True, ev)
    assert not ev.empty()
    assert exact_norm(b, ev.begin()[1]) == cnorm
    assert se.nodes.sum() > 0


def test_sharded_dd32_dual_and_subsols(mesh):
    """dd32 mesh searches carry dual trees and subsolution capture
    (round-2 gap: the dd kernel declined both)."""
    d, seed = 18, 6
    RandGen.init_with_seed(seed)
    b = gen.gen_uniform(d, 10)
    lll_reduction(b)
    gso = MatGSO(b, flags=GSO_INT_GRAM, ctx=MPCtx(70))
    gso.update_gso()
    A0 = min(float(gso.get_int_gram(i, i)) for i in range(d)) * 1.00001

    # host oracle dual search for ground truth
    ev_c = FastEvaluator(find_subsolutions=True)
    EnumerationDyn(gso, ev_c).enumerate(0, d, A0, 0, dual=True)
    assert not ev_c.empty()

    from fplll_tpu.enum import tpu as enum_tpu
    mut, rdiag, normexp = gso.export_mu_r(0, d)
    normexp_d = -normexp
    rd = np.asarray(rdiag, dtype=np.float64)
    mu = np.asarray(mut, dtype=np.float64)
    rdiag_d = (1.0 / (rd * 2.0 ** (-2 * normexp_d)))[::-1].copy()
    mut_d = np.triu(-(mu.T)[::-1, ::-1], 1)
    # direct kernel call: use a tight bound (the oracle's found distance);
    # the loose caller bound is handled by the facade's GH deepening
    A = math.ldexp(ev_c.begin()[0], -normexp_d) * 1.000001

    ev = FastEvaluator(find_subsolutions=True)
    ev.set_normexp(normexp_d)
    se = ShardedEnumerator(mesh, batch_per_device=64, dtype="dd32")
    se.enumerate(mut_d, rdiag_d, None, np.zeros(d), A, True, ev, dual=True)
    assert not ev.empty()
    dist_c = ev_c.begin()[0]
    dist_m = ev.begin()[0]
    assert abs(math.ldexp(dist_m, -normexp_d) -
               math.ldexp(dist_c, -ev_c.normExp)) <= \
        1e-6 * abs(math.ldexp(dist_c, -ev_c.normExp))
    assert ev.sub_solutions, "no subsolutions captured on the dd32 mesh"


@pytest.mark.slow
def test_facade_mesh_realistic_dim(mesh, monkeypatch):
    """Facade-path mesh run at a realistic tree size (dim >= 34, no
    _MIN_TPU_DIM monkeypatch): the production gate itself must route a
    device-sized search through the sharded driver (round-2 gap: every
    mesh test ran d <= 26 with the gate patched down)."""
    from fplll_tpu.enum.api import Enumeration

    monkeypatch.setenv("FPLLL_TPU_HYBRID_NODES", "0")
    d, seed = 36, 8
    RandGen.init_with_seed(seed)
    b = gen.gen_uniform(d, 10)
    lll_reduction(b)
    gso = MatGSO(b, flags=GSO_INT_GRAM, ctx=MPCtx(80))
    gso.update_gso()
    A0 = min(float(gso.get_int_gram(i, i)) for i in range(d)) * 1.00001

    before = ShardedEnumerator.launches
    ev = FastEvaluator()
    facade = Enumeration(gso, ev)
    facade.enumerate(0, d, A0, 0)
    assert ShardedEnumerator.launches > before
    assert not ev.empty()
    assert facade.get_nodes() > 0
    # the found vector must be at least as short as the best basis row
    assert ev.begin()[0] <= A0


def test_steal_rebalances_skewed_queue(mesh):
    """Work stealing (the ICI analogue of enumlib's queue stealing,
    enum-parallel/enumeration.h:460-505): on a pruned tree whose subtree
    sizes are heavily skewed, drained shards must claim root ranges from
    loaded ones, and the stolen partition must still enumerate exactly
    the same solution set as the sequential oracle."""
    from fplll_tpu.native import native_enumerate

    RandGen.init_with_seed(9)
    b = gen.gen_qary_bits(30, 15, 10)
    lll_reduction(b)
    gso = MatGSO(b, flags=GSO_INT_GRAM, ctx=MPCtx(70))
    gso.update_gso()
    mut, rdiag, normexp = gso.export_mu_r(0, 30)
    logrd = float(np.mean(np.log(rdiag)))
    log_ball = 15.0 * math.log(math.pi) - math.lgamma(16.0)
    gh2 = math.exp(logrd - 2.0 * log_ball / 30)
    A = 1.3 * gh2

    ev = FastEvaluator()
    # tiny per-shard batches + tight sync so imbalance appears fast
    se = ShardedEnumerator(mesh, batch_per_device=8, steps_per_sweep=64)
    se.enumerate(mut, rdiag, None, np.zeros(30), A, True, ev,
                 count_mode=True)
    ref = native_enumerate(np.asarray(mut), np.asarray(rdiag), None, None,
                           A, True, False, True)
    if ref is not None:
        assert ev.sol_count == ref[3]
    assert se.last_steals >= 1, "no shard ever stole work"


def test_mesh_deep_tree_slices_sharded():
    """Round-5 VERDICT item 7b: trees taller than the kernel height now
    launch their chunked slices over the MESH (the helper's launch hook
    is rebound to _mesh_launch). Counts and best solution must match
    the sequential oracle, and the sliced path must actually engage."""
    import math

    from fplll_tpu.algs.wrapper import lll_reduction
    from fplll_tpu.core.gso import MatGSO
    from fplll_tpu.defs import GSO_INT_GRAM
    from fplll_tpu.enum.evaluator import FastEvaluator
    from fplll_tpu.native import native_enumerate
    from fplll_tpu.nr.fctx import MPCtx
    from fplll_tpu.nr.rng import RandGen
    from fplll_tpu.ops.gen import gen_qary_bits
    from fplll_tpu.parallel.mesh import ShardedEnumerator, make_enum_mesh

    RandGen.init_with_seed(21)
    b = gen_qary_bits(36, 18, 10)
    lll_reduction(b)
    gso = MatGSO(b, flags=GSO_INT_GRAM, ctx=MPCtx(70))
    gso.update_gso()
    mut, rdiag, _ = gso.export_mu_r(0, 36)
    mut = np.asarray(mut)
    rdiag = np.asarray(rdiag)
    logrd = float(np.mean(np.log(rdiag)))
    log_ball = 18.0 * math.log(math.pi) - math.lgamma(19.0)
    gh2 = math.exp(logrd - 2.0 * log_ball / 36)
    A = 1.1 * gh2

    ref = native_enumerate(mut, rdiag, None, None, A, True, False, True)
    assert ref is not None

    se = ShardedEnumerator(make_enum_mesh(), batch_per_device=128,
                           max_device_levels=16)
    ev = FastEvaluator()
    se.enumerate(mut, rdiag, None, np.zeros(36), A, True, ev,
                 count_mode=True)
    assert ev.sol_count == ref[3], "mesh-sharded deep path missed solutions"

    se2 = ShardedEnumerator(make_enum_mesh(), batch_per_device=128,
                            max_device_levels=16)
    ev2 = FastEvaluator(nr_solutions=1)
    se2.enumerate(mut, rdiag, None, np.zeros(36), A, True, ev2)
    assert not ev2.empty()
    assert abs(ev2.begin()[0] - ref[1]) <= 1e-9 * ref[1]


def test_mesh_deep_tree_slices_dd32():
    """The dd32 (certified f32-pair) state also rides the mesh-sharded
    deep-tree slices (pod-readiness item: no silent f64 fallback for
    proved searches above the kernel height)."""
    import math

    from fplll_tpu.algs.wrapper import lll_reduction
    from fplll_tpu.core.gso import MatGSO
    from fplll_tpu.defs import GSO_INT_GRAM
    from fplll_tpu.enum.evaluator import FastEvaluator
    from fplll_tpu.native import native_enumerate
    from fplll_tpu.nr.fctx import MPCtx
    from fplll_tpu.nr.rng import RandGen
    from fplll_tpu.ops.gen import gen_qary_bits
    from fplll_tpu.parallel.mesh import ShardedEnumerator, make_enum_mesh

    RandGen.init_with_seed(21)
    b = gen_qary_bits(36, 18, 10)
    lll_reduction(b)
    gso = MatGSO(b, flags=GSO_INT_GRAM, ctx=MPCtx(70))
    gso.update_gso()
    mut, rdiag, _ = gso.export_mu_r(0, 36)
    mut = np.asarray(mut)
    rdiag = np.asarray(rdiag)
    logrd = float(np.mean(np.log(rdiag)))
    log_ball = 18.0 * math.log(math.pi) - math.lgamma(19.0)
    gh2 = math.exp(logrd - 2.0 * log_ball / 36)
    A = 1.1 * gh2

    ref = native_enumerate(mut, rdiag, None, None, A, True, False, False)
    assert ref is not None

    se = ShardedEnumerator(make_enum_mesh(), batch_per_device=128,
                           max_device_levels=16, dtype="dd32")
    ev = FastEvaluator(nr_solutions=1)
    se.enumerate(mut, rdiag, None, np.zeros(36), A, True, ev)
    assert not ev.empty()
    assert abs(ev.begin()[0] - ref[1]) <= 1e-7 * ref[1]


@pytest.mark.parametrize("dtype", [None, "dd32"])
def test_mesh_grouped_trials_shared_bound(mesh, dtype):
    """G rerandomized bases of ONE lattice, one per mesh device, one
    launch, pmin-shared bound (the pod-scale layout of the single-chip
    grouped launch; reference enum-parallel/enumeration.h:412-505).
    The union over trials must find the lattice's true shortest vector,
    and every reported per-trial solution must be a vector of the SAME
    lattice with its exact norm."""
    from fplll_tpu.parallel.mesh import mesh_enumerate_trials

    d, seed, G = 24, 9, 4
    RandGen.init_with_seed(seed)
    b0 = gen.gen_uniform(d, 12)
    lll_reduction(b0)

    # oracle: true lambda_1^2 from the host DFS on trial 0
    gso0 = MatGSO(b0, flags=GSO_INT_GRAM, ctx=MPCtx(70))
    gso0.update_gso()
    A_abs = min(float(gso0.get_int_gram(i, i)) for i in range(d)) * 1.00001
    ev_c = FastEvaluator()
    EnumerationDyn(gso0, ev_c).enumerate(0, d, A_abs, 0)
    lam2 = exact_norm(b0, ev_c.begin()[1])

    # rerandomized trials: unimodular transforms of b0, re-LLL'd
    bases = [b0]
    for t in range(1, G):
        bt = b0.copy()
        rng = np.random.default_rng(100 + t)
        for _ in range(3 * d):
            i, j = rng.integers(0, d, size=2)
            if i != j:
                bt.row_addmul(int(i), int(j), int(rng.integers(-2, 3)))
        lll_reduction(bt)
        bases.append(bt)

    muts, rdiags, prunes, maxdists, normexps = [], [], [], [], []
    for bt in bases:
        g = MatGSO(bt, flags=GSO_INT_GRAM, ctx=MPCtx(70))
        g.update_gso()
        mut, rdiag, normexp = g.export_mu_r(0, d)
        muts.append(mut)
        rdiags.append(rdiag)
        prunes.append(np.ones(d))
        normexps.append(normexp)
    # one common scale (trial 0's): rescale exported quantities
    ref = normexps[0]
    for t in range(G):
        sc = math.ldexp(1.0, normexps[t] - ref)
        rdiags[t] = [r * sc for r in rdiags[t]]
        maxdists.append(math.ldexp(A_abs, -ref))

    dists, sols, nodes = mesh_enumerate_trials(
        mesh, np.asarray(muts), np.asarray(rdiags), np.asarray(prunes),
        np.asarray(maxdists), batch_per_device=64, sync_steps=256,
        dtype=dtype)

    found = np.isfinite(dists)
    assert found.any(), "no trial found any vector"
    # each reported solution is an exact vector of its own basis == the
    # same lattice; its true norm matches the reported distance
    for t in np.where(found)[0]:
        n_exact = exact_norm(bases[t], sols[t])
        assert n_exact == int(round(math.ldexp(dists[t], ref)))
        assert nodes[t] > 0
    # the union finds the true shortest vector
    best = min(int(round(math.ldexp(dists[t], ref)))
               for t in np.where(found)[0])
    assert best == lam2


def test_grouped_windows_route_via_mesh(mesh, monkeypatch):
    """With no single-chip grid kernel (CPU virtual mesh) and >= 2
    devices visible, device_enumerate_windows must route a G > 1
    grouped launch through mesh_enumerate_trials."""
    from fplll_tpu.enum import tpu as enum_tpu
    from fplll_tpu.parallel import mesh as mesh_mod

    calls = {}
    orig = mesh_mod.mesh_enumerate_trials

    def spy(*a, **k):
        calls["n"] = calls.get("n", 0) + 1
        return orig(*a, **k)

    monkeypatch.setattr(mesh_mod, "mesh_enumerate_trials", spy)

    d, G = 24, 3
    RandGen.init_with_seed(31)
    b = gen.gen_uniform(d, 12)
    lll_reduction(b)
    gso = MatGSO(b, flags=GSO_INT_GRAM, ctx=MPCtx(70))
    gso.update_gso()
    mut, rdiag, normexp = gso.export_mu_r(0, d)
    A = math.ldexp(
        min(float(gso.get_int_gram(i, i)) for i in range(d)) * 1.00001,
        -normexp)
    dists, sols, total_nodes = enum_tpu.device_enumerate_windows(
        np.asarray([mut] * G), np.asarray([rdiag] * G), np.ones((G, d)),
        np.full(G, A))
    assert calls.get("n", 0) == 1, "grouped launch did not route via mesh"
    assert np.isfinite(dists).any()
    assert total_nodes > 0
    g0 = int(np.argmin(np.where(np.isfinite(dists), dists, np.inf)))
    assert exact_norm(b, sols[g0]) == int(round(math.ldexp(dists[g0],
                                                           normexp)))
