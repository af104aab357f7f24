"""SVP/CVP tests (mirrors /root/reference/tests/test_svp.cpp and
test_cvp.cpp: golden-solution norms and coordinates, dual SVP)."""

import pytest

import fplll_tpu as fl
from fplll_tpu.algs.svpcvp import (closest_vector, shortest_vector,
                                   shortest_vector_ex)
from fplll_tpu.algs.wrapper import lll_reduction
from fplll_tpu.defs import CVPM_PROVED, RED_SUCCESS, SVP_DUAL, SVPM_FAST
from fplll_tpu.ops.intmat import parse_vector, read_matrix


def apply_coords(b, sol):
    return [sum(int(round(c)) * int(b.a[i, j]) for i, c in enumerate(sol))
            for j in range(b.ncols)]


def norm_sq(v):
    return sum(x * x for x in v)


def test_svp_example(lattice_dir):
    b = read_matrix(f"{lattice_dir}/example_svp_in")
    want = parse_vector(open(f"{lattice_dir}/example_svp_out").read())
    lll_reduction(b)
    status, sol = shortest_vector(b)
    assert status == RED_SUCCESS
    assert norm_sq(apply_coords(b, sol)) == norm_sq(want)


def test_svp_cpu_backend_matches(lattice_dir):
    b = read_matrix(f"{lattice_dir}/example_svp_in")
    want = parse_vector(open(f"{lattice_dir}/example_svp_out").read())
    lll_reduction(b)
    status, sol = shortest_vector(b, backend="cpu")
    assert status == RED_SUCCESS
    assert norm_sq(apply_coords(b, sol)) == norm_sq(want)


def dual_length_sq(b, coords):
    """Squared norm of a dual vector given by coefficients in the dual
    basis: sum_i alpha_i^2 / r_ii with alpha = (I+mu_strict)^-1 coords
    (reference: tests/test_svp.cpp:105-149 dual_length)."""
    from fplll_tpu.core.gso import MatGSO
    from fplll_tpu.defs import GSO_INT_GRAM

    d = b.nrows
    assert len(coords) == d
    gso = MatGSO(b.copy(), flags=GSO_INT_GRAM)
    assert gso.update_gso()
    alpha = [0.0] * d
    norm = 0.0
    for i in range(d):
        a = float(coords[i])
        for j in range(i):
            a -= float(gso.get_mu(i, j)) * alpha[j]
        alpha[i] = a
        norm += a * a / float(gso.get_r(i, i))
    return norm


def test_dual_svp(lattice_dir):
    """Dual SVP: the returned dual vector must be at least as short as
    the golden shortest dual vector (test_svp.cpp:159-204)."""
    b = read_matrix(f"{lattice_dir}/example_dsvp_in")
    want = parse_vector(open(f"{lattice_dir}/example_dsvp_out").read())
    norm_want = dual_length_sq(b, want)
    lll_reduction(b)
    status, sol, ev, _ = shortest_vector_ex(b, SVPM_FAST, flags=SVP_DUAL,
                                            backend="cpu")
    assert status == RED_SUCCESS
    norm_sol = dual_length_sq(b, sol)
    assert norm_sol <= norm_want * (1.0 + 1e-9)


@pytest.mark.parametrize("suffix,method", [
    ("4", CVPM_PROVED),
    ("5", CVPM_PROVED),
])
def test_cvp_small(lattice_dir, suffix, method):
    b = read_matrix(f"{lattice_dir}/example_cvp_in_lattice{suffix}")
    t = parse_vector(open(f"{lattice_dir}/example_cvp_in_target{suffix}").read())
    want = parse_vector(open(f"{lattice_dir}/example_cvp_out{suffix}").read())
    status, sol = closest_vector(b, t, method=method)
    assert status == RED_SUCCESS
    got = apply_coords(b, sol)
    # compare distances: any vector at the same distance is acceptable
    dg = sum((a - c) ** 2 for a, c in zip(got, t))
    dw = sum((a - c) ** 2 for a, c in zip(want, t))
    assert dg == dw


@pytest.mark.parametrize("suffix", ["2"])
def test_cvp_exact_hit(lattice_dir, suffix):
    """Targets that lie in the lattice must give distance 0."""
    b = read_matrix(f"{lattice_dir}/example_cvp_in_lattice{suffix}")
    t = parse_vector(open(f"{lattice_dir}/example_cvp_in_target{suffix}").read())
    want = parse_vector(open(f"{lattice_dir}/example_cvp_out{suffix}").read())
    dw = sum((a - c) ** 2 for a, c in zip(want, t))
    status, sol = closest_vector(b, t)
    assert status == RED_SUCCESS
    got = apply_coords(b, sol)
    assert sum((a - c) ** 2 for a, c in zip(got, t)) == dw


@pytest.mark.slow
@pytest.mark.parametrize("suffix", [""])
def test_cvp_large(lattice_dir, suffix):
    b = read_matrix(f"{lattice_dir}/example_cvp_in_lattice{suffix}")
    t = parse_vector(open(f"{lattice_dir}/example_cvp_in_target{suffix}").read())
    want = parse_vector(open(f"{lattice_dir}/example_cvp_out{suffix}").read())
    status, sol = closest_vector(b, t)
    assert status == RED_SUCCESS
    got = apply_coords(b, sol)
    dg = sum((a - c) ** 2 for a, c in zip(got, t))
    dw = sum((a - c) ** 2 for a, c in zip(want, t))
    assert dg == dw


def test_svp_on_gram_object():
    """SVP over a MatGSOGram matches SVP over the basis
    (test_svp_gram.cpp analogue)."""
    from fplll_tpu.core.gso import MatGSO, MatGSOGram
    from fplll_tpu.defs import GSO_INT_GRAM
    from fplll_tpu.nr.fctx import MPCtx
    from fplll_tpu.nr.rng import RandGen
    from fplll_tpu.ops import gen
    import fplll_tpu as fl

    RandGen.init_with_seed(31)
    basis = gen.gen_uniform(12, 10)
    lll_reduction(basis)
    st, sol = shortest_vector(basis.copy())
    assert st == RED_SUCCESS
    want = norm_sq(apply_coords(basis, sol))

    G = fl.IntMat.from_rows(
        [[basis.dot_rows(i, j) for j in range(12)] for i in range(12)])
    gso = MatGSOGram(G, flags=GSO_INT_GRAM, ctx=MPCtx(80))
    st2, sol2, ev, _ = shortest_vector_ex(gso)
    assert st2 == RED_SUCCESS
    got = norm_sq(apply_coords(basis, sol2))
    assert got == want


def test_bkz_on_gram_object():
    """BKZ over a Gram matrix matches BKZ over the basis on r_ii
    (test_bkz_gram.cpp analogue)."""
    from fplll_tpu.algs.bkz import BKZReduction
    from fplll_tpu.algs.bkz_param import BKZParam
    from fplll_tpu.algs.lll import LLLReduction
    from fplll_tpu.core.gso import MatGSO, MatGSOGram
    from fplll_tpu.defs import BKZ_AUTO_ABORT, GSO_INT_GRAM
    from fplll_tpu.nr.rng import RandGen
    from fplll_tpu.ops import gen
    import fplll_tpu as fl

    RandGen.init_with_seed(32)
    basis = gen.gen_uniform(10, 10)
    G = fl.IntMat.from_rows(
        [[basis.dot_rows(i, j) for j in range(10)] for i in range(10)])

    mg = MatGSOGram(G, flags=GSO_INT_GRAM)
    lg = LLLReduction(mg, 0.99, 0.51)
    bg = BKZReduction(mg, lg, BKZParam(4, None, flags=BKZ_AUTO_ABORT))
    assert bg.bkz()

    mb = MatGSO(basis, flags=GSO_INT_GRAM)
    lb = LLLReduction(mb, 0.99, 0.51)
    bb = BKZReduction(mb, lb, BKZParam(4, None, flags=BKZ_AUTO_ABORT))
    assert bb.bkz()

    mg.update_gso()
    mb.update_gso()
    for i in range(10):
        a = float(mg.get_r(i, i))
        c = float(mb.get_r(i, i))
        assert abs(a - c) <= 1e-6 * max(1.0, abs(c))


def test_proved_cvp_device_reset_matches_host(monkeypatch):
    """CVP reset machinery on device (enumerate.cpp:23-56): when the
    proved-CVP walk descends below the max-GS level and the lower block
    is device-sized, the reset sub-enumeration runs through the batched
    kernel. Result must match the host-only oracle exactly."""
    import fplll_tpu.enum.cpu as cpumod
    import fplll_tpu.enum.tpu as tpumod
    from fplll_tpu.nr.rng import RandGen
    from fplll_tpu.ops import gen

    hits = {"dev": 0}
    orig = cpumod.EnumerationDyn._reset_on_device

    def spy(self, cur_dist, new_dim):
        r = orig(self, cur_dist, new_dim)
        hits["dev"] += bool(r)
        return r

    monkeypatch.setattr(cpumod.EnumerationDyn, "_reset_on_device", spy)

    def solve():
        RandGen.init_with_seed(21)
        b = gen.gen_uniform(38, 10)
        lll_reduction(b)
        return closest_vector(b, [3] * 38, method=CVPM_PROVED)

    monkeypatch.setattr(tpumod, "_MIN_TPU_DIM", 34)
    st_dev, sol_dev = solve()
    assert hits["dev"] >= 1          # the kernel actually handled a reset
    monkeypatch.setattr(tpumod, "_MIN_TPU_DIM", 10_000)
    st_host, sol_host = solve()
    assert st_dev == st_host == 0
    assert sol_dev == sol_host
