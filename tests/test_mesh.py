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
