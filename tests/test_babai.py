"""Babai nearest-plane tests (mirrors /root/reference/tests/test_babai.cpp:
integer-relation bases including expected-failure cases where the float
approximation cannot recover the exact coefficients)."""

import pytest

import fplll_tpu as fl
from fplll_tpu.algs.wrapper import lll_reduction
from fplll_tpu.nr.rng import RandGen
from fplll_tpu.ops import gen


def run_babai_roundtrip(b, coeffs):
    """Encode sum coeffs_i b_i, ask babai for the coefficients back."""
    m = fl.MatGSO(b, flags=0)
    m.update_gso()
    w = [sum(c * int(b.a[i, j]) for i, c in enumerate(coeffs))
         for j in range(b.ncols)]
    v = m.from_canonical([float(x) for x in w])
    return m.babai(v, from_floats=True)


def test_babai_recovers_small_coeffs():
    RandGen.init_with_seed(17)
    b = gen.gen_uniform(8, 10)
    lll_reduction(b)
    coeffs = [1, -2, 0, 3, 0, 0, -1, 2]
    assert run_babai_roundtrip(b, coeffs) == coeffs


def test_babai_intrel_reduced():
    """On an LLL-reduced knapsack basis, babai recovers lattice points
    (test_babai.cpp:24 analogue)."""
    RandGen.init_with_seed(18)
    b = gen.gen_intrel(10, 20)
    lll_reduction(b)
    coeffs = [0, 1, 0, -1, 2, 0, 0, 1, 0, -2]
    assert run_babai_roundtrip(b, coeffs) == coeffs


def test_babai_expected_failure_unreduced():
    """On a badly conditioned (unreduced) knapsack basis a target far
    from the fundamental domain need not round-trip — the reference
    ships such expected-failure cases."""
    RandGen.init_with_seed(19)
    b = gen.gen_intrel(12, 60)  # NOT reduced: mu are huge
    coeffs = [3, -7, 5, 1, -4, 2, 8, -1, 0, 6, -3, 2]
    got = run_babai_roundtrip(b, coeffs)
    # the call must complete and return integers, success not guaranteed
    assert len(got) == 12
    assert all(isinstance(c, int) for c in got)


def test_gso_babai_vs_cvp_driver():
    """gso.babai approximates CVP; on a well-reduced basis, the babai
    point matches the exact CVP answer for close targets."""
    from fplll_tpu.algs.svpcvp import closest_vector

    RandGen.init_with_seed(20)
    b = gen.gen_uniform(8, 8)
    lll_reduction(b)
    target = [int(b.a[2, j]) + (1 if j == 0 else 0) for j in range(b.ncols)]
    st, sol = closest_vector(b, target)
    assert st == fl.RED_SUCCESS
    v = [sum(c * int(b.a[i, j]) for i, c in enumerate(sol))
         for j in range(b.ncols)]
    dist = sum((a - t) ** 2 for a, t in zip(v, target))
    assert dist <= 1  # the lattice point itself is at distance 1
