"""LLL tests (mirrors /root/reference/tests/test_lll.cpp strategy:
reduce, verify with is_lll_reduced at higher precision, and negative-
control that the input was NOT already reduced)."""

import pytest

import fplll_tpu as fl
from fplll_tpu.algs.wrapper import lll_reduction
from fplll_tpu.defs import (GSO_DEFAULT, GSO_INT_GRAM, GSO_ROW_EXPO,
                            LM_FAST, LM_HEURISTIC, LM_PROVED, LM_WRAPPER,
                            FT_DD, FT_DEFAULT, FT_MPFR, RED_SUCCESS)
from fplll_tpu.nr.fctx import MPCtx
from fplll_tpu.nr.rng import RandGen
from fplll_tpu.ops import gen


def check_reduced(b, delta=0.99, eta=0.51):
    m = fl.MatGSO(b.copy(), flags=GSO_INT_GRAM, ctx=MPCtx(120))
    assert fl.is_lll_reduced(m, delta, eta)


def check_not_reduced(b, delta=0.99, eta=0.51):
    m = fl.MatGSO(b.copy(), flags=GSO_INT_GRAM, ctx=MPCtx(120))
    assert not fl.is_lll_reduced(m, delta, eta)


@pytest.mark.parametrize("method,ft,prec", [
    (LM_WRAPPER, FT_DEFAULT, 0),
    (LM_FAST, FT_DEFAULT, 0),
    (LM_PROVED, FT_DEFAULT, 0),
    (LM_HEURISTIC, FT_DEFAULT, 0),
    (LM_PROVED, FT_MPFR, 100),
    (LM_FAST, FT_DD, 0),
])
def test_int_rel(method, ft, prec):
    """Seeded knapsack bases across methods (test_lll.cpp:140-148)."""
    RandGen.init_with_seed(1337)
    b = gen.gen_intrel(18, 40)
    check_not_reduced(b)
    status = lll_reduction(b, method=method, float_type=ft, precision=prec)
    assert status == RED_SUCCESS
    check_reduced(b)


def test_file_lattice(lattice_dir):
    b = fl.read_matrix(f"{lattice_dir}/example_in")
    check_not_reduced(b)
    assert lll_reduction(b) == RED_SUCCESS
    check_reduced(b)


def test_dim55(lattice_dir):
    b = fl.read_matrix(f"{lattice_dir}/dim55_in")
    assert lll_reduction(b) == RED_SUCCESS
    check_reduced(b)


def test_transform_tracking():
    """u must track the reduction: u * b_in == b_out."""
    RandGen.init_with_seed(5)
    b = gen.gen_uniform(10, 14)
    b_in = b.copy()
    u = fl.IntMat.identity(10)
    status = lll_reduction(b, u=u, method=LM_FAST)
    assert status == RED_SUCCESS
    import numpy as np
    prod = u.a @ b_in.a
    assert (prod == b.a).all()


def test_zero_rows_move_first():
    rows = [[0, 0, 0], [2, 4, 6], [1, 2, 3], [3, 6, 9]]
    b = fl.IntMat.from_rows(rows)
    assert lll_reduction(b) == RED_SUCCESS
    # dependent rows collapse to zero rows, moved to the front
    assert b.row_is_zero(0) and b.row_is_zero(1)
    assert not b.row_is_zero(3)


def test_gram_pipeline_matches_basis():
    """Reducing G = B B^T matches reducing B (test_lll_gram.cpp)."""
    RandGen.init_with_seed(3)
    b = gen.gen_uniform(8, 15)
    G = fl.IntMat.from_rows(
        [[b.dot_rows(i, j) for j in range(8)] for i in range(8)])
    mg = fl.MatGSOGram(G, flags=GSO_INT_GRAM)
    lg = fl.LLLReduction(mg, 0.99, 0.51)
    assert lg.lll()
    m3 = fl.MatGSO(b, flags=GSO_INT_GRAM)
    l3 = fl.LLLReduction(m3, 0.99, 0.51)
    assert l3.lll()
    m3.update_gso()
    mg.update_gso()
    for i in range(8):
        a = float(m3.get_r(i, i))
        c = float(mg.get_r(i, i))
        assert abs(a - c) <= 1e-6 * max(1.0, abs(c))


@pytest.mark.slow
def test_big_knapsack():
    """3000-bit knapsack entries exercise the row-expo scaling path."""
    RandGen.init_with_seed(1)
    b = gen.gen_intrel(20, 3000)
    assert lll_reduction(b, method=LM_FAST) == RED_SUCCESS
    m = fl.MatGSO(b, flags=GSO_ROW_EXPO)
    assert fl.is_lll_reduced(m, 0.99, 0.51)
