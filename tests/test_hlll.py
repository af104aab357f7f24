"""HLLL tests (mirrors /root/reference/tests/test_hlll.cpp: reduce then
verify with is_hlll_reduced, negative control)."""

import pytest

import fplll_tpu as fl
from fplll_tpu.algs.hlll import HLLLReduction, is_hlll_reduced
from fplll_tpu.algs.wrapper import hlll_reduction
from fplll_tpu.core.householder import MatHouseholder
from fplll_tpu.defs import (HOUSEHOLDER_OP_FORCE_LONG, HOUSEHOLDER_ROW_EXPO,
                            LM_FAST, LM_PROVED, LM_WRAPPER, RED_SUCCESS)
from fplll_tpu.nr.rng import RandGen
from fplll_tpu.ops import gen


def check_hlll_reduced(b):
    m = MatHouseholder(b.copy(), flags=HOUSEHOLDER_ROW_EXPO)
    assert is_hlll_reduced(m, 0.99, 0.51) == RED_SUCCESS


@pytest.mark.parametrize("method", [LM_WRAPPER, LM_FAST, LM_PROVED])
def test_hlll_methods(method):
    RandGen.init_with_seed(3)
    b = gen.gen_intrel(14, 30)
    st = hlll_reduction(b, method=method)
    assert st == RED_SUCCESS
    check_hlll_reduced(b)


def test_hlll_direct():
    RandGen.init_with_seed(7)
    b = gen.gen_uniform(16, 14)
    m = MatHouseholder(b, flags=HOUSEHOLDER_ROW_EXPO |
                       HOUSEHOLDER_OP_FORCE_LONG)
    h = HLLLReduction(m, 0.99, 0.51)
    assert h.hlll()
    check_hlll_reduced(b)
    # the reduced basis must also be (loosely) LLL reduced
    g = fl.MatGSO(b, flags=fl.GSO_ROW_EXPO)
    assert fl.is_lll_reduced(g, 0.95, 0.56)


def test_hlll_nolll_verifier():
    """fplll -a hlll -nolll path: verification only."""
    RandGen.init_with_seed(9)
    b = gen.gen_uniform(10, 12)
    assert hlll_reduction(b.copy(), nolll=True) != RED_SUCCESS
    hlll_reduction(b)
    assert hlll_reduction(b, nolll=True) == RED_SUCCESS


def test_hlll_file(lattice_dir):
    b = fl.read_matrix(f"{lattice_dir}/example_in")
    st = hlll_reduction(b)
    assert st == RED_SUCCESS
    check_hlll_reduced(b)
