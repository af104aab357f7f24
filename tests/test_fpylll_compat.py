"""Tests for the fpylll-shaped API veneer (fplll_tpu/fpylll.py).

Exercises the documented fpylll workflows end-to-end against the
framework: matrix construction, GSO.Mat, LLL/BKZ reduction, SVP/CVP,
Enumeration's list-of-solutions protocol, and Pruning.run."""

import math

import pytest

from fplll_tpu.fpylll import (BKZ, CVP, FPLLL, GSO, LLL, SVP, Enumeration,
                              EnumerationError, EvaluatorStrategy,
                              IntegerMatrix, Pruning)


def test_integer_matrix_constructors():
    A = IntegerMatrix(3, 3)
    assert A.nrows == 3 and A[0, 0] == 0
    I = IntegerMatrix.identity(4)
    assert I[2, 2] == 1 and I[2, 3] == 0
    B = IntegerMatrix.from_matrix([[1, 2], [3, 4]])
    assert B[1, 0] == 3
    T = B.transpose()
    assert T[0, 1] == 3 and T.nrows == 2
    assert B.multiply_left([1, 1]) == (4, 6)

    FPLLL.set_random_seed(1337)
    Q = IntegerMatrix.random(20, "qary", k=10, bits=20)
    assert Q.nrows == 20
    FPLLL.set_random_seed(1337)
    Q2 = IntegerMatrix.random(20, "qary", k=10, bits=20)
    assert Q.to_pylist() == Q2.to_pylist()     # seeded determinism
    U = IntegerMatrix.random(12, "uniform", bits=18)
    assert U.nrows == 12
    R = IntegerMatrix.random(8, "intrel", bits=20)
    assert R.ncols == 9
    with pytest.raises(ValueError):
        IntegerMatrix.random(8, "nope", bits=4)


def test_lll_workflow():
    FPLLL.set_random_seed(7)
    A = IntegerMatrix.random(25, "uniform", bits=25)
    assert not LLL.is_reduced(A)
    LLL.reduction(A)
    assert LLL.is_reduced(A)
    M = GSO.Mat(A, flags=GSO.ROW_EXPO, update=True)
    assert M.get_current_slope(0, 25) < 0.0


def test_bkz_easyparam_reduction():
    FPLLL.set_random_seed(11)
    A = IntegerMatrix.random(30, "qary", k=15, bits=20)
    LLL.reduction(A)
    n0 = sum(x * x for x in [int(A[0, j]) for j in range(A.ncols)])
    BKZ.reduction(A, BKZ.EasyParam(10, max_loops=2))
    n1 = sum(x * x for x in [int(A[0, j]) for j in range(A.ncols)])
    assert n1 <= n0
    assert LLL.is_reduced(A)


def test_svp_cvp_roundtrip():
    FPLLL.set_random_seed(23)
    A = IntegerMatrix.random(20, "qary", k=10, bits=15)
    v = SVP.shortest_vector(A, method="fast")
    assert len(v) == A.ncols
    nv = sum(x * x for x in v)
    # the returned vector is at most as long as every reduced basis row
    n0 = sum(int(A[0, j]) ** 2 for j in range(A.ncols))
    assert 0 < nv <= n0
    # CVP at an exact lattice point returns that point
    t = A.multiply_left([1] * A.nrows)
    w = CVP.closest_vector(A, t)
    assert tuple(w) == tuple(t)


def test_enumeration_protocol():
    FPLLL.set_random_seed(5)
    A = IntegerMatrix.random(20, "qary", k=10, bits=15)
    LLL.reduction(A)
    M = GSO.Mat(A, update=True)
    enum = Enumeration(M, nr_solutions=3,
                       strategy=EvaluatorStrategy.BEST_N_SOLUTIONS)
    v, e = M.get_r_exp(0, 0)
    r00 = M.ctx.to_float(v) * 2.0 ** e
    sols = enum.enumerate(0, 20, r00 * 1.001, 0)
    assert 1 <= len(sols) <= 3
    dist, coords = sols[0]
    assert dist <= r00 * 1.001 and len(coords) == 20
    assert enum.get_nodes() > 0
    # shrink the bound to exclude everything -> EnumerationError
    with pytest.raises(EnumerationError):
        enum.enumerate(0, 20, dist * 1e-6, 0)


def test_pruning_run():
    r = [2.0 ** (-0.05 * i) for i in range(40)]
    gh = math.exp(sum(math.log(x) for x in r) / 40) * 1.1
    pp = Pruning.run(gh, 2.0 ** 20, r, 0.4,
                     flags=Pruning.GRADIENT | Pruning.NELDER_MEAD)
    assert len(pp.coefficients) == 40
    assert all(0 < c <= 1.0 for c in pp.coefficients)
    assert 0 < Pruning.svp_probability(pp) <= 1.0
    lp = Pruning.LinearPruningParams(40, 20)
    assert len(lp.coefficients) == 40


def test_simulate_shim():
    from fplll_tpu.fpylll import simulate
    FPLLL.set_random_seed(3)
    A = IntegerMatrix.random(60, "qary", k=30, bits=20)
    LLL.reduction(A)
    prof, tours = simulate(A, BKZ.Param(40, max_loops=8))
    assert len(prof) == 60 and tours >= 1
    M = GSO.Mat(A, update=True)
    prof2, _ = simulate(M, BKZ.Param(40, max_loops=8))
    assert prof == prof2
    # volume conserved
    import math
    lv_in = sum(math.log(M.ctx.to_float(M.get_r_exp(i, i)[0])) +
                M.get_r_exp(i, i)[1] * math.log(2.0) for i in range(60))
    lv_out = sum(math.log(x) for x in prof)
    assert abs(lv_out - lv_in) < 1e-6
