"""Container + generator + I/O tests (mirrors the reference's matrix
behaviors: fplll text format, row ops, rotations, generator shapes)."""

import pytest

import fplll_tpu as fl
from fplll_tpu.nr.rng import RandGen
from fplll_tpu.ops import gen
from fplll_tpu.ops.intmat import (IntMat, format_matrix, format_vector,
                                  parse_matrix, parse_vector)


def test_parse_format_roundtrip():
    m = IntMat.from_rows([[1, -2, 3], [40, 5, -6]])
    assert parse_matrix(format_matrix(m)) == m


def test_parse_reference_format(lattice_dir):
    b = fl.read_matrix(f"{lattice_dir}/example_in")
    assert b.nrows == 10 and b.ncols == 11
    assert int(b.a[0, 1]) == 1


def test_vector_io():
    v = [3, -1, 4]
    assert parse_vector(format_vector(v)) == v


def test_row_ops():
    m = IntMat.from_rows([[1, 2], [10, 20], [100, 200]])
    m.row_addmul(0, 1, 3)
    assert list(m.a[0]) == [31, 62]
    m.row_swap(0, 2)
    assert list(m.a[0]) == [100, 200]
    m.rotate_right(0, 2)
    assert list(m.a[0]) == [31, 62]
    m.rotate_left(0, 2)
    assert list(m.a[0]) == [100, 200]


def test_big_int_exactness():
    big = 10 ** 100
    m = IntMat.from_rows([[big, 1], [big + 1, 2]])
    m.row_sub(1, 0)
    assert int(m.a[1, 0]) == 1
    assert m.dot_rows(0, 0) == big * big + 1


def test_row_expo_export():
    m = IntMat.from_rows([[2 ** 200, 1], [3, 4]])
    f, e = m.to_f64_with_expo()
    assert e[0] == 201
    assert abs(f[0, 0] - 0.5) < 1e-15


@pytest.mark.parametrize("maker,shape", [
    (lambda: gen.gen_intrel(10, 20), (10, 11)),
    (lambda: gen.gen_simdioph(11, 20, 30), (11, 11)),
    (lambda: gen.gen_uniform(8, 10), (8, 8)),
    (lambda: gen.gen_ntrulike(6, 97), (12, 12)),
    (lambda: gen.gen_ntrulike2(6, 97), (12, 12)),
    (lambda: gen.gen_qary(10, 5, 97), (10, 10)),
    (lambda: gen.gen_trg(8, 1.2), (8, 8)),
    (lambda: gen.gen_trg2([10.0] * 8), (8, 8)),
])
def test_generators(maker, shape):
    RandGen.init_with_seed(1)
    m = maker()
    assert (m.nrows, m.ncols) == shape


def test_generator_determinism():
    RandGen.init_with_seed(99)
    a = gen.gen_uniform(6, 20)
    RandGen.init_with_seed(99)
    b = gen.gen_uniform(6, 20)
    assert a == b


def test_ntrulike_structure():
    RandGen.init_with_seed(2)
    m = gen.gen_ntrulike(5, 127)
    for i in range(5):
        assert int(m.a[i, i]) == 1
        assert int(m.a[5 + i, 5 + i]) == 127
    # h(1) = 0 mod q: row sums of the H block are 0 mod q
    s = sum(int(m.a[0, j]) for j in range(5, 10))
    assert s % 127 == 0
