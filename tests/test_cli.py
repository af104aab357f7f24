"""CLI tests: flag-compatibility surface of fplll / latticegen / llldiff
(reference: main.cpp option table, latticegen.cpp, llldiff.cpp)."""

import os
import subprocess
import sys

import pytest

ENV = dict(os.environ, FPLLL_TPU_PLATFORM="cpu")


def run(mod, args, inp=""):
    return subprocess.run([sys.executable, "-m", f"fplll_tpu.cli.{mod}"] + args,
                          input=inp, capture_output=True, text=True, env=ENV,
                          timeout=300)


@pytest.fixture(scope="module")
def basis():
    r = run("latticegen", ["-randseed", "21", "u", "10", "10"])
    assert r.returncode == 0
    return r.stdout


def test_latticegen_deterministic():
    a = run("latticegen", ["-randseed", "5", "r", "6", "20"]).stdout
    b = run("latticegen", ["-randseed", "5", "r", "6", "20"]).stdout
    assert a == b and a.startswith("[[")


def test_lll_default_output(basis):
    r = run("main", ["-a", "lll"], basis)
    assert r.returncode == 0
    assert r.stdout.startswith("[[")


def test_lll_output_formats(basis):
    r = run("main", ["-a", "lll", "-of", "but"], basis)
    assert r.returncode == 0
    # basis + transform + status line
    assert r.stdout.count("[[") == 2
    assert r.stdout.strip().splitlines()[-1] == "0"
    # sage format
    rk = run("main", ["-a", "lll", "-of", "bk"], basis)
    assert ", " in rk.stdout


def test_lll_methods_and_floats(basis):
    for extra in (["-m", "fast"], ["-m", "proved"], ["-m", "heuristic", "-f", "dpe"],
                  ["-m", "proved", "-p", "80"]):
        r = run("main", ["-a", "lll"] + extra, basis)
        assert r.returncode == 0, (extra, r.stderr)
    # reference parity: the wrapper method rejects an explicit float type
    # (wrapper.cpp:567-569 FPLLL_CHECK float_type == FT_DEFAULT)
    r = run("main", ["-a", "lll", "-f", "dpe"], basis)
    assert r.returncode != 0


def test_delta_eta_flags(basis):
    r = run("main", ["-a", "lll", "-d", "0.75", "-e", "0.6"], basis)
    assert r.returncode == 0


def test_bkz_requires_block(basis):
    r = run("main", ["-a", "bkz"], basis)
    assert r.returncode != 0
    assert "-b" in r.stderr


def test_bkz_with_strategies(basis):
    r = run("main", ["-a", "bkz", "-b", "5", "-s", "default.json",
                     "-bkzmaxloops", "1", "-of", "t"], basis)
    assert r.returncode in (0, 8)


def test_svp_solution_is_lattice_vector(basis):
    r = run("main", ["-a", "svp", "-of", "s"], basis)
    assert r.returncode == 0
    sol = r.stdout.strip().splitlines()[-1]
    assert sol.startswith("[") and sol.endswith("]")


def test_cvp(basis):
    inp = basis + "\n[1 2 3 4 5 6 7 8 9 10]\n"
    r = run("main", ["-a", "cvp"], inp)
    assert r.returncode == 0


def test_hlll_action(basis):
    r = run("main", ["-a", "hlll"], basis)
    assert r.returncode == 0


def test_pruner_action(basis):
    r = run("main", ["-a", "pru", "-pruminprob", "0.5"], basis)
    assert r.returncode == 0
    assert "pruning coefficients" in r.stdout


def test_invalid_action():
    r = run("main", ["-a", "nonsense"])
    assert r.returncode == 1
    assert "invalid action" in r.stderr


def test_llldiff(tmp_path, basis):
    red = run("main", ["-a", "lll"], basis).stdout
    a = tmp_path / "a.txt"
    a.write_text(red)
    r = run("llldiff", [str(a), str(a)])
    assert r.returncode == 0 and "equal" in r.stdout
    b = tmp_path / "b.txt"
    b.write_text(basis)
    r2 = run("llldiff", [str(a), str(b)])
    assert r2.returncode == 1 and "differ" in r2.stdout
