"""CLI surface tests (in-process main())."""
import numpy as np
import pytest

from qbot_tpu.cli import main


@pytest.fixture
def qb_file(tmp_path):
    def write(src):
        p = tmp_path / "prog.qb"
        p.write_text(src)
        return str(p)
    return write


class TestCli:
    def test_runs_program(self, qb_file, capsys):
        rc = main([qb_file('cout "hi"')])
        assert rc == 0
        assert capsys.readouterr().out == "hi\n"

    def test_missing_file(self, capsys):
        rc = main(["/nope/missing.qb"])
        assert rc == 1
        assert "File Not Found" in capsys.readouterr().out

    def test_script_error_exit_code(self, qb_file, capsys):
        rc = main([qb_file("bogus thing")])
        assert rc == 1
        assert "UnknownOperation" in capsys.readouterr().out

    def test_measurement_readout_format(self, qb_file, capsys):
        rc = main([qb_file("qset computation[0]\nmeas x ; computation\ncout x")])
        assert rc == 0
        out = capsys.readouterr().out
        assert out == "|0〉- 1.0 (100.0%)\n|1〉- 0.0 (0.0%)\n\n"

    def test_ensemble_flag(self, qb_file, capsys):
        rc = main([qb_file(
            "cdef x ; 1\n"
            "halt ProbVal([0.25, 0.75], [True, False])\n"
            "cdef x ; 2\n"
            "cout x"), "--ensemble"])
        assert rc == 0
        assert capsys.readouterr().out == "2\n"

    def test_compile_flag(self, qb_file, capsys):
        rc = main([qb_file(
            "qset tensorProd(comp[0], comp[0])\n"
            "gate hadamardGate ; 0\n"
            "gate pauliXGate ; 1 ; 0\n"
            "meas out ; comp"), "--compile"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "|0〉|0〉-" in out and "|1〉|1〉-" in out

    def test_backend_flag(self, qb_file):
        from qbot_tpu import backend
        rc = main([qb_file("qset comp[0]"), "--backend", "jax"])
        assert rc == 0
        assert backend.get_backend() == "jax"
        backend.set_backend("numpy")

    def test_profile_flag(self, qb_file, capsys):
        rc = main([qb_file("cdef x ; 1"), "--profile"])
        assert rc == 0
        assert "cdef" in capsys.readouterr().err
