"""Package import smoke test (mirrors reference test_001_pycc.py)."""

import pycc_tpu


def test_imports():
    assert hasattr(pycc_tpu, "ccwfn")
    assert hasattr(pycc_tpu, "scf")
    assert hasattr(pycc_tpu, "Hamiltonian")
