"""SCF-layer regression tests: integrals and RHF against published values."""

import numpy as np
from pycc_tpu.scf import run_rhf, Molecule, BasisSet
from pycc_tpu.scf import integrals as ints
from .common import H2O_TEACH, H2


def test_rhf_h2o_sto3g():
    # Crawford programming-projects reference energy for this geometry
    wfn = run_rhf(H2O_TEACH, "sto-3g")
    assert abs(wfn.energy() - -74.942079928192) < 1e-10


def test_rhf_he_ccpvdz():
    wfn = run_rhf("He\nsymmetry c1", "cc-pvdz")
    assert abs(wfn.energy() - -2.855160477243) < 1e-10


def test_h2_integrals_szabo():
    """Two-center STO-3G integrals vs Szabo & Ostlund Sec. 3.5.2."""
    m = Molecule(H2, reorient=False, recenter=False)
    b = BasisSet(m, "sto-3g")
    S = ints.overlap(b)
    T = ints.kinetic(b)
    E = ints.eri(b)
    assert abs(S[0, 1] - 0.6593) < 1e-4
    assert abs(T[0, 0] - 0.7600) < 1e-4
    assert abs(E[0, 0, 0, 0] - 0.7746) < 1e-4
    assert abs(E[0, 1, 0, 1] - 0.2970) < 1e-4


def test_eri_permutational_symmetry():
    m = Molecule("O\nH 1 1.1\nH 1 1.1 2 104\nsymmetry c1")
    b = BasisSet(m, "sto-3g")
    E = ints.eri(b)
    assert np.allclose(E, E.transpose(1, 0, 2, 3))
    assert np.allclose(E, E.transpose(0, 1, 3, 2))
    assert np.allclose(E, E.transpose(2, 3, 0, 1))


def test_native_eri_matches_python():
    """C++ MD engine vs the pure-Python reference implementation."""
    from pycc_tpu.scf import native
    if not native.available():
        import pytest
        pytest.skip("no native toolchain")
    m = Molecule("O\nH 1 1.1\nH 1 1.1 2 104\nsymmetry c1")
    b = BasisSet(m, "cc-pvdz")
    E_py = ints._eri_python(b)
    E_cc = native.eri_native(b)
    assert np.abs(E_py - E_cc).max() < 1e-12


def test_general_l_pure_transform():
    """General-l spherical transform: orthonormal under Gaussian measure."""
    from pycc_tpu.scf.integrals import _cart_overlap_ratio, pure_transform
    for l in (2, 3, 4):
        T = pure_transform(l)
        S = _cart_overlap_ratio(l)
        assert np.abs(T @ S @ T.T - np.eye(2 * l + 1)).max() < 1e-12


def test_f_shell_integrals():
    from pycc_tpu.scf.basis import Shell
    m1 = Molecule("H 0 0 0\nsymmetry c1\nunits au", reorient=False,
                  recenter=False)
    b = BasisSet(m1, "sto-3g")
    b.shells = [Shell(3, [0, 0, 0], [0.9], [1.0], 0, True),
                Shell(0, [0.3, 0.2, 0.8], [0.8], [1.0], 0, False)]
    b.offsets = [0, 7]
    b.nbf = 8
    S = ints.overlap(b)
    assert np.allclose(np.diag(S)[:7], 1.0)
    E = ints.eri(b)
    assert np.allclose(E, E.transpose(1, 0, 2, 3))
    assert np.allclose(E, E.transpose(2, 3, 0, 1))
