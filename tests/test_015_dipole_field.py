"""Correlated electric/magnetic dipoles and field plumbing.

Oracles: frozen values from the reference's test_007_dipole.py:45-58
((H2)_2/6-31G CCSD dipole with the SCF part removed) and the integral-
consistency checks of test_014_field.py:47-76 (rtcc.mu/m vs the MO-basis
property integrals, isotropic mu_tot, per-axis kick).
"""

import contextlib
import io

import numpy as np
import pycc_tpu
from .common import scf


def _setup():
    wfn = scf("(H2)_2", "cc-pvdz", freeze_core=False)
    with contextlib.redirect_stdout(io.StringIO()):
        cc = pycc_tpu.ccwfn(wfn)
        ecc = cc.solve_cc(1e-13, 1e-13)
        hbar = pycc_tpu.cchbar(cc)
        lam = pycc_tpu.cclambda(cc, hbar)
        lam.solve_lambda(1e-13, 1e-13)
        dens = pycc_tpu.ccdensity(cc, lam)
    return cc, lam, dens, ecc


def test_correlated_dipoles_h2_dimer():
    cc, lam, dens, ecc = _setup()
    rt = pycc_tpu.rtcc(cc, lam, dens, None, magnetic=True)
    y0 = rt.collect_amps(cc.t1, cc.t2, lam.l1, lam.l2,
                         ecc).astype("complex128")
    t1, t2, l1, l2, phase = rt.extract_amps(y0)

    # electric dipole (SCF part removed), test_007_dipole.py:45
    ref_mu = np.array([0.0, 0.0, -0.0007395036977002])
    mu = rt.dipole(t1, t2, l1, l2)
    for ax in range(3):
        assert abs(ref_mu[ax] - complex(mu[ax])) < 1e-10

    # magnetic dipole (pure imaginary), test_007_dipole.py:53
    ref_m = np.array([0.0, 0.0, -2.3037968376087573e-5])
    m = rt.dipole(t1, t2, l1, l2, magnetic=True)
    for ax in range(3):
        assert abs(ref_m[ax] * 1.0j - complex(m[ax])) < 1e-10


def test_rtcc_magnetic_integrals_h2_dimer():
    """rtcc.m is wired to the Hamiltonian's (pure-imaginary) magnetic-dipole
    integrals (test_014_field.py:47-57 pattern; mu/mu_tot/kick plumbing is
    covered in test_013)."""
    cc, lam, dens, _ = _setup()
    rt = pycc_tpu.rtcc(cc, lam, dens, None, magnetic=True)
    for ax in range(3):
        m = np.asarray(rt.m[ax])
        assert np.allclose(np.asarray(cc.H.m[ax]), m)
        assert np.abs(m.real).max() < 1e-14
        assert np.abs(m + m.swapaxes(0, 1)).max() < 1e-12  # antihermitian
