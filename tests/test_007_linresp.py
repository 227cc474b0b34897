"""CCSD dynamic polarizability vs frozen Psi4 values (test_036_lr.py:75-83).

Also exercises the aug-cc-pVDZ basis data, the dipole integrals, and Psi4's
canonical C2v orientation (frame-dependent tensor components).
"""

import contextlib
import io

import numpy as np
import pycc_tpu
from .common import scf


def test_linresp_polarizability():
    wfn = scf("H2O", "aug-cc-pvdz", freeze_core=False)
    with contextlib.redirect_stdout(io.StringIO()):
        cc = pycc_tpu.ccwfn(wfn)
        cc.solve_cc(1e-12, 1e-12)
        hbar = pycc_tpu.cchbar(cc)
        lam = pycc_tpu.cclambda(cc, hbar)
        lam.solve_lambda(1e-12, 1e-12)
        dens = pycc_tpu.ccdensity(cc, lam)
        resp = pycc_tpu.ccresponse(dens)
        omega = 0.0656
        # full 3x3 dynamic polarizability via the one-call driver (the
        # reference's linresp is broken; test_036_lr.py assembles by hand)
        tensor = resp.linresp("MU", "MU", omega)
        polar = np.diag(tensor)

    assert abs(polar[0] - 9.92992070420665) < 1e-8
    assert abs(polar[1] - 13.443740151331559) < 1e-8
    assert abs(polar[2] - 11.342765745046526) < 1e-8
    assert abs(np.mean(polar) - 11.572142200333) < 1e-8
    # off-diagonal elements vanish by C2v symmetry in this frame
    assert np.abs(tensor - np.diag(polar)).max() < 1e-6
