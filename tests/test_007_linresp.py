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
        polar = np.zeros(3)
        for ax in range(3):
            key = "MU_" + resp.cart[ax]
            A = resp.pertbar[key]
            X1, X2, _ = resp.solve_right(A, omega)
            Y1, Y2, _ = resp.solve_left(A, omega)
            polar[ax] = float(np.real(resp.linresp_asym(key, X1, X2, Y1, Y2)))

    assert abs(polar[0] - 9.92992070420665) < 1e-8
    assert abs(polar[1] - 13.443740151331559) < 1e-8
    assert abs(polar[2] - 11.342765745046526) < 1e-8
    assert abs(np.mean(polar) - 11.572142200333) < 1e-8
