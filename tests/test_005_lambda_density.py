"""Lambda pseudoenergies and density-based energy consistency.

Oracles: test_003_ccsd_lambda.py:38,51 (frozen Psi4 pseudoenergies) and the
test_004_ccsd_density.py internal-consistency pattern (density energy equals
amplitude energy).
"""

import contextlib
import io

import pycc_tpu
from .common import scf


def _pipeline(basis):
    wfn = scf("H2O", basis)
    cc = pycc_tpu.ccwfn(wfn)
    with contextlib.redirect_stdout(io.StringIO()):
        ecc = cc.solve_cc(e_conv=1e-12, r_conv=1e-12)
        hbar = pycc_tpu.cchbar(cc)
        lam = pycc_tpu.cclambda(cc, hbar)
        lecc = lam.solve_lambda(e_conv=1e-12, r_conv=1e-12)
    return cc, lam, ecc, lecc


def test_ccsd_lambda_sto3g():
    cc, lam, ecc, lecc = _pipeline("sto-3g")
    assert abs(ecc - -0.070616830152761) < 1e-11
    assert abs(lecc - -0.068826452648939) < 1e-11


def test_ccsd_lambda_density_ccpvdz():
    cc, lam, ecc, lecc = _pipeline("cc-pvdz")
    assert abs(lecc - -0.217838951550509) < 1e-11
    with contextlib.redirect_stdout(io.StringIO()):
        dens = pycc_tpu.ccdensity(cc, lam)
        edens = dens.compute_energy()
    assert abs(edens - ecc) < 1e-12
