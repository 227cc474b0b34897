"""CCSD energies vs the reference suite's frozen Psi4 values.

Oracles from /root/reference/pycc/tests/test_002_ccsd_energy.py:32,40.
"""

from .common import scf
import pycc_tpu


def test_ccsd_h2o_sto3g():
    wfn = scf("H2O", "sto-3g")
    cc = pycc_tpu.ccwfn(wfn)
    eccsd = cc.solve_cc(e_conv=1e-12, r_conv=1e-12, maxiter=75)
    epsi4 = -0.070616830152761
    assert abs(epsi4 - eccsd) < 1e-11


def test_ccsd_h2o_ccpvdz():
    wfn = scf("H2O", "cc-pvdz")
    cc = pycc_tpu.ccwfn(wfn)
    eccsd = cc.solve_cc(e_conv=1e-12, r_conv=1e-12, maxiter=75)
    epsi4 = -0.222029814166783
    assert abs(epsi4 - eccsd) < 1e-11
