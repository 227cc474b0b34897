"""EOM-CCSD Davidson vs dense diagonalization of the EOM matrix.

The reference validates against an in-test `psi4.energy('eom-ccsd')`
(test_035_eomccsd.py:56-62); without Psi4 in this environment the oracle is
the dense eigenspectrum of the same HBAR-sigma operator (exact for the
Davidson solver), checked for all three guess types.
"""

import contextlib
import io

import numpy as np
import pycc_tpu
from .common import scf


def test_eom_ccsd_h2o_sto3g():
    wfn = scf("H2O", "sto-3g", freeze_core=False)
    cc = pycc_tpu.ccwfn(wfn)
    with contextlib.redirect_stdout(io.StringIO()):
        cc.solve_cc(e_conv=1e-12, r_conv=1e-12)
        hbar = pycc_tpu.cchbar(cc)
    eom = pycc_tpu.cceom(hbar)

    A = eom.dense_matrix()
    ev = np.linalg.eigvals(A)
    ev = np.sort(np.real(ev[np.abs(np.imag(ev)) < 1e-6]))
    ev = ev[ev > 1e-6][:3]

    for g in ("HBAR_SS", "CIS", "UNIT"):
        with contextlib.redirect_stdout(io.StringIO()):
            E, C = eom.solve_eom(N=3, e_conv=1e-7, guess=g)
        assert np.allclose(E, ev, atol=1e-5), (g, E, ev)
