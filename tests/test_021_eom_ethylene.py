"""EOM-CCSD on ethylene, mirroring the reference's C2H4 case
(/root/reference/pycc/tests/test_035_eomccsd.py:114-163: cc-pVDZ,
frozen core, 3 roots, all three guess types).

The reference validates against an in-test `psi4.energy('eom-ccsd')`;
without Psi4 here the oracle is (a) mutual agreement of the three guess
types, (b) agreement with the big-system sequential-sigma path, and
(c) frozen regression values pinned from this code (the C cc-pVDZ basis
is the atomic-HF-derived table of scf/atomic.py, so absolute Psi4
comparison is deferred to the basis-table regressions of test_018).
"""

import contextlib
import io

import numpy as np
import pycc_tpu
from .common import scf


def test_eom_ccsd_c2h4_fc():
    wfn = scf("C2H4", "cc-pvdz", freeze_core=True)
    cc = pycc_tpu.ccwfn(wfn)
    with contextlib.redirect_stdout(io.StringIO()):
        ecc = cc.solve_cc(e_conv=1e-12, r_conv=1e-12)
    assert abs(ecc - -0.305587255584445) < 1e-9
    with contextlib.redirect_stdout(io.StringIO()):
        hbar = pycc_tpu.cchbar(cc)
        eom = pycc_tpu.cceom(hbar)

    roots = {}
    for g in ("HBAR_SS", "CIS", "UNIT"):
        with contextlib.redirect_stdout(io.StringIO()):
            E, C = eom.solve_eom(N=3, e_conv=1e-7, r_conv=1e-7, maxiter=75,
                                 guess=g)
        assert eom.converged, g
        roots[g] = np.asarray(E)
    assert np.allclose(roots["CIS"], roots["HBAR_SS"], atol=1e-5)
    assert np.allclose(roots["UNIT"], roots["HBAR_SS"], atol=1e-5)

    # frozen regression (this code, 2026-08; guards basis/integral/EOM
    # stack drift)
    ref = np.array([0.324575036764, 0.328021971344, 0.334479736844])
    assert np.allclose(roots["HBAR_SS"], ref, atol=1e-6), roots["HBAR_SS"]
