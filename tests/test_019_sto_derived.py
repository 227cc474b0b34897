"""Derived STO-3G tables for Li/Be/S/Cl (scf/sto.py).

Validation strategy (mirrors tests/test_018_cn_basis.py's
derive-and-calibrate pattern): the construction — universal 3-Gaussian
STO fits scaled by one zeta per principal shell — must regenerate the
shipped, oracle-validated H/He/C/N/O minimal-basis tables before it is
trusted for the four new elements; the fit itself is re-run from scratch
and compared against the frozen universal rows.  The new elements then
carry frozen end-to-end CCSD regressions (Be atom, LiH, and the two
chiral moldict geometries the reference ships for its optical-rotation
work, /root/reference/pycc/data/molecules.py).
"""

import numpy as np
import pytest

import pycc_tpu
from pycc_tpu.data.molecules import moldict
from pycc_tpu.scf import sto
from pycc_tpu.scf.basis import _STO3G


def test_universal_rows_match_shipped_tables():
    # every shipped (oracle-validated) first/second-row entry must be the
    # universal row x zeta^2 to its last published digit
    zetas = {"H": (1.24,), "He": (1.69,), "C": (5.67, 1.72),
             "N": (6.67, 1.95), "O": (7.66, 2.25)}
    for el, zs in zetas.items():
        derived = sto.sto3g_shells(el)
        for (ld, pd), (ls, ps) in zip(derived, _STO3G[el]):
            assert ld == ls
            for (ed, cd), (es, cs) in zip(pd, ps):
                assert abs(ed / es - 1) < 2e-7
                assert abs(cd - cs) < 1e-8


def test_fit_regenerates_universal_rows():
    # the derivation machinery itself: a fresh max-overlap fit reproduces
    # the frozen universal exponents/coefficients (coarse grid -> 1e-4)
    for n, (uexp, us, up) in ((1, (sto._U1S_EXP, sto._U1S_C, None)),
                              (2, (sto._U2SP_EXP, sto._U2S_C, sto._U2P_C)),
                              (3, (sto._U3SP_EXP, sto._U3S_C, sto._U3P_C))):
        exps, cs, cp = sto.fit_universal(n, npts=30000, rmax=60.0)
        assert np.allclose(exps, uexp, rtol=2e-4), (n, exps, uexp)
        assert np.allclose(cs, us, atol=3e-4), (n, cs)
        if up is not None:
            assert np.allclose(cp, up, atol=3e-4), (n, cp)


def test_shell_zeta_consistency():
    # one zeta per principal shell: S/P pairs of an SP shell share exponents
    for el in ("Li", "Be", "S", "Cl"):
        shells = _STO3G[el]
        for i in range(1, len(shells) - 1, 2):
            s_exps = [e for e, _ in shells[i][1]]
            p_exps = [e for e, _ in shells[i + 1][1]]
            assert s_exps == p_exps


# Frozen end-to-end regressions (this repo, f64, CPU; see module docstring).
_CASES = [
    ("Be", -14.351880484478151, -0.051448125608580),
    ("LiH", -7.860751552116286, -0.020736151096726),
    ("(R)-methylthiirane", -508.853920362530, -0.247530857342988),
    ("(S)-2-chloropropionitrile", -622.842956584336, -0.302481764142357),
]


@pytest.mark.parametrize("name,escf,ecorr", _CASES,
                         ids=[c[0] for c in _CASES])
def test_libescl_ccsd_regression(name, escf, ecorr):
    wfn = pycc_tpu.scf.run_rhf(moldict[name], "sto-3g", freeze_core=True)
    assert abs(wfn._energy - escf) < 1e-8
    cc = pycc_tpu.ccwfn(wfn, quiet=True)
    e = cc.solve_cc(e_conv=1e-10, r_conv=1e-9)
    assert abs(e - ecorr) < 1e-8
