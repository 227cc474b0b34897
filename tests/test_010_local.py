"""Local-correlation tests: PNO/PNO++/CPNO++/PAO simulation paths vs frozen
Psi4/psi3 values, and the native local solver cross-validation oracle.

Oracles: test_013_pnocc.py, test_028_pnoppcc.py, test_035_cpnoppcc.py,
test_018_paocc.py, test_032_localccd.py / test_033_localccsd.py.
"""

import contextlib
import io

import pycc_tpu
from pycc_tpu.scf import run_rhf
from .common import scf

H2_4 = """
H 0.000000 0.000000 0.000000
H 0.750000 0.000000 0.000000
H 0.000000 1.500000 0.000000
H 0.375000 1.500000 -0.649520
H 0.000000 3.000000 0.000000
H -0.375000 3.000000 -0.649520
H 0.000000 4.500000 -0.000000
H -0.750000 4.500000 -0.000000
symmetry c1
noreorient
nocom
"""


def _solve(cc, **kw):
    with contextlib.redirect_stdout(io.StringIO()):
        return cc.solve_cc(1e-12, 1e-12, maxiter=100, **kw)


def _lambda(cc):
    with contextlib.redirect_stdout(io.StringIO()):
        hbar = pycc_tpu.cchbar(cc)
        lam = pycc_tpu.cclambda(cc, hbar)
        return lam.solve_lambda(1e-12, 1e-12, maxiter=100)


def test_pno_ccsd():
    wfn = scf("H2O", "cc-pvdz", freeze_core=False)
    cc = pycc_tpu.ccwfn(wfn, local="PNO", local_cutoff=1e-5, it2_opt=False,
                        filter=True)
    assert abs(_solve(cc) - -0.218394869543943) < 1e-7
    assert abs(_lambda(cc) - -0.214461441319427) < 1e-7


def test_pno_ccsd_opt():
    wfn = scf("H2O", "cc-pvdz", freeze_core=False)
    cc = pycc_tpu.ccwfn(wfn, local="PNO", local_cutoff=1e-5, filter=True)
    assert abs(_solve(cc) - -0.221156413159672) < 1e-7
    assert abs(_lambda(cc) - -0.217144045119534) < 1e-7


def test_pnopp_ccsd():
    wfn = scf("H2O", "cc-pvdz", freeze_core=False)
    cc = pycc_tpu.ccwfn(wfn, local="PNO++", local_cutoff=1e-7, it2_opt=False,
                        filter=True)
    assert abs(_solve(cc) - -0.216064367834782) < 1e-7
    assert abs(_lambda(cc) - -0.211938482158711) < 1e-7


def test_cpnopp_ccsd():
    wfn = scf("H2O", "cc-pvdz", freeze_core=False)
    cc = pycc_tpu.ccwfn(wfn, local="CPNO++", local_cutoff=1e-7, it2_opt=False,
                        filter=True)
    assert abs(_solve(cc) - -0.22303320613504354) < 1e-7
    assert abs(_lambda(cc) - -0.21890326836263854) < 1e-7


def test_pao_h2_4_dz():
    wfn = run_rhf(H2_4, "dz", freeze_core=False)
    cc = pycc_tpu.ccwfn(wfn, local="PAO", local_cutoff=2e-2, filter=True)
    assert abs(_solve(cc) - -0.108914240219735) < 1e-7


def test_pao_h2o_631g():
    wfn = scf("H2O", "6-31g", freeze_core=False)
    cc = pycc_tpu.ccwfn(wfn, local="PAO", local_cutoff=2e-2, filter=True)
    assert abs(_solve(cc) - -0.149361947815815) < 1e-7


def test_local_vs_simulated_ccd():
    """Native local solver equals the simulation path (test_032 oracle)."""
    wfn = scf("H2O", "cc-pvdz", freeze_core=False)
    sim = pycc_tpu.ccwfn(wfn, model="CCD", local="PNO", local_cutoff=1e-5,
                         it2_opt=False, filter=True)
    e_sim = _solve(sim)
    lcc = pycc_tpu.ccwfn(wfn, model="CCD", local="PNO", local_cutoff=1e-5,
                         it2_opt=False)
    with contextlib.redirect_stdout(io.StringIO()):
        e_lcc = lcc.lccwfn.solve_lcc(1e-12, 1e-12, maxiter=100)
    assert abs(e_sim - e_lcc) < 1e-12


def test_local_vs_simulated_ccsd():
    wfn = scf("H2O", "cc-pvdz", freeze_core=False)
    sim = pycc_tpu.ccwfn(wfn, model="CCSD", local="PNO", local_cutoff=1e-5,
                         it2_opt=False, filter=True)
    e_sim = _solve(sim)
    lcc = pycc_tpu.ccwfn(wfn, model="CCSD", local="PNO", local_cutoff=1e-5,
                         it2_opt=False)
    with contextlib.redirect_stdout(io.StringIO()):
        e_lcc = lcc.lccwfn.solve_lcc(1e-12, 1e-12, maxiter=100)
    assert abs(e_sim - e_lcc) < 1e-12


def test_native_local_cc2_matches_dense_backend():
    """residuals_cc2_local (native pair-space CC2 — beyond the reference,
    whose lccwfn is CCD/CCSD only): equals the dense-backend local CC2
    solver to machine precision."""
    import contextlib
    import io

    wfn = scf("H2O", "cc-pvdz", freeze_core=True)
    with contextlib.redirect_stdout(io.StringIO()):
        cc_n = pycc_tpu.ccwfn(wfn, model="CC2", local="PNO",
                              local_cutoff=1e-5)
        e_n = cc_n.lccwfn.solve_lcc(1e-10, 1e-10)
        cc_d = pycc_tpu.ccwfn(wfn, model="CC2", local="PNO",
                              local_cutoff=1e-5)
        cc_d.lccwfn._use_local_eqs = False
        e_d = cc_d.lccwfn.solve_lcc(1e-10, 1e-10)
    assert abs(e_n - e_d) < 1e-12


def test_pair_screened_ccd_exact_at_zero_cutoff():
    """pair_cutoff=0 keeps every pair strong: the compact screened stacks
    (lccwfn_screened.py) must reproduce the unscreened padded-batch solver
    bit-for-bit through convergence."""
    wfn = scf("H2O", "cc-pvdz", freeze_core=False)
    with contextlib.redirect_stdout(io.StringIO()):
        cc0 = pycc_tpu.ccwfn(wfn, model="CCD", local="PNO",
                             local_cutoff=1e-5, it2_opt=False)
        e0 = cc0.lccwfn.solve_lcc(1e-12, 1e-12, maxiter=100)
        cc1 = pycc_tpu.ccwfn(wfn, model="CCD", local="PNO",
                             local_cutoff=1e-5, it2_opt=False,
                             pair_cutoff=0.0)
        e1 = cc1.lccwfn.solve_lcc(1e-12, 1e-12, maxiter=100)
    assert cc1.lccwfn._pre["P"] == cc1.lccwfn.no ** 2
    assert abs(e1 - e0) < 1e-14


def test_pair_screened_ccd_weak_pairs_frozen_at_mp2():
    """A real cutoff drops weak pairs (frozen at local MP2): the strong
    list shrinks, the energy moves by O(cutoff), and the weak-pair t2 rows
    are exactly their MP2 values after the solve."""
    import numpy as np

    wfn = scf("H2O", "cc-pvdz", freeze_core=False)
    with contextlib.redirect_stdout(io.StringIO()):
        cc0 = pycc_tpu.ccwfn(wfn, model="CCD", local="PNO",
                             local_cutoff=1e-5, it2_opt=False)
        e0 = cc0.lccwfn.solve_lcc(1e-12, 1e-12, maxiter=100)
        cc = pycc_tpu.ccwfn(wfn, model="CCD", local="PNO",
                            local_cutoff=1e-5, it2_opt=False,
                            pair_cutoff=1e-3)
        e = cc.lccwfn.solve_lcc(1e-12, 1e-12, maxiter=100)
    lw = cc.lccwfn
    P, no = lw._pre["P"], lw.no
    assert P < no ** 2
    # screening error is bounded by (a small multiple of) the dropped
    # pair-energy sum
    assert 0 < abs(e - e0) < 2e-2
    # weak rows never moved off their MP2 start
    pidx = np.asarray(lw._pre["pidx"]).reshape(-1)
    t2_mp2 = np.asarray(-lw.H.ERI[lw.o, lw.o, lw.v, lw.v]
                        .reshape(no * no, lw.nv, lw.nv))
    QLp = np.asarray(lw.Local.QLp)
    t2_mp2 = np.einsum("pva,pvw,pwb->pab", QLp, t2_mp2, QLp) \
        / np.asarray(lw._Dloc)
    t2_fin = np.asarray(lw.t2)
    weak = pidx < 0
    assert weak.any()
    assert np.max(np.abs(t2_fin[weak] - t2_mp2[weak])) < 1e-13


def test_pair_screened_ccsd_exact_at_zero_cutoff():
    """pair_cutoff=0 keeps every pair strong: the compact screened CCSD
    stacks must reproduce the unscreened padded-batch solver through
    convergence (singles included)."""
    wfn = scf("H2O", "cc-pvdz", freeze_core=False)
    with contextlib.redirect_stdout(io.StringIO()):
        cc0 = pycc_tpu.ccwfn(wfn, model="CCSD", local="PNO",
                             local_cutoff=1e-5, it2_opt=False)
        e0 = cc0.lccwfn.solve_lcc(1e-12, 1e-12, maxiter=100)
        cc1 = pycc_tpu.ccwfn(wfn, model="CCSD", local="PNO",
                             local_cutoff=1e-5, it2_opt=False,
                             pair_cutoff=0.0)
        e1 = cc1.lccwfn.solve_lcc(1e-12, 1e-12, maxiter=100)
    assert cc1.lccwfn._pre["P"] == cc1.lccwfn.no ** 2
    assert abs(e1 - e0) < 1e-12


def test_pair_screened_ccsd_weak_pairs_frozen_at_mp2():
    """A real cutoff on CCSD: strong list shrinks, energy moves by
    O(cutoff), weak t2 rows stay at local MP2, and t1 stays finite."""
    import numpy as np

    wfn = scf("H2O", "cc-pvdz", freeze_core=False)
    with contextlib.redirect_stdout(io.StringIO()):
        cc0 = pycc_tpu.ccwfn(wfn, model="CCSD", local="PNO",
                             local_cutoff=1e-5, it2_opt=False)
        e0 = cc0.lccwfn.solve_lcc(1e-12, 1e-12, maxiter=100)
        cc = pycc_tpu.ccwfn(wfn, model="CCSD", local="PNO",
                            local_cutoff=1e-5, it2_opt=False,
                            pair_cutoff=1e-3)
        e = cc.lccwfn.solve_lcc(1e-12, 1e-12, maxiter=100)
    lw = cc.lccwfn
    P, no = lw._pre["P"], lw.no
    assert P < no ** 2
    assert 0 < abs(e - e0) < 2e-2
    pidx = np.asarray(lw._pre["pidx"]).reshape(-1)
    t2_mp2 = np.asarray(-lw.H.ERI[lw.o, lw.o, lw.v, lw.v]
                        .reshape(no * no, lw.nv, lw.nv))
    QLp = np.asarray(lw.Local.QLp)
    t2_mp2 = np.einsum("pva,pvw,pwb->pab", QLp, t2_mp2, QLp) \
        / np.asarray(lw._Dloc)
    t2_fin = np.asarray(lw.t2)
    weak = pidx < 0
    assert weak.any()
    assert np.max(np.abs(t2_fin[weak] - t2_mp2[weak])) < 1e-13
    assert np.all(np.isfinite(np.asarray(lw.t1)))


def test_pair_screened_rejects_unsupported_combinations():
    import pytest

    wfn = scf("H2O", "cc-pvdz", freeze_core=False)
    with pytest.raises(Exception, match="pair_cutoff"):
        pycc_tpu.ccwfn(wfn, model="CC2", local="PNO", local_cutoff=1e-5,
                       pair_cutoff=1e-4)
    with pytest.raises(Exception, match="pair_cutoff"):
        pycc_tpu.ccwfn(wfn, model="CCD", pair_cutoff=1e-4)
