"""CCSD(T) with full T3 density: Lambda + density-based energies vs frozen
Psi4 values (test_034_ccsd_t_density.py, STO-3G block)."""

import contextlib
import io

import pycc_tpu
from pycc_tpu.scf import run_rhf
from pycc_tpu.triples import t_tjl

GEOM = """
O 0.000000000000000   0.000000000000000   0.143225857166674
H 0.000000000000000  -1.638037301628121  -1.136549142277225
H 0.000000000000000   1.638037301628121  -1.136549142277225
symmetry c1
units bohr
"""


def test_ccsd_t_density_sto3g():
    wfn = run_rhf(GEOM, "sto-3g", freeze_core=False)
    with contextlib.redirect_stdout(io.StringIO()):
        cc = pycc_tpu.ccwfn(wfn, model="ccsd(t)", make_t3_density=True)
        ecc = cc.solve_cc(1e-12, 1e-12, 75, max_diis=0)
        # internal oracle: density-based (T) equals the Lee/Rendell energy
        eccsd = float(cc.cc_energy(cc.t1, cc.t2).real)
        assert abs((ecc - eccsd) - float(t_tjl(cc))) < 1e-14
        hbar = pycc_tpu.cchbar(cc)
        lam = pycc_tpu.cclambda(cc, hbar)
        lcc = lam.solve_lambda(1e-12, 1e-12, 75, max_diis=0)
        dens = pycc_tpu.ccdensity(cc, lam)
        dens.compute_energy()
    assert abs(lcc - -0.069084521221746) < 1e-11
    assert abs(dens.eone - 0.104463374777302) < 1e-11
    assert abs(dens.etwo - -0.175243393781829) < 1e-11


def test_ccsd_t_density_scan_sto3g():
    """Per-(i,j) slab (T)-density (t3_scan=True) reproduces the same frozen
    Psi4 oracles as the full-tensor path — O(no v^3) working memory."""
    wfn = run_rhf(GEOM, "sto-3g", freeze_core=False)
    with contextlib.redirect_stdout(io.StringIO()):
        cc = pycc_tpu.ccwfn(wfn, model="ccsd(t)", make_t3_density=True,
                            t3_scan=True)
        ecc = cc.solve_cc(1e-12, 1e-12, 75, max_diis=0)
        eccsd = float(cc.cc_energy(cc.t1, cc.t2).real)
        assert abs((ecc - eccsd) - float(t_tjl(cc))) < 1e-14
        hbar = pycc_tpu.cchbar(cc)
        lam = pycc_tpu.cclambda(cc, hbar)
        lcc = lam.solve_lambda(1e-12, 1e-12, 75, max_diis=0)
        dens = pycc_tpu.ccdensity(cc, lam)
        dens.compute_energy()
    assert abs(lcc - -0.069084521221746) < 1e-11
    assert abs(dens.eone - 0.104463374777302) < 1e-11
    assert abs(dens.etwo - -0.175243393781829) < 1e-11


def test_t3_density_scan_matches_full():
    """All nine scan outputs (ET, Doo, Dvv, Dov, Goovv, Gooov, Gvvvo, S1,
    S2) equal the full-tensor builder's to machine precision (cc-pVDZ)."""
    import numpy as np
    from pycc_tpu.triples import t3_density, t3_density_scan
    from .common import scf
    wfn = scf("H2O", "cc-pvdz", freeze_core=True)
    with contextlib.redirect_stdout(io.StringIO()):
        cc = pycc_tpu.ccwfn(wfn)
        cc.solve_cc(1e-12, 1e-12)
    keys = ("Doo_t3", "Dvv_t3", "Dov_t3", "Goovv", "Gooov", "Gvvvo",
            "S1", "S2")
    ET_full = float(t3_density(cc))
    full = {k: np.asarray(getattr(cc, k)) for k in keys}
    for k in keys:
        delattr(cc, k)
    ET_scan = float(t3_density_scan(cc))
    assert abs(ET_full - ET_scan) < 1e-15
    for k in keys:
        assert np.abs(full[k] - np.asarray(getattr(cc, k))).max() < 1e-13, k
