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
