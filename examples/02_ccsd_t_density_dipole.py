"""CCSD(T) with full triples density, Lambda, and the dipole moment."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
jax.config.update("jax_platforms", "cpu")

import pycc_tpu
from pycc_tpu.data import moldict

wfn = pycc_tpu.scf.run_rhf(moldict["H2O"], "cc-pvdz", freeze_core=False)
cc = pycc_tpu.ccwfn(wfn, model="CCSD(T)", make_t3_density=True)
cc.solve_cc(1e-10, 1e-10)
hbar = pycc_tpu.cchbar(cc)
lam = pycc_tpu.cclambda(cc, hbar)
lam.solve_lambda(1e-10, 1e-10)
dens = pycc_tpu.ccdensity(cc, lam)
print("density-based Ecorr =", dens.compute_energy())
rt = pycc_tpu.rtcc(cc, lam, dens, None)
print("CC dipole =", rt.dipole(cc.t1, cc.t2, lam.l1, lam.l2))
