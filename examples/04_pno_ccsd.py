"""PNO-CCSD: local-correlation truncation of the virtual space."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
jax.config.update("jax_platforms", "cpu")

import pycc_tpu
from pycc_tpu.data import moldict

wfn = pycc_tpu.scf.run_rhf(moldict["H2O"], "cc-pvdz", freeze_core=False)
cc = pycc_tpu.ccwfn(wfn, local="PNO", local_cutoff=1e-5)
print("simulation path:", cc.solve_cc(1e-10, 1e-10))
print("native local solver:", cc.lccwfn.solve_lcc(1e-10, 1e-10))
