"""Real-time CCSD under a gaussian pulse, with spectra post-processing."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pycc_tpu
from pycc_tpu.data import moldict
from pycc_tpu.rt.integrators import rk4
from pycc_tpu.rt.lasers import gaussian_laser
from pycc_tpu.rt.utils import FT

wfn = pycc_tpu.scf.run_rhf(moldict["He"], "cc-pvdz", freeze_core=False)
cc = pycc_tpu.ccwfn(wfn)
cc.solve_cc(1e-12, 1e-12)
hbar = pycc_tpu.cchbar(cc)
lam = pycc_tpu.cclambda(cc, hbar)
lam.solve_lambda(1e-12, 1e-12)
dens = pycc_tpu.ccdensity(cc, lam)

V = gaussian_laser(0.01, 0, 0.01, center=0.05)
rt = pycc_tpu.rtcc(cc, lam, dens, V)
y0 = rt.collect_amps(cc.t1, cc.t2, lam.l1, lam.l2, 0).astype("complex128")
ret = rt.propagate(rk4(0.05), y0, 5.0, ti=0)
mu_z = np.array([complex(v["mu_z"]).real for v in ret.values()])
freq, spec = FT(mu_z - mu_z[0], dt=0.05)
print("dominant excitation (a.u.):", freq[np.argmax(np.abs(spec))])
