"""Shard the CCSD step over a device mesh (run with
XLA_FLAGS=--xla_force_host_platform_device_count=8 for a virtual mesh)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
from pycc_tpu.models import ccsd as eqs
from pycc_tpu.parallel import make_mesh, shard_amps, shard_hamiltonian
from pycc_tpu.utils import mp2_guess, synthetic_hamiltonian

mesh = make_mesh()
print("mesh:", mesh)
H = synthetic_hamiltonian(8, 32 * mesh.devices.size, seed=0)
t1, t2, _ = mp2_guess(H)
H = shard_hamiltonian(H, mesh)
t1, t2 = shard_amps(t1, t2, mesh)
r1, r2 = jax.jit(lambda F, E, L, a, b: eqs.residuals_ccsd(F, E, L, a, b, H.no))(
    H.F, H.ERI, H.L, t1, t2)
print("sharded residual norms:", float(abs(r1).max()), float(abs(r2).max()))
