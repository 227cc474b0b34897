"""Synthetic Hamiltonians for benchmarks, sharding dry-runs, and unit tests.

Generates a physically-shaped (Hermitian-symmetric, diagonally-dominant
Fock, 8-fold-symmetric ERI) active-space Hamiltonian at arbitrary (no, nv)
so solver/benchmark code can run at sizes where real integrals would not
fit or be needed.  Values are deterministic in the seed.
"""

import numpy as np
import jax.numpy as jnp

from ..hamiltonian import Hamiltonian


def synthetic_hamiltonian(no, nv, seed=0, dtype=jnp.float64, scale=0.05):
    rng = np.random.default_rng(seed)
    nact = no + nv
    eps = np.concatenate([np.linspace(-2.0, -0.5, no),
                          np.linspace(0.3, 3.0, nv)])
    F = np.diag(eps) + scale * 0.01 * _sym(rng.standard_normal((nact, nact)))
    # 8-fold permutational symmetry in chemists notation, then -> Dirac
    A = rng.standard_normal((nact,) * 4) * scale
    A = A + A.transpose(1, 0, 2, 3)
    A = A + A.transpose(0, 1, 3, 2)
    A = A + A.transpose(2, 3, 0, 1)
    ERI = A.swapaxes(1, 2)  # <pq|rs>
    L = 2.0 * ERI - ERI.swapaxes(2, 3)
    return Hamiltonian(F=jnp.asarray(F, dtype=dtype),
                       ERI=jnp.asarray(ERI, dtype=dtype),
                       L=jnp.asarray(L, dtype=dtype),
                       no=no)


def mp2_guess(H):
    no = H.no
    o, v = H.o, H.v
    eps = jnp.diag(H.F)
    Dijab = (eps[o, None, None, None] + eps[None, o, None, None]
             - eps[None, None, v, None] - eps[None, None, None, v])
    t1 = jnp.zeros((no, H.F.shape[0] - no), dtype=H.F.dtype)
    t2 = H.ERI[o, o, v, v] / Dijab
    return t1, t2, Dijab


def _sym(x):
    return 0.5 * (x + x.T)
