"""MO-basis normal-ordered Hamiltonian as an immutable JAX pytree.

Mirrors the role of the reference Hamiltonian object
(/root/reference/pycc/hamiltonian.py:9-75): Fock matrix F, Dirac-notation
ERI <pq|rs>, spin-adapted L = 2<pq|rs> - <pq|sr>, and one-electron property
integrals (electric dipole mu, magnetic dipole m, linear momentum p,
traceless quadrupole Q) over the active MO space.  All arrays are device
arrays; the object is a registered pytree so it can flow through jit/pjit.
"""

from dataclasses import dataclass, field
import numpy as np
import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class Hamiltonian:
    F: jnp.ndarray
    ERI: jnp.ndarray
    L: jnp.ndarray
    mu: tuple = ()        # 3 (nact,nact) real matrices (electric dipole, -r)
    m: tuple = ()         # 3 complex matrices (magnetic dipole)
    p: tuple = ()         # 3 complex matrices (linear momentum)
    Q: tuple = ()         # 6 real matrices (traceless quadrupole, XX..ZZ)
    no: int = field(default=0, metadata={"static": True})

    def tree_flatten(self):
        return ((self.F, self.ERI, self.L, self.mu, self.m, self.p, self.Q),
                (self.no,))

    @classmethod
    def tree_unflatten(cls, aux, children):
        F, ERI, L, mu, m, p, Q = children
        return cls(F=F, ERI=ERI, L=L, mu=mu, m=m, p=p, Q=Q, no=aux[0])

    # occupied/virtual slices (static)
    @property
    def o(self):
        return slice(0, self.no)

    @property
    def v(self):
        return slice(self.no, None)


def _mo_eri_dirac(ERI_ao, C):
    """AO (ab|cd) -> MO <pq|rs> (physicists) via four quarter transforms."""
    t = np.einsum("abcd,ap->pbcd", ERI_ao, C, optimize=True)
    t = np.einsum("pbcd,br->prcd", t, C, optimize=True)
    t = np.einsum("prcd,cq->prqd", t, C, optimize=True)
    t = np.einsum("prqd,ds->prqs", t, C, optimize=True)  # (pr|qs) chemists
    return t.swapaxes(1, 2)  # <pq|rs>


def build_hamiltonian(wfn, C=None, dtype=jnp.float64, host=False, eri=True):
    """Build the active-space Hamiltonian pytree from an SCF wavefunction.

    `wfn` is a pycc_tpu.scf.RHFWavefunction (or anything with the same
    Psi4-style accessors).  Property integrals are computed from the basis.
    `C` optionally overrides the active MO coefficients (e.g. localized
    occupied orbitals).

    host=True keeps F/ERI/L as host (numpy) arrays so nothing nact^4-sized
    is committed to the accelerator: used by ccwfn(storage='blocked'),
    which ships only the six unique Dirac blocks to the device.  Consumers
    that do touch the dense tensors (HBAR, full-tensor triples) then pay a
    per-call host->device transfer.

    eri=False skips the four-index tensors entirely (ERI=L=None): the
    integral-direct DF path (ccwfn(storage='df', df_direct=True)) carries
    the two-electron integrals as Cholesky factors instead, so nothing
    nao^4- or nact^4-sized exists anywhere.
    """
    from .scf import integrals as ints

    if C is None:
        C = np.asarray(wfn.Ca_subset("AO", "ACTIVE"))
    C = np.asarray(C)
    F = C.T @ np.asarray(wfn.Fa()) @ C

    basis = wfn.basisset()
    if eri:
        ERI_ao = ints.eri(basis)
        ERI = _mo_eri_dirac(ERI_ao, C)
        L = 2.0 * ERI - ERI.swapaxes(2, 3)
    else:
        ERI = L = None

    mu = tuple(jnp.asarray(C.T @ M @ C, dtype=dtype) for M in ints.dipole(basis))
    m = tuple(jnp.asarray((C.T @ (M * -0.5) @ C) * 1.0j) for M in ints.angular_momentum(basis))
    p = tuple(jnp.asarray((C.T @ M @ C) * 1.0j) for M in ints.nabla(basis))
    Q = tuple(jnp.asarray(C.T @ M @ C, dtype=dtype) for M in ints.traceless_quadrupole(basis))

    no = wfn.doccpi()[0] - wfn.frzcpi()[0]
    if not eri:
        return Hamiltonian(F=F, ERI=None, L=None, mu=mu, m=m, p=p, Q=Q,
                           no=no)
    if host:
        as_np = np.float64 if dtype == jnp.float64 else np.float32
        return Hamiltonian(F=F.astype(as_np), ERI=ERI.astype(as_np),
                           L=L.astype(as_np), mu=mu, m=m, p=p, Q=Q, no=no)
    return Hamiltonian(F=jnp.asarray(F, dtype=dtype),
                       ERI=jnp.asarray(ERI, dtype=dtype),
                       L=jnp.asarray(L, dtype=dtype),
                       mu=mu, m=m, p=p, Q=Q, no=no)
