"""Similarity-transformed Hamiltonian HBAR = e^{-T} H e^{T} (one/two-body).

Functional rebuild of /root/reference/pycc/cchbar.py:14-375: the 11 blocks
are produced by a single pure function (one jitted graph), parameterized by
the Fock matrix so the real-time module can rebuild HBAR under a
field-dressed F without any object mutation.  Blocks live in an immutable
pytree that flows through jit/pjit.
"""

import time
from dataclasses import dataclass

import jax
from .utils.timing import timers
import jax.numpy as jnp

from .models.ccsd import build_tau, slices
from .ops.contract import contract
from .utils.log import logger as log


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class HBar:
    Hov: jnp.ndarray
    Hvv: jnp.ndarray
    Hoo: jnp.ndarray
    Hoooo: jnp.ndarray
    Hvvvv: jnp.ndarray
    Hvovv: jnp.ndarray
    Hooov: jnp.ndarray
    Hovvo: jnp.ndarray
    Hovov: jnp.ndarray
    Hvvvo: jnp.ndarray
    Hovoo: jnp.ndarray

    def tree_flatten(self):
        return ((self.Hov, self.Hvv, self.Hoo, self.Hoooo, self.Hvvvv,
                 self.Hvovv, self.Hooov, self.Hovvo, self.Hovov,
                 self.Hvvvo, self.Hovoo), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def build_hbar(model, F, ERI, L, t1, t2, no):
    """All HBAR blocks for the given model ('CCSD'/'CCSD(T)'/'CC3' share the
    CCSD forms; 'CCD' and 'CC2' have their own)."""
    o, v = slices(no)
    tau = build_tau(t1, t2)
    ccd = model == "CCD"
    cc2 = model == "CC2"

    if ccd:
        Hov = F[o, v]
        Hvv = F[v, v] - contract("mnfa,mnfe->ae", t2, L[o, o, v, v])
        Hoo = F[o, o] + contract("inef,mnef->mi", t2, L[o, o, v, v])
        Hoooo = ERI[o, o, o, o] + contract("ijef,mnef->mnij", t2, ERI[o, o, v, v])
        Hvvvv = ERI[v, v, v, v] + contract("mnab,mnef->abef", t2, ERI[o, o, v, v])
        Hvovv = ERI[v, o, v, v]
        Hooov = ERI[o, o, o, v]
        Hovvo = (ERI[o, v, v, o]
                 - contract("jnfb,mnef->mbej", t2, ERI[o, o, v, v])
                 + contract("njfb,mnef->mbej", t2, L[o, o, v, v]))
        Hovov = ERI[o, v, o, v] - contract("jnfb,nmef->mbje", t2, ERI[o, o, v, v])
        Hvvvo = (ERI[v, v, v, o]
                 - contract("me,miab->abei", Hov, t2)
                 + contract("mnab,mnei->abei", tau, ERI[o, o, v, o])
                 - contract("imfa,bmfe->abei", t2, ERI[v, o, v, v])
                 - contract("imfb,amef->abei", t2, ERI[v, o, v, v])
                 + contract("mifb,amef->abei", t2, L[v, o, v, v]))
        Hovoo = (ERI[o, v, o, o]
                 + contract("me,ijeb->mbij", Hov, t2)
                 + contract("ijef,mbef->mbij", t2, ERI[o, v, v, v])
                 - contract("ineb,nmje->mbij", t2, ERI[o, o, o, v])
                 - contract("jneb,mnie->mbij", t2, ERI[o, o, o, v])
                 + contract("njeb,mnie->mbij", t2, L[o, o, o, v]))
        return HBar(Hov, Hvv, Hoo, Hoooo, Hvvvv, Hvovv, Hooov, Hovvo,
                    Hovov, Hvvvo, Hovoo)

    Hov = F[o, v] + contract("nf,mnef->me", t1, L[o, o, v, v])
    Hvv = (F[v, v]
           - contract("me,ma->ae", F[o, v], t1)
           + contract("mf,amef->ae", t1, L[v, o, v, v])
           - contract("mnfa,mnfe->ae", tau, L[o, o, v, v]))
    Hoo = (F[o, o]
           + contract("ie,me->mi", t1, F[o, v])
           + contract("ne,mnie->mi", t1, L[o, o, o, v])
           + contract("inef,mnef->mi", tau, L[o, o, v, v]))

    tmp = contract("je,mnie->mnij", t1, ERI[o, o, o, v])
    Hoooo = ERI[o, o, o, o] + tmp + tmp.transpose(1, 0, 3, 2)
    if cc2:
        Hoooo = Hoooo + contract("jf,mnif->mnij", t1,
                                 contract("ie,mnef->mnif", t1, ERI[o, o, v, v]))
    else:
        Hoooo = Hoooo + contract("ijef,mnef->mnij", tau, ERI[o, o, v, v])

    tmp = contract("mb,amef->abef", t1, ERI[v, o, v, v])
    Hvvvv = ERI[v, v, v, v] - tmp - tmp.transpose(1, 0, 3, 2)
    if cc2:
        Hvvvv = Hvvvv + contract("nb,anef->abef", t1,
                                 contract("ma,mnef->anef", t1, ERI[o, o, v, v]))
    else:
        Hvvvv = Hvvvv + contract("mnab,mnef->abef", tau, ERI[o, o, v, v])

    Hvovv = ERI[v, o, v, v] - contract("na,nmef->amef", t1, ERI[o, o, v, v])
    Hooov = ERI[o, o, o, v] + contract("if,nmef->mnie", t1, ERI[o, o, v, v])

    Hovvo = (ERI[o, v, v, o]
             + contract("jf,mbef->mbej", t1, ERI[o, v, v, v])
             - contract("nb,mnej->mbej", t1, ERI[o, o, v, o]))
    Hovov = (ERI[o, v, o, v]
             + contract("jf,bmef->mbje", t1, ERI[v, o, v, v])
             - contract("nb,mnje->mbje", t1, ERI[o, o, o, v]))
    if not cc2:
        Hovvo = (Hovvo
                 - contract("jnfb,mnef->mbej", tau, ERI[o, o, v, v])
                 + contract("njfb,mnef->mbej", t2, L[o, o, v, v]))
        Hovov = Hovov - contract("jnfb,nmef->mbje", tau, ERI[o, o, v, v])

    if cc2:
        Hvvvo = (ERI[v, v, v, o]
                 - contract("me,miab->abei", F[o, v], t2)
                 + contract("if,abef->abei", t1, Hvvvv)
                 + contract("nb,anei->abei", t1,
                            contract("ma,mnei->anei", t1, ERI[o, o, v, o]))
                 - contract("mb,amei->abei", t1, ERI[v, o, v, o])
                 - contract("ma,bmie->abei", t1, ERI[v, o, o, v]))
        Hovoo = (ERI[o, v, o, o]
                 + contract("me,ijeb->mbij", F[o, v], t2)
                 - contract("nb,mnij->mbij", t1, Hoooo)
                 + contract("jf,mbif->mbij", t1,
                            contract("ie,mbef->mbif", t1, ERI[o, v, v, v]))
                 + contract("je,mbie->mbij", t1, ERI[o, v, o, v])
                 + contract("ie,bmje->mbij", t1, ERI[v, o, o, v]))
    else:
        Hvvvo = (ERI[v, v, v, o]
                 - contract("me,miab->abei", Hov, t2)
                 + contract("if,abef->abei", t1, Hvvvv)
                 + contract("mnab,mnei->abei", tau, ERI[o, o, v, o])
                 - contract("imfa,bmfe->abei", t2, ERI[v, o, v, v])
                 - contract("imfb,amef->abei", t2, ERI[v, o, v, v])
                 + contract("mifb,amef->abei", t2, L[v, o, v, v]))
        tmp = ERI[v, o, v, o] - contract("infa,mnfe->amei", t2, ERI[o, o, v, v])
        Hvvvo = Hvvvo - contract("mb,amei->abei", t1, tmp)
        tmp = (ERI[v, o, o, v]
               - contract("infb,mnef->bmie", t2, ERI[o, o, v, v])
               + contract("nifb,mnef->bmie", t2, L[o, o, v, v]))
        Hvvvo = Hvvvo - contract("ma,bmie->abei", t1, tmp)

        Hovoo = (ERI[o, v, o, o]
                 + contract("me,ijeb->mbij", Hov, t2)
                 - contract("nb,mnij->mbij", t1, Hoooo)
                 + contract("ijef,mbef->mbij", tau, ERI[o, v, v, v])
                 - contract("ineb,nmje->mbij", t2, ERI[o, o, o, v])
                 - contract("jneb,mnie->mbij", t2, ERI[o, o, o, v])
                 + contract("njeb,mnie->mbij", t2, L[o, o, o, v]))
        tmp = ERI[o, v, o, v] - contract("infb,mnfe->mbie", t2, ERI[o, o, v, v])
        Hovoo = Hovoo + contract("je,mbie->mbij", t1, tmp)
        tmp = (ERI[v, o, o, v]
               - contract("jnfb,mnef->bmje", t2, ERI[o, o, v, v])
               + contract("njfb,mnef->bmje", t2, L[o, o, v, v]))
        Hovoo = Hovoo + contract("ie,bmje->mbij", t1, tmp)

    return HBar(Hov, Hvv, Hoo, Hoooo, Hvvvv, Hvovv, Hooov, Hovvo, Hovov,
                Hvvvo, Hovoo)


class cchbar:
    """API-parity wrapper: cchbar(ccwfn) exposes the 11 blocks as attrs."""

    def __init__(self, ccwfn):
        t0 = time.time()
        self._timer = timers.time("hbar.build")
        self._timer.__enter__()
        self.ccwfn = ccwfn
        if getattr(ccwfn, "storage", "full") == "df":
            # factor-implicit HBAR: blocks > o^3 v never exist (the dense
            # reference stops here — /root/reference/pycc/cchbar.py:170-327
            # requires the v^4 / o v^3 tensors); Lambda/EOM consume the
            # dressed factors instead (models/dfhbar.py)
            from .models.dfhbar import build_hbar_df

            if ccwfn.model not in ("CCD", "CC2", "CCSD", "CCSD(T)", "CC3"):
                # CCD: the CCSD forms reduce to the CCD ones at t1 = 0;
                # CC3 consumes the CCSD forms (as in the dense branch,
                # cclambda.lambda_residuals_from_F:101)
                raise Exception("storage='df' HBAR supports CCD/CC2/CCSD/"
                                "CCSD(T)/CC3 only (got %s)" % ccwfn.model)
            hbar = jax.jit(build_hbar_df, static_argnums=(4, 5))(
                jnp.asarray(ccwfn.H.F), ccwfn.dfb, ccwfn.t1, ccwfn.t2,
                ccwfn.no, ccwfn.model if ccwfn.model == "CC2" else "CCSD")
            if getattr(ccwfn, "mesh", None) is not None:
                from .parallel import shard_hbar
                hbar = shard_hbar(hbar, ccwfn.mesh)
            self.hbar = hbar
            for name in ("Hov", "Hvv", "Hoo", "Hoooo", "Hooov", "Hovvo",
                         "Hovov", "Hovoo"):
                setattr(self, name, getattr(hbar, name))
            self._timer.__exit__(None, None, None)
            del self._timer
            log.info("\nHBAR (DF) constructed in %.3f seconds.\n"
                  % (time.time() - t0))
            return
        if getattr(ccwfn, "storage", "full") == "blocked":
            # build from the six Dirac blocks: the full ERI + L pair would
            # not even fit beside the HBAR blocks at production sizes
            from .models.blocked import blocked_views

            def _from_blocks(F, blocks, t1, t2):
                bE, bL = blocked_views(blocks, ccwfn.no)
                return build_hbar(ccwfn.model, F, bE, bL, t1, t2, ccwfn.no)

            hbar = jax.jit(_from_blocks)(jnp.asarray(ccwfn.H.F),
                                         ccwfn.blocks, ccwfn.t1, ccwfn.t2)
        else:
            hbar = jax.jit(build_hbar, static_argnums=(0, 6))(
                ccwfn.model, ccwfn.H.F, ccwfn.H.ERI, ccwfn.H.L,
                ccwfn.t1, ccwfn.t2, ccwfn.no)
        if getattr(ccwfn, "mesh", None) is not None:
            from .parallel import shard_hbar
            hbar = shard_hbar(hbar, ccwfn.mesh)
        self.hbar = hbar
        for name in ("Hov", "Hvv", "Hoo", "Hoooo", "Hvvvv", "Hvovv",
                     "Hooov", "Hovvo", "Hovov", "Hvvvo", "Hovoo"):
            setattr(self, name, getattr(hbar, name))
        self._timer.__exit__(None, None, None)
        del self._timer
        log.info("\nHBAR constructed in %.3f seconds.\n" % (time.time() - t0))
