"""CC linear-response functions (dynamic polarizabilities etc.).

Rebuild of /root/reference/pycc/ccresponse.py:13-861: similarity-transformed
perturbations (pertbar), iterative perturbed-amplitude solvers solve_right
(X) / solve_left (Y) sharing the jitted DIIS scaffold, and the asymmetric
linear-response function linresp_asym.  The reference's partially-broken
`linresp` (ccresponse.py:288-296) is intentionally not reproduced.
"""

import time
import warnings

import jax
import jax.numpy as jnp
import numpy as np

from .cclambda import build_Goo, build_Gvv
from .models.ccsd import slices, vvvv_contract, vvvv_contract_efab
from .ops.contract import contract
from .ops.diis import DIIS
from .utils.timing import timers
from .utils.log import logger as log

CART = ["X", "Y", "Z"]


class pertbar:
    """Similarity-transformed one-electron perturbation blocks.

    In storage='df' mode the o v^3 Avvvo block is never materialized
    (7.5 GB at (40,360)); its two consumers (in_Y1, linresp_asym)
    reduce it to o^2 intermediates against the stored pert_ov
    (models/dfresponse.py)."""

    def __init__(self, pert, ccwfn):
        o, v = ccwfn.o, ccwfn.v
        t1, t2 = ccwfn.t1, ccwfn.t2
        self.Aov = pert[o, v]
        self.pert_ov = self.Aov
        self.Aoo = pert[o, o] + contract("ie,me->mi", t1, pert[o, v])
        self.Avv = pert[v, v] - contract("ma,me->ae", t1, pert[o, v])
        Avo = pert[v, o]
        Avo += contract("ie,ae->ai", t1, pert[v, v])
        Avo -= contract("ma,mi->ai", t1, pert[o, o])
        Avo += contract("miea,me->ai", 2.0 * t2 - t2.swapaxes(2, 3), pert[o, v])
        Avo -= contract("ie,ma,me->ai", t1, t1, pert[o, v])
        self.Avo = Avo
        self.Aovoo = contract("ijeb,me->mbij", t2, pert[o, v])
        if getattr(ccwfn, "storage", "full") != "df":
            self.Avvvo = -1.0 * contract("miab,me->abei", t2, pert[o, v])
        Avvoo = contract("ijeb,ae->ijab", t2, self.Avv)
        Avvoo -= contract("mjab,mi->ijab", t2, self.Aoo)
        self.Avvoo = 0.5 * (Avvoo + Avvoo.transpose(1, 0, 3, 2))


class _OovvOnly:
    """Shim exposing only the [o,o,v,v] block (all the response equations
    need from ERI/L); keeps big tensors out of jit closures and works with
    blocked (host-side dense) storage."""

    def __init__(self, block):
        self.block = block

    def __getitem__(self, key):
        return self.block


def _oovv(x, no):
    o = slice(0, no)
    v = slice(no, None)
    return _OovvOnly(jnp.asarray(np.asarray(x)[o, o, v, v]))


def _oovv_from_cc(cc, kind):
    """oovv slice of ERI or L without requiring a host dense tensor:
    under blocked storage assemble it on device from the oovv Dirac
    block (L = 2<ij|ab> - <ij|ba>); otherwise slice cc.H."""
    if getattr(cc, "storage", "full") == "blocked":
        x = cc.blocks.oovv
        if kind == "L":
            x = jax.jit(lambda b: 2.0 * b - jnp.swapaxes(b, 2, 3))(x)
        return _OovvOnly(x)
    return _oovv(cc.H.L if kind == "L" else cc.H.ERI, cc.no)


def build_response_aux(hb):
    """Pre-laid spin-adapted combinations of the HBAR blocks, built ONCE
    per response object and passed into the jitted steps as arguments.

    The r_X/r_Y/in_Y equations repeatedly need 2*H - H^swap of the same
    three blocks; materializing those ov^3 combinations INSIDE the jitted
    step replicates the layout copy per iteration — the same pattern that
    compile-OOM'd the batched EOM sigma at (32,128) before its pre-laid
    aux forms (cceom.py).  Hoisting them also consolidates the term pairs
    the dense equations spell out one swap at a time."""
    return dict(
        Hvovv_s=2.0 * hb.Hvovv - hb.Hvovv.swapaxes(2, 3),
        Hooov_s=2.0 * hb.Hooov - hb.Hooov.swapaxes(0, 1),
        Hovvo_s=2.0 * hb.Hovvo - hb.Hovov.swapaxes(2, 3),
    )


def r_X(hb, L, t2, A, omega, X1, X2, no, aux):
    o, v = slices(no)
    r1 = A["Avo"].T - omega * X1
    r1 += contract("ie,ae->ia", X1, hb.Hvv)
    r1 -= contract("ma,mi->ia", X1, hb.Hoo)
    r1 += contract("me,maei->ia", X1, aux["Hovvo_s"])
    r1 += contract("me,miea->ia", hb.Hov, 2.0 * X2 - X2.swapaxes(0, 1))
    r1 += contract("imef,amef->ia", X2, aux["Hvovv_s"])
    r1 -= contract("mnae,mnie->ia", X2, aux["Hooov_s"])

    Zvv = contract("amef,mf->ae", aux["Hvovv_s"], X1)
    Zvv -= contract("mnef,mnaf->ae", L[o, o, v, v], X2)
    Zoo = -1.0 * contract("mnie,ne->mi", aux["Hooov_s"], X1)
    Zoo -= contract("mnef,inef->mi", L[o, o, v, v], X2)

    r2 = A["Avvoo"] - 0.5 * omega * X2
    r2 += contract("ie,abej->ijab", X1, hb.Hvvvo)
    r2 -= contract("ma,mbij->ijab", X1, hb.Hovoo)
    r2 += contract("mi,mjab->ijab", Zoo, t2)
    r2 += contract("ae,ijeb->ijab", Zvv, t2)
    r2 += contract("ijeb,ae->ijab", X2, hb.Hvv)
    r2 -= contract("mjab,mi->ijab", X2, hb.Hoo)
    r2 += 0.5 * contract("mnij,mnab->ijab", hb.Hoooo, X2)
    r2 += 0.5 * vvvv_contract(X2, hb.Hvvvv)
    r2 -= contract("imeb,maje->ijab", X2, hb.Hovov)
    r2 -= contract("imea,mbej->ijab", X2, hb.Hovvo)
    r2 += 2.0 * contract("miea,mbej->ijab", X2, hb.Hovvo)
    r2 -= contract("miea,mbje->ijab", X2, hb.Hovov)
    r2 = r2 + r2.transpose(1, 0, 3, 2)
    return r1, r2


def in_Y1(hb, L, t2, l1, l2, A, X1, X2, no, aux):
    o, v = slices(no)
    r = 2.0 * A["Aov"]
    r -= contract("im,ma->ia", A["Aoo"], l1)
    r += contract("ie,ea->ia", l1, A["Avv"])
    r += contract("imfe,feam->ia", l2, A["Avvvo"])
    r -= 0.5 * contract("ienm,mnea->ia", A["Aovoo"], l2)
    r -= 0.5 * contract("iemn,mnae->ia", A["Aovoo"], l2)

    r += 2.0 * contract("imae,me->ia", L[o, o, v, v], X1)

    tmp = -1.0 * contract("ma,ie->miae", hb.Hov, l1)
    tmp -= contract("ma,ie->miae", l1, hb.Hov)
    tmp -= contract("mina,ne->miae", aux["Hooov_s"], l1)
    tmp -= contract("imne,na->miae", aux["Hooov_s"], l1)
    tmp += contract("fmae,if->miae", aux["Hvovv_s"], l1)
    tmp += contract("fiea,mf->miae", aux["Hvovv_s"], l1)
    r += contract("miae,me->ia", tmp, X1)

    tmp = 2.0 * contract("mnef,nf->me", X2, l1)
    tmp -= contract("mnfe,nf->me", X2, l1)
    r += contract("imae,me->ia", L[o, o, v, v], tmp)
    r -= contract("ni,na->ia", build_Goo(X2, L[o, o, v, v]), l1)
    r += contract("ie,ea->ia", l1, build_Gvv(L[o, o, v, v], X2))

    tmp = -1.0 * contract("nief,mfna->iema", l2, hb.Hovov)
    tmp -= contract("ifne,nmaf->iema", hb.Hovov, l2)
    tmp -= contract("inef,mfan->iema", l2, hb.Hovvo)
    tmp -= contract("ifen,nmfa->iema", hb.Hovvo, l2)
    tmp += 0.5 * contract("imfg,fgae->iema", l2, hb.Hvvvv)
    tmp += 0.5 * contract("imgf,fgea->iema", l2, hb.Hvvvv)
    tmp += 0.5 * contract("imno,onea->iema", hb.Hoooo, l2)
    tmp += 0.5 * contract("mino,noea->iema", hb.Hoooo, l2)
    r += contract("iema,me->ia", tmp, X1)

    Gvv_l2t2 = build_Gvv(l2, t2)
    Goo_t2l2 = build_Goo(t2, l2)
    tmp = contract("nb,fb->nf", X1, Gvv_l2t2)
    r += contract("inaf,nf->ia", L[o, o, v, v], tmp)
    tmp = contract("me,fa->mefa", X1, Gvv_l2t2)
    r += contract("mief,mefa->ia", L[o, o, v, v], tmp)
    tmp = contract("me,ni->meni", X1, Goo_t2l2)
    r -= contract("meni,mnea->ia", tmp, L[o, o, v, v])
    tmp = contract("jf,nj->fn", X1, Goo_t2l2)
    r -= contract("inaf,fn->ia", L[o, o, v, v], tmp)

    r -= contract("mi,ma->ia", build_Goo(X2, l2), hb.Hov)
    r += contract("ie,ea->ia", hb.Hov, build_Gvv(l2, X2))
    tmp = contract("imfg,mnef->igne", l2, X2)
    r -= contract("igne,gnea->ia", tmp, hb.Hvovv)
    tmp = contract("mifg,mnef->igne", l2, X2)
    r -= contract("igne,gnae->ia", tmp, hb.Hvovv)
    tmp = contract("mnga,mnef->gaef", l2, X2)
    r -= contract("gief,gaef->ia", hb.Hvovv, tmp)
    tmp = contract("gmae,mnef->ganf", aux["Hvovv_s"], X2)
    r += contract("nifg,ganf->ia", l2, tmp)
    Gvv_X2l2 = build_Gvv(X2, l2)
    r -= contract("giea,ge->ia", aux["Hvovv_s"], Gvv_X2l2)
    tmp = contract("oief,mnef->oimn", l2, X2)
    r += contract("oimn,mnoa->ia", tmp, hb.Hooov)
    tmp = contract("mofa,mnef->oane", l2, X2)
    r += contract("inoe,oane->ia", hb.Hooov, tmp)
    tmp = contract("onea,mnef->oamf", l2, X2)
    r += contract("miof,oamf->ia", hb.Hooov, tmp)
    Goo_X2l2 = build_Goo(X2, l2)
    r -= contract("mioa,mo->ia", aux["Hooov_s"], Goo_X2l2)
    tmp = -1.0 * contract("imoe,mnef->ionf", aux["Hooov_s"], X2)
    r += contract("ionf,nofa->ia", tmp, l2)
    return r


def in_Y2(hb, L, ERI, t2, l1, l2, A, X1, X2, no, aux):
    o, v = slices(no)
    r = 2.0 * contract("ia,jb->ijab", l1, A["Aov"])
    r -= contract("ja,ib->ijab", l1, A["Aov"])
    r += contract("ijeb,ea->ijab", l2, A["Avv"])
    r -= contract("im,mjab->ijab", A["Aoo"], l2)

    tmp = contract("me,ja->meja", X1, l1)
    r -= contract("mieb,meja->ijab", L[o, o, v, v], tmp)
    tmp = contract("me,mb->eb", X1, l1)
    r -= contract("ijae,eb->ijab", L[o, o, v, v], tmp)
    tmp = contract("me,ie->mi", X1, l1)
    r -= contract("mi,jmba->ijab", tmp, L[o, o, v, v])
    tmp = 2.0 * contract("me,jb->mejb", X1, l1)
    r += contract("imae,mejb->ijab", L[o, o, v, v], tmp)

    tmp = contract("me,ma->ea", X1, hb.Hov)
    r -= contract("ijeb,ea->ijab", l2, tmp)
    tmp = contract("me,ie->mi", X1, hb.Hov)
    r -= contract("mi,jmba->ijab", tmp, l2)
    tmp = contract("me,ijef->mijf", X1, l2)
    r -= contract("mijf,fmba->ijab", tmp, hb.Hvovv)
    tmp = contract("me,imbf->eibf", X1, l2)
    r -= contract("eibf,fjea->ijab", tmp, hb.Hvovv)
    tmp = contract("me,jmfa->ejfa", X1, l2)
    r -= contract("fibe,ejfa->ijab", hb.Hvovv, tmp)
    tmp = contract("me,fmae->fa", X1, aux["Hvovv_s"])
    r += contract("ijfb,fa->ijab", l2, tmp)
    tmp = contract("me,fiea->mfia", X1, aux["Hvovv_s"])
    r += contract("mfia,jmbf->ijab", tmp, l2)
    tmp = contract("me,jmna->ejna", X1, hb.Hooov)
    r += contract("ineb,ejna->ijab", l2, tmp)
    tmp = contract("me,mjna->ejna", X1, hb.Hooov)
    r += contract("nieb,ejna->ijab", l2, tmp)
    tmp = contract("me,nmba->enba", X1, l2)
    r += contract("jine,enba->ijab", hb.Hooov, tmp)
    tmp = contract("me,mina->eina", X1, aux["Hooov_s"])
    r -= contract("eina,njeb->ijab", tmp, l2)
    tmp = contract("me,imne->in", X1, aux["Hooov_s"])
    r -= contract("in,jnba->ijab", tmp, l2)

    tmp = 0.5 * contract("ijef,mnef->ijmn", l2, X2)
    r += contract("ijmn,mnab->ijab", tmp, ERI[o, o, v, v])
    tmp = 0.5 * contract("ijfe,mnef->ijmn", ERI[o, o, v, v], X2)
    r += contract("ijmn,mnba->ijab", tmp, l2)
    tmp = contract("mifb,mnef->ibne", l2, X2)
    r += contract("ibne,jnae->ijab", tmp, ERI[o, o, v, v])
    tmp = contract("imfb,mnef->ibne", l2, X2)
    r += contract("ibne,njae->ijab", tmp, ERI[o, o, v, v])
    tmp = contract("mjfb,mnef->jbne", l2, X2)
    r -= contract("jbne,inae->ijab", tmp, L[o, o, v, v])
    r -= contract("in,jnba->ijab", build_Goo(L[o, o, v, v], X2), l2)
    r += contract("ijfb,af->ijab", l2, build_Gvv(X2, L[o, o, v, v]))
    r += contract("ijae,be->ijab", L[o, o, v, v], build_Gvv(X2, l2))
    r -= contract("imab,jm->ijab", L[o, o, v, v], build_Goo(l2, X2))
    tmp = contract("nifb,mnef->ibme", l2, X2)
    r -= contract("ibme,mjea->ijab", tmp, L[o, o, v, v])
    tmp = 2.0 * contract("njfb,mnef->jbme", l2, X2)
    r += contract("imae,jbme->ijab", L[o, o, v, v], tmp)
    return r


def r_Y(hb, L, t2, imY1, imY2, omega, Y1, Y2, no, aux):
    o, v = slices(no)
    r1 = imY1 + omega * Y1
    r1 += contract("ie,ea->ia", Y1, hb.Hvv)
    r1 -= contract("im,ma->ia", hb.Hoo, Y1)
    r1 += contract("ieam,me->ia", aux["Hovvo_s"], Y1)
    r1 += contract("imef,efam->ia", Y2, hb.Hvvvo)
    r1 -= contract("iemn,mnae->ia", hb.Hovoo, Y2)
    Gvv_t2Y2 = build_Gvv(t2, Y2)
    r1 -= contract("eifa,ef->ia", aux["Hvovv_s"], Gvv_t2Y2)
    Goo_t2Y2 = build_Goo(t2, Y2)
    r1 -= contract("mina,mn->ia", aux["Hooov_s"], Goo_t2Y2)

    r2 = imY2 + 0.5 * omega * Y2
    r2 += 2.0 * contract("ia,jb->ijab", Y1, hb.Hov)
    r2 -= contract("ja,ib->ijab", Y1, hb.Hov)
    r2 += contract("ijeb,ea->ijab", Y2, hb.Hvv)
    r2 -= contract("im,mjab->ijab", hb.Hoo, Y2)
    r2 += 0.5 * contract("ijmn,mnab->ijab", hb.Hoooo, Y2)
    r2 += 0.5 * vvvv_contract_efab(Y2, hb.Hvvvv)
    r2 += contract("ie,ejab->ijab", Y1, aux["Hvovv_s"])
    r2 -= contract("mb,jima->ijab", Y1, aux["Hooov_s"])
    r2 += contract("ieam,mjeb->ijab", aux["Hovvo_s"], Y2)
    r2 -= contract("mibe,jema->ijab", Y2, hb.Hovov)
    r2 -= contract("mieb,jeam->ijab", Y2, hb.Hovvo)
    r2 += contract("ijeb,ae->ijab", L[o, o, v, v], Gvv_t2Y2)
    r2 -= contract("mi,mjab->ijab", Goo_t2Y2, L[o, o, v, v])
    r2 = r2 + r2.transpose(1, 0, 3, 2)
    return r1, r2


class ccresponse:
    """RHF-CC response-property driver (API parity with the reference)."""

    def __init__(self, ccdensity, omega1=0, omega2=0):
        self.ccwfn = ccdensity.ccwfn
        self.cclambda = ccdensity.cclambda
        self.cart = CART
        self._df = getattr(self.ccwfn, "storage", "full") == "df"
        self._rebuild_stage()

    def _rebuild_stage(self, rebuild_hbar=False):
        """(Re)build every piece of response state derived from the
        ccwfn's CURRENT dtype stage: the HBAR reference, the
        similarity-transformed perturbations (they contract the
        operators against t1/t2), the pre-laid spin-adapted HBAR
        combinations, and the HBAR-diagonal denominators.  Called once
        by the constructor and again per stage by the mixed-precision
        solvers (after ccwfn._cast_stage, with rebuild_hbar=True)."""
        if rebuild_hbar:
            from .cchbar import cchbar
            self.cclambda.hbar = cchbar(self.ccwfn)
        self.H = self.ccwfn.H
        self.hbar = self.cclambda.hbar

        cc = self.ccwfn
        self.pertbar = {}
        if self.H.mu is not None:
            for axis in range(3):
                self.pertbar["MU_" + CART[axis]] = pertbar(self.H.mu[axis], cc)
        if self.H.m is not None:
            for axis in range(3):
                self.pertbar["M_" + CART[axis]] = pertbar(self.H.m[axis], cc)
            for axis in range(3):
                self.pertbar["M*_" + CART[axis]] = pertbar(jnp.conj(self.H.m[axis]), cc)
        if self.H.p is not None:
            for axis in range(3):
                self.pertbar["P_" + CART[axis]] = pertbar(self.H.p[axis], cc)
            for axis in range(3):
                self.pertbar["P*_" + CART[axis]] = pertbar(jnp.conj(self.H.p[axis]), cc)
        ij = 0
        if self.H.Q is not None:
            for a1 in range(3):
                for a2 in range(a1, 3):
                    key = "Q_" + CART[a1] + CART[a2]
                    self.pertbar[key] = pertbar(self.H.Q[ij], cc)
                    if a1 != a2:
                        self.pertbar["Q_" + CART[a2] + CART[a1]] = self.pertbar[key]
                    ij += 1

        hbar_obj = self.hbar
        hb = hbar_obj.hbar if hasattr(hbar_obj, "hbar") else hbar_obj
        if self._df:
            # factor-implicit response: no dense Hvovv/Hvvvo/Hvvvv exist,
            # so no pre-laid combinations either; the jitted steps call
            # the models/dfresponse.py residuals over the dressed factors
            from .models.dfccsd import _eri_oovv as _df_eri_oovv
            from .models.dfhbar import loovv_df as _df_loovv
            self._aux = None
            self._Loovv = jax.jit(_df_loovv)(hb.df)
            self._Eoovv = jax.jit(_df_eri_oovv)(hb.df)
        else:
            # the pre-laid spin-adapted combinations, built once (see
            # build_response_aux); passed into every jitted step as arguments
            self._aux = jax.jit(build_response_aux)(hb)
        eps_occ = jnp.diag(hbar_obj.Hoo)
        eps_vir = jnp.diag(hbar_obj.Hvv)
        self._eps_occ, self._eps_vir = eps_occ, eps_vir
        # conditioning-probe results are a property of (HBAR - omega) at
        # the CURRENT dtype stage; a stage rebuild invalidates them
        self._cond_cache = {}
        self.Dia = eps_occ[:, None] - eps_vir[None, :]
        if not self._df:
            self.Dijab = (eps_occ[:, None, None, None]
                          + eps_occ[None, :, None, None]
                          - eps_vir[None, None, :, None]
                          - eps_vir[None, None, None, :])

    def __getattr__(self, name):
        # storage='df' keeps no resident Dijab (o^2v^2; the jitted steps
        # fuse the denominators from the HBAR diagonal instead)
        if name == "Dijab" and "_eps_occ" in self.__dict__:
            eo, ev = self._eps_occ, self._eps_vir
            return (eo[:, None, None, None] + eo[None, :, None, None]
                    - ev[None, None, :, None] - ev[None, None, None, :])
        raise AttributeError(name)

    def _Adict(self, A):
        d = {"Aov": A.Aov, "Aoo": A.Aoo, "Avv": A.Avv, "Avo": A.Avo,
             "Aovoo": A.Aovoo, "Avvoo": A.Avvoo}
        if hasattr(A, "Avvvo"):
            d["Avvvo"] = A.Avvvo
        return d

    def pseudoresponse(self, A, X1, X2):
        polar1 = 2.0 * contract("ai,ia->", jnp.conj(A.Avo), X1)
        polar2 = 2.0 * contract("ijab,ijab->", jnp.conj(A.Avvoo),
                                2.0 * X2 - X2.swapaxes(2, 3))
        return -2.0 * (polar1 + polar2)

    # ------------------------------------------------------------------
    def estimate_conditioning(self, omega, niter=24, max_diis=6, seed=0):
        """Randomized conditioning probe of the response equations at
        frequency `omega`: estimates sigma_min(HBAR - omega) restricted
        to the PHYSICAL (ij<->ab)-symmetric subspace by driving the
        solver's own preconditioned Jacobi+DIIS fixed point with a
        random unit right-hand side g (the pertbar enters r_X / rX_df
        only inhomogeneously, so a zeroed pertbar yields the bare
        operator) and returning ||g|| / max_k ||z_k||.

        The estimate is an UPPER bound on sigma_min (the probe can only
        under-excite the smallest singular direction), i.e.
        rms/estimate LOWER-bounds the worst-case solution ambiguity —
        so a warning gated on it never cries wolf.  Validated against
        dense SVD on H2O/STO-3G: at omega = E_EOM - 1e-3 the true
        sym-subspace sigma_min is 9.8e-4 and the probe returns 4.3e-3;
        at well-conditioned omegas (0.0656, 0.01) truth is 0.25-0.31
        and the probe 0.7-0.8.  (The ~1e-6 "sigma_min" previously noted
        at omega=0.0656 was an artifact of measuring on the FULL
        unsymmetrized X2 space, whose antisymmetric half is an exact
        null space of the symmetrized residual: roundoff parked there
        neither grows nor decays, which is precisely the documented
        ~4e-9 warm/cold-start drift — invisible to the symmetric
        observables.)

        sigma_min(M^T) == sigma_min(M), so one probe per omega serves
        both solve_right and solve_left; results are cached per
        (omega, stage dtype) and the cache is dropped on a mixed-
        precision stage rebuild.  Runs as ONE device program (lax.scan
        with an in-carry DIIS ring), all large operands as arguments.

        The reference has no conditioning diagnostics
        (/root/reference/pycc/ccresponse.py:336-467); near-pole
        ambiguity there surfaces only as silent warm/cold-start
        discrepancies in the perturbed amplitudes."""
        cc = self.ccwfn
        no = cc.no
        nv = cc.nact - no
        dt = jnp.asarray(cc.t2).dtype
        key = (round(float(omega), 12), str(dt))
        hit = self._cond_cache.get(key)
        if hit is not None:
            return hit
        hb = self.hbar.hbar if hasattr(self.hbar, "hbar") else self.hbar
        rng = np.random.default_rng(seed)
        g1 = rng.standard_normal((no, nv))
        g2 = rng.standard_normal((no, no, nv, nv))
        g2 = 0.5 * (g2 + g2.transpose(1, 0, 3, 2))
        nrm = np.sqrt((g1 ** 2).sum() + (g2 ** 2).sum())
        g1 = jnp.asarray(g1 / nrm, dt)
        g2 = jnp.asarray(g2 / nrm, dt)
        pert0 = next(iter(self.pertbar.values()))
        zeroA = {k: jnp.zeros(np.shape(v), dt)
                 for k, v in self._Adict(pert0).items()}
        diis = DIIS((g1, g2), max_diis=max_diis)
        df = self._df
        if df:
            from .models.dfresponse import rX_df
            Loovv = self._Loovv
        else:
            Loovv = _oovv_from_cc(cc, "L").block
        t2 = cc.t2
        aux = self._aux

        @jax.jit
        def probe(hb, Loovv, t1, t2, zA, g1, g2, om):
            eo = jnp.diagonal(hb.Hoo) + om
            ev = jnp.diagonal(hb.Hvv)
            d1 = eo[:, None] - ev[None, :]
            d2 = (eo[:, None, None, None]
                  + jnp.diagonal(hb.Hoo)[None, :, None, None]
                  - ev[None, None, :, None]
                  - ev[None, None, None, :])

            def body(carry, _):
                z1, z2, state, maxn = carry
                if df:
                    m1, m2 = rX_df(hb, Loovv, t1, t2, zA, om, z1, z2, no)
                else:
                    m1, m2 = r_X(hb, _OovvOnly(Loovv), t2, zA, om,
                                 z1, z2, no, aux)
                z1n = z1 + (g1 + m1) / d1
                z2n = z2 + (g2 + m2) / d2
                state = diis.push(state, (z1n, z2n), (z1, z2))
                z1e, z2e = diis.extrapolate(state, (z1n, z2n))
                nrm = jnp.sqrt(jnp.sum(z1e ** 2) + jnp.sum(z2e ** 2))
                return (z1e, z2e, state, jnp.maximum(maxn, nrm)), None

            z0 = (jnp.zeros_like(g1), jnp.zeros_like(g2), diis.init(),
                  jnp.zeros((), dt))
            (z1, z2, _, maxn), _ = jax.lax.scan(body, z0, None,
                                                length=niter)
            return maxn

        maxn = float(probe(hb, Loovv, cc.t1, t2, zeroA, g1, g2,
                           jnp.asarray(float(omega), dt)))
        sigma = (1.0 / maxn) if maxn > 0 else float("inf")
        self._cond_cache[key] = sigma
        return sigma

    def _cond_gate(self, omega, rms, r_conv, side, sigma_warn=1e-2,
                   warn_factor=10.0):
        """Post-solve conditioning check: probe sigma_min(HBAR - omega)
        and warn when the system is genuinely near-singular (sigma below
        sigma_warn) AND the implied solution ambiguity ||r||/sigma
        exceeds the requested tolerance — at that point two equally
        converged iterates may differ by more than r_conv and downstream
        polarizabilities inherit the spread.  Diagnostics must never
        kill a finished solve: failures degrade to a log line."""
        try:
            sigma = self.estimate_conditioning(omega)
        except Exception as exc:   # pragma: no cover - diagnostic only
            log.info("conditioning probe failed (%r); skipping" % (exc,))
            return None
        # the solver guarantees only rms <= r_conv — ANY iterate at that
        # level is an acceptable return — so the implied ambiguity is
        # max(rms, r_conv)/sigma, not the luck of the final rms
        ambiguity = max(rms, r_conv) / max(sigma, 1e-300)
        if sigma < sigma_warn and ambiguity > warn_factor * r_conv:
            warnings.warn(
                "solve_%s at omega=%.6f: (HBAR - omega) is near-singular "
                "(probe sigma_min <= %.2e, an upper bound) — the solution "
                "is only determined to ~%.1e (||r||/sigma), beyond the "
                "requested r_conv=%.1e.  Any two converged iterates (e.g. "
                "warm vs cold starts) may legitimately differ by that "
                "much; shift omega away from the pole or tighten r_conv."
                % (side, float(omega), sigma, ambiguity, r_conv))
        return sigma

    # ------------------------------------------------------------------
    def solve_right(self, A, omega, e_conv=1e-12, r_conv=1e-12, maxiter=200,
                    max_diis=7, start_diis=1, stall_limit=10,
                    X1_init=None, X2_init=None, cond_check=True):
        t0 = time.time()
        cc = self.ccwfn
        no = cc.no
        hb = self.hbar.hbar if hasattr(self.hbar, "hbar") else self.hbar
        t2 = cc.t2
        L = None if self._df else _oovv_from_cc(cc, "L")
        Dia = self.Dia + omega
        Dijab = self.Dijab + omega
        Ad = self._Adict(A)

        if X1_init is not None:
            # warm start (the mixed-precision refinement stage resumes
            # from the f32-floor amplitudes); widen to the stage dtype
            # without discarding a complex structure
            dt = jnp.result_type(jnp.asarray(X1_init).dtype,
                                 jnp.asarray(t2).dtype)
            X1 = jnp.asarray(X1_init).astype(dt)
            X2 = jnp.asarray(X2_init).astype(dt)
        else:
            X1 = A.Avo.T / Dia
            X2 = A.Avvoo / Dijab
        # max_diis=0 disables DIIS at trace time (no ring, no push);
        # see ccwfn.solve_cc
        use_diis = max_diis > 0
        diis = DIIS((X1, X2), max_diis=max(max_diis, 1))

        if self._df:
            del Dijab   # transient in df mode; the step fuses its own
            from .models.dfresponse import rX_df

            # everything big (Ad holds an o^2v^2 Avvoo) enters as a jit
            # ARGUMENT; the denominators fuse from the HBAR diagonal
            @jax.jit
            def step(hb, Loovv, t1, t2, Ad_, X1, X2, state, do_extrap):
                r1, r2 = rX_df(hb, Loovv, t1, t2, Ad_, omega, X1, X2, no)
                eo = jnp.diagonal(hb.Hoo) + omega
                ev = jnp.diagonal(hb.Hvv)
                inc1 = r1 / (eo[:, None] - ev[None, :])
                inc2 = r2 / (eo[:, None, None, None]
                             + jnp.diagonal(hb.Hoo)[None, :, None, None]
                             - ev[None, None, :, None]
                             - ev[None, None, None, :])
                X1n, X2n = X1 + inc1, X2 + inc2
                rms = jnp.sqrt(jnp.sum(jnp.abs(inc1) ** 2)
                               + jnp.sum(jnp.abs(inc2) ** 2))
                if not use_diis:
                    # single-pair return: duplicated jit outputs get
                    # DISTINCT buffers (an extra o^2v^2 copy at scale)
                    return X1n, X2n, state, rms
                state = diis.push(state, (X1n, X2n), (X1, X2))
                X1e, X2e = jax.lax.cond(
                    do_extrap, lambda s: diis.extrapolate(s, (X1n, X2n)),
                    lambda s: (X1n, X2n), state)
                return X1n, X2n, X1e, X2e, state, rms
        else:
            @jax.jit
            def step(hb, aux, Loovv, t2, X1, X2, state, do_extrap):
                r1, r2 = r_X(hb, _OovvOnly(Loovv), t2, Ad, omega, X1, X2,
                             no, aux)
                inc1 = r1 / Dia
                inc2 = r2 / Dijab
                X1n, X2n = X1 + inc1, X2 + inc2
                rms = jnp.sqrt(jnp.sum(jnp.abs(inc1) ** 2)
                               + jnp.sum(jnp.abs(inc2) ** 2))
                if not use_diis:
                    # single-pair return: duplicated jit outputs get
                    # DISTINCT buffers (an extra o^2v^2 copy at scale)
                    return X1n, X2n, state, rms
                state = diis.push(state, (X1n, X2n), (X1, X2))
                X1e, X2e = jax.lax.cond(
                    do_extrap, lambda s: diis.extrapolate(s, (X1n, X2n)),
                    lambda s: (X1n, X2n), state)
                return X1n, X2n, X1e, X2e, state, rms

        pseudo = complex(self.pseudoresponse(A, X1, X2))
        state = diis.init() if use_diis else None
        best_rms = float("inf")
        stalled = 0
        for niter in range(1, maxiter + 1):
          with timers.time("response.right_iteration"):
            pseudo_last = pseudo
            do_ext = (max_diis > 0) and (niter >= start_diis)
            if self._df:
                out = step(hb, self._Loovv, cc.t1, t2, Ad, X1, X2, state,
                           jnp.asarray(do_ext))
            else:
                out = step(hb, self._aux, L.block, t2, X1, X2, state,
                           jnp.asarray(do_ext))
            if use_diis:
                X1n, X2n, X1, X2, state, rms = out
            else:
                X1n, X2n, state, rms = out
                X1, X2 = X1n, X2n
            pseudo = complex(self.pseudoresponse(A, X1n, X2n))
            rms = float(rms)
            # working-precision noise floor (same policy as the CC/Lambda
            # solvers): the UNNORMALIZED rms over ~1e7-1e8 f32 elements
            # bottoms out near 1e-3 even when every element is converged
            # to its float32 limit — stop instead of wobbling to maxiter
            if rms < 0.98 * best_rms:
                best_rms = rms
                stalled = 0
            else:
                stalled += 1
                if stall_limit and stalled >= stall_limit and rms >= r_conv:
                    self.X1, self.X2 = X1n, X2n
                    self.converged = abs(pseudo - pseudo_last) < e_conv
                    log.info("\nsolve_right hit the working-precision noise "
                             "floor (rms %.3E > r_conv %.1E, no improvement "
                             "in %d iterations); stopping.\n"
                             % (rms, r_conv, stall_limit))
                    if cond_check:
                        self._cond_gate(omega, rms, r_conv, "right")
                    return X1n, X2n, pseudo
            if abs(pseudo - pseudo_last) < e_conv and rms < r_conv:
                log.info("\nPerturbed wave function converged in %.3f seconds.\n"
                      % (time.time() - t0))
                self.X1, self.X2 = X1n, X2n
                self.converged = True
                if cond_check:
                    self._cond_gate(omega, rms, r_conv, "right")
                return X1n, X2n, pseudo
        self.X1, self.X2 = X1, X2
        self.converged = False
        warnings.warn("solve_right did NOT converge in %d iterations "
                      "(rms=%.2e)" % (maxiter, rms))
        if cond_check:
            self._cond_gate(omega, rms, r_conv, "right")
        return X1, X2, pseudo

    def solve_left(self, A, omega, e_conv=1e-12, r_conv=1e-12, maxiter=200,
                   max_diis=7, start_diis=1, stall_limit=10,
                   Y1_init=None, Y2_init=None, cond_check=True):
        t0 = time.time()
        cc = self.ccwfn
        no = cc.no
        hb = self.hbar.hbar if hasattr(self.hbar, "hbar") else self.hbar
        t2 = cc.t2
        l1, l2 = self.cclambda.l1, self.cclambda.l2
        Dia = self.Dia + omega
        Dijab = self.Dijab + omega
        Ad = self._Adict(A)

        if Y1_init is not None:
            # warm start (mixed-precision refinement stage)
            dt = jnp.result_type(jnp.asarray(Y1_init).dtype,
                                 jnp.asarray(t2).dtype)
            Y1 = jnp.asarray(Y1_init).astype(dt)
            Y2 = jnp.asarray(Y2_init).astype(dt)
        else:
            X1g = A.Avo.T / Dia
            X2g = A.Avvoo / Dijab
            Y1 = 2.0 * X1g
            Y2 = 4.0 * X2g - 2.0 * X2g.swapaxes(2, 3)

        if self._df:
            del Dijab
            from .models.dfresponse import inY1_df, inY2_df, rY_df

            # one-time inhomogeneous terms, all big operands as jit args
            @jax.jit
            def inhomo(hb, Loovv, Eoovv, t1, t2, l1, l2, Ad_, pert_ov,
                       X1, X2):
                i1 = inY1_df(hb, Loovv, Eoovv, t1, t2, l1, l2, Ad_,
                             pert_ov, X1, X2, no)
                i2 = inY2_df(hb, Loovv, Eoovv, t1, t2, l1, l2, Ad_,
                             X1, X2, no)
                return i1, i2

            imY1, imY2 = inhomo(hb, self._Loovv, self._Eoovv, cc.t1, t2,
                                l1, l2, Ad, A.pert_ov, self.X1, self.X2)
        else:
            L = _oovv_from_cc(cc, "L")
            ERI = _oovv_from_cc(cc, "ERI")
            imY1 = in_Y1(hb, L, t2, l1, l2, Ad, self.X1, self.X2, no,
                         self._aux)
            imY2 = in_Y2(hb, L, ERI, t2, l1, l2, Ad, self.X1, self.X2, no,
                         self._aux)

        use_diis = max_diis > 0
        diis = DIIS((Y1, Y2), max_diis=max(max_diis, 1))

        if self._df:
            @jax.jit
            def step(hb, Loovv, t1, t2, imY1, imY2, Y1, Y2, state,
                     do_extrap):
                r1, r2 = rY_df(hb, Loovv, t1, t2, imY1, imY2, omega,
                               Y1, Y2, no)
                eo = jnp.diagonal(hb.Hoo) + omega
                ev = jnp.diagonal(hb.Hvv)
                inc1 = r1 / (eo[:, None] - ev[None, :])
                inc2 = r2 / (eo[:, None, None, None]
                             + jnp.diagonal(hb.Hoo)[None, :, None, None]
                             - ev[None, None, :, None]
                             - ev[None, None, None, :])
                Y1n, Y2n = Y1 + inc1, Y2 + inc2
                rms = jnp.sqrt(jnp.sum(jnp.abs(inc1) ** 2)
                               + jnp.sum(jnp.abs(inc2) ** 2))
                if not use_diis:
                    # single-pair return: duplicated jit outputs get
                    # DISTINCT buffers (an extra o^2v^2 copy at scale)
                    return Y1n, Y2n, state, rms
                state = diis.push(state, (Y1n, Y2n), (Y1, Y2))
                Y1e, Y2e = jax.lax.cond(
                    do_extrap, lambda s: diis.extrapolate(s, (Y1n, Y2n)),
                    lambda s: (Y1n, Y2n), state)
                return Y1n, Y2n, Y1e, Y2e, state, rms
        else:
            @jax.jit
            def step(hb, aux, Loovv, t2, imY1, imY2, Y1, Y2, state,
                     do_extrap):
                r1, r2 = r_Y(hb, _OovvOnly(Loovv), t2, imY1, imY2, omega,
                             Y1, Y2, no, aux)
                inc1 = r1 / Dia
                inc2 = r2 / Dijab
                Y1n, Y2n = Y1 + inc1, Y2 + inc2
                rms = jnp.sqrt(jnp.sum(jnp.abs(inc1) ** 2)
                               + jnp.sum(jnp.abs(inc2) ** 2))
                if not use_diis:
                    # single-pair return: duplicated jit outputs get
                    # DISTINCT buffers (an extra o^2v^2 copy at scale)
                    return Y1n, Y2n, state, rms
                state = diis.push(state, (Y1n, Y2n), (Y1, Y2))
                Y1e, Y2e = jax.lax.cond(
                    do_extrap, lambda s: diis.extrapolate(s, (Y1n, Y2n)),
                    lambda s: (Y1n, Y2n), state)
                return Y1n, Y2n, Y1e, Y2e, state, rms

        pseudo = complex(self.pseudoresponse(A, Y1, Y2))
        state = diis.init() if use_diis else None
        best_rms = float("inf")
        stalled = 0
        for niter in range(1, maxiter + 1):
          with timers.time("response.left_iteration"):
            pseudo_last = pseudo
            do_ext = (max_diis > 0) and (niter >= start_diis)
            if self._df:
                out = step(hb, self._Loovv, cc.t1, t2, imY1, imY2, Y1, Y2,
                           state, jnp.asarray(do_ext))
            else:
                out = step(hb, self._aux, L.block, t2, imY1, imY2, Y1, Y2,
                           state, jnp.asarray(do_ext))
            if use_diis:
                Y1n, Y2n, Y1, Y2, state, rms = out
            else:
                Y1n, Y2n, state, rms = out
                Y1, Y2 = Y1n, Y2n
            pseudo = complex(self.pseudoresponse(A, Y1n, Y2n))
            rms = float(rms)
            # noise-floor stall detection — see solve_right
            if rms < 0.98 * best_rms:
                best_rms = rms
                stalled = 0
            else:
                stalled += 1
                if stall_limit and stalled >= stall_limit and rms >= r_conv:
                    self.Y1, self.Y2 = Y1n, Y2n
                    self.converged = abs(pseudo - pseudo_last) < e_conv
                    log.info("\nsolve_left hit the working-precision noise "
                             "floor (rms %.3E > r_conv %.1E, no improvement "
                             "in %d iterations); stopping.\n"
                             % (rms, r_conv, stall_limit))
                    if cond_check:
                        self._cond_gate(omega, rms, r_conv, "left")
                    return Y1n, Y2n, pseudo
            if abs(pseudo - pseudo_last) < e_conv and rms < r_conv:
                log.info("\nPerturbed wave function converged in %.3f seconds.\n"
                      % (time.time() - t0))
                self.Y1, self.Y2 = Y1n, Y2n
                self.converged = True
                if cond_check:
                    self._cond_gate(omega, rms, r_conv, "left")
                return Y1n, Y2n, pseudo
        self.Y1, self.Y2 = Y1, Y2
        self.converged = False
        warnings.warn("solve_left did NOT converge in %d iterations "
                      "(rms=%.2e)" % (maxiter, rms))
        if cond_check:
            self._cond_gate(omega, rms, r_conv, "left")
        return Y1, Y2, pseudo

    # ------------------------------------------------------------------
    def _solve_mixed(self, side, pertkey, omega, e_conv, r_conv, maxiter,
                     sp_conv, sp_dtype, refine_maxiter, kw):
        """Shared mixed-precision orchestration for the perturbed-
        amplitude solvers, same scheme as ccwfn.solve_cc_mixed /
        cclambda.solve_lambda_mixed: rebuild HBAR + pertbar at float32,
        converge X (or Y) to the f32 noise floor (cheap iterations on
        the TPU, where f64 is emulated), then rebuild everything at
        float64 and refine the same vectors — the perturbed-amplitude
        fixed point is dtype-independent given converged t (and l), so
        the refined pseudoresponse equals a pure-f64 solve.  Completes
        the at-scale accuracy story for response properties (the
        reference solves X/Y in f64 only,
        /root/reference/pycc/ccresponse.py:336-467).

        t1/t2 (and l1/l2 for the left solve) are fixed PARAMETERS of
        the response equations: keep the exact f64 references alive
        through the floor stage and restore them for the refinement —
        a round-tripped f32 cast would poison the f64 stage (same
        invariant as solve_lambda_mixed).  self.hbar and the pertbar
        are left at the f64 build for downstream consumers
        (linresp_asym etc.).

        Conditioning caveat: near a pole of (HBAR - omega) — omega
        within ~1e-3 of an EOM excitation energy — the linear system
        acquires a near-null direction and any two iterates that
        satisfy the equations to working precision can differ by
        ||r||/sigma_min; solve_right/solve_left now probe for this at
        runtime (estimate_conditioning / _cond_gate) and warn.  A
        second, BENIGN ambiguity exists at every omega: the residual
        is (ij<->ab)-symmetrized, so the antisymmetric half of the X2
        representation is an exact null space — roundoff parked there
        (f32: ~1e-9 after a cast round-trip) neither grows nor decays
        and warm/cold starts keep different antisymmetric junk, but
        every physical observable contracts it away.  That is the
        measured ~4e-9 warm/cold drift at omega=0.0656 (where the
        physical-subspace sigma_min is a healthy 0.25).  Neither
        effect is a property of the mixed scheme — at well-conditioned
        frequencies the refined result matches a pure f64 solve to
        ~1e-13 (test_027)."""
        cc = self.ccwfn
        if cc.precision != "DP":
            raise Exception("mixed-precision response needs a "
                            "precision='DP' ccwfn construction (the f64 "
                            "masters are the refinement-stage "
                            "Hamiltonian).")
        if cc.local is not None:
            raise Exception("mixed-precision response supports canonical "
                            "storage modes only.")
        sp_dtype = sp_dtype or jnp.float32
        cc._ensure_mixed_masters()
        t1_64, t2_64 = cc.t1, cc.t2
        l1_64, l2_64 = self.cclambda.l1, self.cclambda.l2

        # ---- low-precision floor stage: f32 HBAR/pertbar + f32 solve ----
        cc._cast_stage(sp_dtype)
        self.cclambda.l1 = l1_64.astype(sp_dtype)
        self.cclambda.l2 = l2_64.astype(sp_dtype)
        self._rebuild_stage(rebuild_hbar=True)
        A = self.pertbar[pertkey]
        solver = self.solve_right if side == "right" else self.solve_left
        v1, v2, self.pseudo_sp_floor = solver(A, omega, sp_conv, sp_conv,
                                              maxiter, **kw)

        # ---- f64 refinement from the floor vectors ----
        cc._cast_stage(jnp.float64)
        cc.t1, cc.t2 = t1_64, t2_64
        self.cclambda.l1, self.cclambda.l2 = l1_64, l2_64
        self._rebuild_stage(rebuild_hbar=True)
        A = self.pertbar[pertkey]
        init = (dict(X1_init=v1, X2_init=v2) if side == "right"
                else dict(Y1_init=v1, Y2_init=v2))
        return solver(A, omega, e_conv, r_conv,
                      refine_maxiter if refine_maxiter else maxiter,
                      **init, **kw)

    def solve_right_mixed(self, pertkey, omega, e_conv=1e-12, r_conv=1e-12,
                          maxiter=200, sp_conv=1e-6, sp_dtype=None,
                          refine_maxiter=None, **kw):
        """Mixed-precision right-hand (X) perturbed-amplitude solve; takes
        the pertbar KEY (e.g. 'MU_X') — the pertbar itself is a
        stage-dtype object and is rebuilt per stage."""
        return self._solve_mixed("right", pertkey, omega, e_conv, r_conv,
                                 maxiter, sp_conv, sp_dtype,
                                 refine_maxiter, kw)

    def solve_left_mixed(self, pertkey, omega, e_conv=1e-12, r_conv=1e-12,
                         maxiter=200, sp_conv=1e-6, sp_dtype=None,
                         refine_maxiter=None, **kw):
        """Mixed-precision left-hand (Y) perturbed-amplitude solve (see
        solve_right_mixed)."""
        return self._solve_mixed("left", pertkey, omega, e_conv, r_conv,
                                 maxiter, sp_conv, sp_dtype,
                                 refine_maxiter, kw)

    # ------------------------------------------------------------------
    def linresp_asym(self, pertkey_a, X1_B, X2_B, Y1_B, Y2_B):
        l1, l2 = self.cclambda.l1, self.cclambda.l2
        A = self.pertbar[pertkey_a]
        Avvoo = A.Avvoo.swapaxes(0, 2).swapaxes(1, 3)
        polar1 = contract("ai,ia->", A.Avo, Y1_B)
        polar1 += 0.5 * contract("abij,ijab->", Avvoo, Y2_B)
        polar1 += 0.5 * contract("baji,ijab->", Avvoo, Y2_B)
        polar2 = 2.0 * contract("ia,ia->", A.Aov, X1_B)
        tmp = contract("ia,ic->ac", l1, X1_B)
        polar2 += contract("ac,ac->", tmp, A.Avv)
        tmp = contract("ia,ka->ik", l1, X1_B)
        polar2 -= contract("ik,ki->", tmp, A.Aoo)
        tmp = contract("ia,jb->ijab", l1, A.Aov)
        polar2 += 2.0 * contract("ijab,ijab->", tmp, X2_B)
        polar2 -= contract("ijab,ijba->", tmp, X2_B)
        if self._df:
            # 'ijbc,bcaj->ia' over Avvvo[bcaj] = -t2[mjbc] pert[ma]:
            # reduce through the o^2 intermediate (never form the o v^3)
            G = contract("ijbc,mjbc->im", l2, self.ccwfn.t2)
            tmp = -1.0 * contract("im,ma->ia", G, A.pert_ov)
        else:
            tmp = contract("ijbc,bcaj->ia", l2, A.Avvvo)
        polar2 += contract("ia,ia->", tmp, X1_B)
        tmp = contract("ijab,kbij->ak", l2, A.Aovoo)
        polar2 -= 0.5 * contract("ak,ka->", tmp, X1_B)
        tmp = contract("ijab,kaji->bk", l2, A.Aovoo)
        polar2 -= 0.5 * contract("bk,kb->", tmp, X1_B)
        tmp = contract("ijab,kjab->ik", l2, X2_B)
        polar2 -= 0.5 * contract("ik,ki->", tmp, A.Aoo)
        tmp = contract("ijab,kiba->jk", l2, X2_B)
        polar2 -= 0.5 * contract("jk,kj->", tmp, A.Aoo)
        tmp = contract("ijab,ijac->bc", l2, X2_B)
        polar2 += 0.5 * contract("bc,bc->", tmp, A.Avv)
        tmp = contract("ijab,ijcb->ac", l2, X2_B)
        polar2 += 0.5 * contract("ac,ac->", tmp, A.Avv)
        return -1.0 * (polar1 + polar2)

    def linresp(self, A, B, omega, e_conv=1e-13, r_conv=1e-13, maxiter=200,
                max_diis=8, start_diis=1):
        """CC linear-response tensor <<A_a;B_b>>_omega as a 3x3 array.

        Working replacement for the reference's partially-broken driver
        (/root/reference/pycc/ccresponse.py:208-296, which dies on undefined
        locals): solves the right- and left-hand perturbed wave functions for
        each Cartesian component of B at +omega, then assembles the
        asymmetric response expression against every component of A via
        `linresp_asym` — the exact form the reference's own test exercises
        (/root/reference/pycc/tests/test_036_lr.py:47-66).

        A, B in {"MU", "M", "M*", "P", "P*", "Q"}; for Q a (6, 3, 3)-style
        full tensor is not assembled — use the individual "Q_xy" pertbar
        keys with solve_right/solve_left directly.
        """
        A, B = A.upper(), B.upper()
        if A == "Q" or B == "Q":
            raise ValueError("use per-component Q_ab keys for quadrupole LR")
        resp = np.zeros((3, 3), dtype=complex)
        XB, YB = {}, {}
        for b in range(3):
            key_b = B + "_" + self.cart[b]
            pert = self.pertbar[key_b]
            X1, X2, _ = self.solve_right(pert, omega, e_conv, r_conv,
                                         maxiter, max_diis, start_diis)
            Y1, Y2, _ = self.solve_left(pert, omega, e_conv, r_conv,
                                        maxiter, max_diis, start_diis)
            XB[b], YB[b] = (X1, X2), (Y1, Y2)
        for a in range(3):
            key_a = A + "_" + self.cart[a]
            for b in range(3):
                (X1, X2), (Y1, Y2) = XB[b], YB[b]
                resp[a, b] = complex(
                    self.linresp_asym(key_a, X1, X2, Y1, Y2))
        # mixed real/imaginary operator pairs give an imaginary response
        if np.abs(resp.imag).max() < 1e-12:
            return resp.real
        return resp

    def pertcheck(self, omega, e_conv=1e-13, r_conv=1e-13, maxiter=200,
                  max_diis=8, start_diis=1):
        """Converge X for every available perturbation; return dict of
        pseudoresponses (mirrors ccresponse.pertcheck)."""
        check = {}
        for key, A in self.pertbar.items():
            X1, X2, pseudo = self.solve_right(A, omega, e_conv, r_conv,
                                              maxiter, max_diis, start_diis)
            check[key + "_%0.6f" % omega] = pseudo
            if omega != 0.0:
                X1, X2, pseudo = self.solve_right(A, -omega, e_conv, r_conv,
                                                  maxiter, max_diis, start_diis)
                check[key + "_%0.6f" % -omega] = pseudo
        return check
