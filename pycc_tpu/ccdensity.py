"""CC one- and two-electron densities and density-based energies.

Functional rebuild of /root/reference/pycc/ccdensity.py:13-614.  All block
builders are pure functions of the amplitudes; `compute_onepdm` is jittable
(used per-step by the real-time module), and `compute_energy` provides the
density-vs-amplitude internal consistency oracle of the reference suite
(test_004_ccsd_density.py).
"""

import time

import jax
import jax.numpy as jnp

from .cclambda import build_Goo, build_Gvv
from .models.ccsd import build_tau, slices
from .ops.contract import contract
from .utils.log import logger as log


def build_Doo(model, t1, t2, l1, l2, extra=None):
    Doo = -contract("imef,jmef->ij", t2, l2)
    if model != "CCD":
        Doo -= contract("ie,je->ij", t1, l1)
    if extra is not None:
        Doo += extra
    return Doo


def build_Dvv(model, t1, t2, l1, l2, extra=None):
    Dvv = contract("mnbe,mnae->ab", t2, l2)
    if model != "CCD":
        Dvv += contract("mb,ma->ab", t1, l1)
    if extra is not None:
        Dvv += extra
    return Dvv


def build_Dvo(l1):
    return l1.T


def build_Dov(model, t1, t2, l1, l2, extra=None):
    if model == "CCD":
        return jnp.zeros_like(t1)
    Dov = 2.0 * t1
    Dov += 2.0 * contract("me,imae->ia", l1, t2)
    Dov -= contract("me,miae->ia", l1, build_tau(t1, t2))
    tmp = contract("mnef,inef->mi", l2, t2)
    Dov -= contract("mi,ma->ia", tmp, t1)
    tmp = contract("mnef,mnaf->ea", l2, t2)
    Dov -= contract("ea,ie->ia", tmp, t1)
    if extra is not None:
        Dov += extra
    return Dov


def build_Doooo(model, t1, t2, l2):
    if model == "CCD":
        return contract("ijef,klef->ijkl", t2, l2)
    if model == "CC2":
        return contract("jf,klif->ijkl", t1, contract("ie,klef->klif", t1, l2))
    return contract("ijef,klef->ijkl", build_tau(t1, t2), l2)


def build_Dvvvv(model, t1, t2, l2):
    if model == "CCD":
        return contract("mnab,mncd->abcd", t2, l2)
    if model == "CC2":
        return contract("nb,ancd->abcd", t1, contract("ma,mncd->ancd", t1, l2))
    return contract("mnab,mncd->abcd", build_tau(t1, t2), l2)


def build_Dooov(model, t1, t2, l1, l2, extra=None):
    if model == "CCD":
        no, nv = t1.shape
        return jnp.zeros((no, no, no, nv), dtype=t2.dtype)
    tau = build_tau(t1, t2)
    tmp = 2.0 * tau - tau.swapaxes(2, 3)
    D = -1.0 * contract("ke,ijea->ijka", l1, tmp)
    D -= contract("ie,jkae->ijka", t1, l2)
    if model != "CC2":
        Goo = build_Goo(t2, l2)
        D -= 2.0 * contract("ik,ja->ijka", Goo, t1)
        D += contract("jk,ia->ijka", Goo, t1)
        tmp = contract("jmaf,kmef->jake", t2, l2)
        D -= 2.0 * contract("jake,ie->ijka", tmp, t1)
        D += contract("iake,je->ijka", tmp, t1)
        tmp = contract("ijef,kmef->ijkm", t2, l2)
        D += contract("ijkm,ma->ijka", tmp, t1)
        tmp = contract("mjaf,kmef->jake", t2, l2)
        D += contract("jake,ie->ijka", tmp, t1)
        tmp = contract("imea,kmef->iakf", t2, l2)
        D += contract("iakf,jf->ijka", tmp, t1)
    tmp = contract("kmef,jf->kmej", l2, t1)
    tmp = contract("kmej,ie->kmij", tmp, t1)
    D += contract("kmij,ma->ijka", tmp, t1)
    if extra is not None:
        D += extra
    return D


def build_Dvvvo(model, t1, t2, l1, l2, extra=None):
    if model == "CCD":
        no, nv = t1.shape
        return jnp.zeros((nv, nv, nv, no), dtype=t2.dtype)
    tau = build_tau(t1, t2)
    tmp = 2.0 * tau - tau.swapaxes(2, 3)
    D = contract("mc,miab->abci", l1, tmp)
    D += contract("ma,imbc->abci", t1, l2)
    if model != "CC2":
        Gvv = build_Gvv(t2, l2)
        D -= 2.0 * contract("ca,ib->abci", Gvv, t1)
        D += contract("cb,ia->abci", Gvv, t1)
        tmp = contract("imbe,nmce->ibnc", t2, l2)
        D += 2.0 * contract("ibnc,na->abci", tmp, t1)
        D -= contract("ianc,nb->abci", tmp, t1)
        tmp = contract("nmab,nmce->abce", t2, l2)
        D -= contract("abce,ie->abci", tmp, t1)
        tmp = contract("niae,nmce->iamc", t2, l2)
        D -= contract("iamc,mb->abci", tmp, t1)
        tmp = contract("mibe,nmce->ibnc", t2, l2)
        D -= contract("ibnc,na->abci", tmp, t1)
    tmp = contract("nmce,ie->nmci", l2, t1)
    tmp = contract("nmci,na->amci", tmp, t1)
    D -= contract("amci,mb->abci", tmp, t1)
    if extra is not None:
        D += extra
    return D


def build_Dovov(model, t1, t2, l1, l2):
    if model == "CCD":
        D = -contract("mibe,jmea->iajb", t2, l2)
        D -= contract("imbe,mjea->iajb", t2, l2)
        return D
    D = -1.0 * contract("ia,jb->iajb", t1, l1)
    if model == "CC2":
        D -= contract("mb,jmia->iajb", t1, contract("ie,jmea->jmia", t1, l2))
    else:
        D -= contract("mibe,jmea->iajb", build_tau(t1, t2), l2)
        D -= contract("imbe,mjea->iajb", t2, l2)
    return D


def build_Doovv(model, t1, t2, l1, l2, extra=None):
    tau = build_tau(t1, t2)
    tau_s = 2.0 * tau - tau.swapaxes(2, 3)

    def _t2_terms(D):
        D += 4.0 * contract("imae,mjeb->ijab", t2, l2)
        D -= 2.0 * contract("mjbe,imae->ijab", tau, l2)
        tmp_oooo = contract("ijef,mnef->ijmn", t2, l2)
        D += contract("ijmn,mnab->ijab", tmp_oooo, t2)
        tmp1 = contract("njbf,mnef->jbme", t2, l2)
        D += contract("jbme,miae->ijab", tmp1, t2)
        tmp1 = contract("imfb,mnef->ibne", t2, l2)
        D += contract("ibne,njae->ijab", tmp1, t2)
        Gvv = build_Gvv(t2, l2)
        D += 4.0 * contract("eb,ijae->ijab", Gvv, tau)
        D -= 2.0 * contract("ea,ijbe->ijab", Gvv, tau)
        Goo = build_Goo(t2, l2)
        D -= 4.0 * contract("jm,imab->ijab", Goo, tau)
        D += 2.0 * contract("jm,imba->ijab", Goo, tau)
        tmp1 = contract("inaf,mnef->iame", t2, l2)
        D -= 4.0 * contract("iame,mjbe->ijab", tmp1, tau)
        D += 2.0 * contract("ibme,mjae->ijab", tmp1, tau)
        D += 4.0 * contract("jbme,imae->ijab", tmp1, t2)
        D -= 2.0 * contract("jame,imbe->ijab", tmp1, t2)
        return D, tmp_oooo

    if model == "CCD":
        D = 2.0 * tau_s + l2
        D, _ = _t2_terms(D)
        return D

    D = 4.0 * contract("ia,jb->ijab", t1, l1)
    D += 2.0 * tau_s
    D += l2
    tmp1 = 2.0 * t2 - t2.swapaxes(2, 3)
    tmp2 = 2.0 * contract("me,jmbe->jb", l1, tmp1)
    D += 2.0 * contract("jb,ia->ijab", tmp2, t1)
    D -= contract("ja,ib->ijab", tmp2, t1)
    tmp2 = 2.0 * contract("ijeb,me->ijmb", tmp1, l1)
    D -= contract("ijmb,ma->ijab", tmp2, t1)
    tmp2 = 2.0 * contract("jmba,me->jeba", tau_s, l1)
    D -= contract("jeba,ie->ijab", tmp2, t1)

    if model == "CC2":
        D -= 2.0 * contract("mb,imaj->ijab", t1,
                            contract("je,imae->imaj", t1, l2))
    else:
        D, tmp_oooo = _t2_terms(D)
        tmp = contract("nb,ijmn->ijmb", t1, tmp_oooo)
        D += contract("ma,ijmb->ijab", t1, tmp)
        tmp = contract("ie,mnef->mnif", t1, l2)
        tmp = contract("jf,mnif->mnij", t1, tmp)
        D += contract("mnij,mnab->ijab", tmp, t2)
        tmp = contract("ie,mnef->mnif", t1, l2)
        tmp = contract("mnif,njbf->mijb", tmp, t2)
        D += contract("ma,mijb->ijab", t1, tmp)
        tmp = contract("jf,mnef->mnej", t1, l2)
        tmp = contract("mnej,miae->njia", tmp, t2)
        D += contract("nb,njia->ijab", t1, tmp)
        tmp = contract("je,mnef->mnjf", t1, l2)
        tmp = contract("mnjf,imfb->njib", tmp, t2)
        D += contract("na,njib->ijab", t1, tmp)
        tmp = contract("if,mnef->mnei", t1, l2)
        tmp = contract("mnei,njae->mija", tmp, t2)
        D += contract("mb,mija->ijab", t1, tmp)

    tmp = contract("jf,mnef->mnej", t1, l2)
    tmp = contract("ie,mnej->mnij", t1, tmp)
    tmp = contract("nb,mnij->mbij", t1, tmp)
    D += contract("ma,mbij->ijab", t1, tmp)
    if extra is not None:
        D += extra
    return D


def onepdm(model, t1, t2, l1, l2, no, nact,
           Doo_x=None, Dvv_x=None, Dov_x=None):
    """Correlated one-electron density as a full (nact, nact) matrix."""
    o, v = slices(no)
    opdm = jnp.zeros((nact, nact), dtype=t1.dtype)
    opdm = opdm.at[o, o].set(build_Doo(model, t1, t2, l1, l2, Doo_x))
    opdm = opdm.at[v, v].set(build_Dvv(model, t1, t2, l1, l2, Dvv_x))
    opdm = opdm.at[o, v].set(build_Dov(model, t1, t2, l1, l2, Dov_x))
    opdm = opdm.at[v, o].set(build_Dvo(l1))
    return opdm


# T1-transformed dipole blocks used by CC3 properties
def build_Moo(no, nv, ints, t1):
    return ints[:no, :no] + contract("ma,ia->mi", ints[:no, -nv:], t1)


def build_Mvv(no, nv, ints, t1):
    return ints[-nv:, -nv:] - contract("ie,ia->ae", ints[:no, -nv:], t1)


class ccdensity:
    """API-parity driver: ccdensity(ccwfn, cclambda[, onlyone])."""

    def __init__(self, ccwfn, cclambda, onlyone=False):
        t0 = time.time()
        self.ccwfn = ccwfn
        self.cclambda = cclambda
        self.onlyone = onlyone
        model = ccwfn.model
        t1, t2 = ccwfn.t1, ccwfn.t2
        l1, l2 = cclambda.l1, cclambda.l2

        # (T) density contributions are provided by ccwfn.t3_density()
        Doo_x = getattr(ccwfn, "Doo_t3", None) if model == "CCSD(T)" else None
        Dvv_x = getattr(ccwfn, "Dvv_t3", None) if model == "CCSD(T)" else None
        Dov_x = getattr(ccwfn, "Dov_t3", None) if model == "CCSD(T)" else None
        Gooov = getattr(ccwfn, "Gooov", None) if model == "CCSD(T)" else None
        Gvvvo = getattr(ccwfn, "Gvvvo", None) if model == "CCSD(T)" else None
        Goovv = getattr(ccwfn, "Goovv", None) if model == "CCSD(T)" else None

        self.Dov = build_Dov(model, t1, t2, l1, l2, Dov_x)
        self.Dvo = build_Dvo(l1)
        self.Dvv = build_Dvv(model, t1, t2, l1, l2, Dvv_x)
        self.Doo = build_Doo(model, t1, t2, l1, l2, Doo_x)
        self._df = getattr(ccwfn, "storage", "full") == "df"
        if not onlyone:
            self.Doooo = build_Doooo(model, t1, t2, l2)
            self.Dooov = build_Dooov(model, t1, t2, l1, l2, Gooov)
            self.Dovov = build_Dovov(model, t1, t2, l1, l2)
            self.Doovv = build_Doovv(model, t1, t2, l1, l2, Goovv)
            if not self._df:
                self.Dvvvv = build_Dvvvv(model, t1, t2, l2)
                self.Dvvvo = build_Dvvvo(model, t1, t2, l1, l2, Gvvvo)
            # storage='df': the v^4/v^3o blocks are never materialized —
            # compute_energy evaluates their energy contractions
            # factor-wise (models/dfdensity.py)
        log.info("\nCCDENSITY constructed in %.3f seconds.\n" % (time.time() - t0))

    def compute_energy(self):
        cc = self.ccwfn
        o, v = cc.o, cc.v
        F, ERI = cc.H.F, cc.H.ERI
        if self._df and not self.onlyone:
            # factor-wise two-electron energy: the vvvv term rides the
            # a-blocked DF ladder and every Dvvvo term is re-associated
            # through B — no v^4/v^3o object exists (models/dfdensity.py)
            from .models.dfdensity import density_energy_df
            lam = self.cclambda
            eone, etwo = density_energy_df(
                F, cc.dfb, cc.t1, cc.t2, lam.l1, lam.l2, cc.no,
                model=cc.model, Doo=self.Doo, Dvv=self.Dvv,
                Doooo=self.Doooo, Dooov=self.Dooov, Dovov=self.Dovov,
                Doovv=self.Doovv,
                Gvvvo=(getattr(cc, "Gvvvo", None)
                       if cc.model == "CCSD(T)" else None),
                nblocks=getattr(cc, "_df_nblocks", None))
            self.eone = float(jnp.real(eone))
            self.etwo = float(jnp.real(etwo))
            self.ecc = self.eone + self.etwo
            log.info("One-electron CC energy = %20.15f" % self.eone)
            log.info("Two-electron CC energy = %20.15f" % self.etwo)
            log.info("CC Correlation Energy  = %20.15f" % self.ecc)
            return self.ecc
        if getattr(cc, "storage", "full") == "blocked":
            # the six blocks are already on device; slice-views beat
            # re-staging the host-side dense tensor
            from .models.blocked import BlockedERI
            ERI = BlockedERI(cc.blocks, cc.no)
        eone = (contract("ij,ij->", F[o, o], self.Doo)
                + contract("ab,ab->", F[v, v], self.Dvv))
        if self.onlyone:
            self.ecc = float(jnp.real(eone))
            return self.ecc
        etwo = 0.5 * contract("ijkl,ijkl->", ERI[o, o, o, o], self.Doooo)
        etwo += 0.5 * contract("abcd,abcd->", ERI[v, v, v, v], self.Dvvvv)
        etwo += contract("ijka,ijka->", ERI[o, o, o, v], self.Dooov)
        etwo += contract("abci,abci->", ERI[v, v, v, o], self.Dvvvo)
        etwo += contract("iajb,iajb->", ERI[o, v, o, v], self.Dovov)
        etwo += 0.5 * contract("ijab,ijab->", ERI[o, o, v, v], self.Doovv)
        self.eone = float(jnp.real(eone))
        self.etwo = float(jnp.real(etwo))
        self.ecc = self.eone + self.etwo
        log.info("One-electron CC energy = %20.15f" % self.eone)
        log.info("Two-electron CC energy = %20.15f" % self.etwo)
        log.info("CC Correlation Energy  = %20.15f" % self.ecc)
        return self.ecc

    def compute_onepdm(self, t1, t2, l1, l2, real_time=False):
        cc = self.ccwfn
        if cc.model == "CC3":
            from .models.cc3 import cc3_onepdm, cc3_onepdm_rows
            big = cc.no ** 3 * cc.nv ** 3 > 2e8
            use_rows = big if cc.t3_scan is None else bool(cc.t3_scan)
            if getattr(cc, "storage", "full") == "df":
                use_rows = True  # the full-tensor path needs the dense ERI
            fn = cc3_onepdm_rows if use_rows else cc3_onepdm
            return fn(cc, t1, t2, l1, l2, real_time=real_time)
        return onepdm(cc.model, t1, t2, l1, l2, cc.no, cc.nact)
