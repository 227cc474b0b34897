"""Density-based CC energy from Cholesky/DF factors.

The dense density energy (ccdensity.compute_energy, rebuilt from
/root/reference/pycc/ccdensity.py:500-614) contracts the full two-pdm
against the MO ERI — including a v^4 Dvvvv and a v^3 o Dvvvo block that
cannot exist at DF scale.  This module evaluates the SAME scalar without
materializing either: the vvvv term rides the a-blocked DF ladder
(models/dfhbar.ladder_apply), and every Dvvvo term is re-associated so
one factor index is absorbed into B first, leaving o^2 v^2-bounded
intermediates.  Extends the reference suite's density-vs-amplitude
oracle (test_004_ccsd_density.py) to sizes the reference cannot
represent.

Index conventions: Dirac <pq|rs> = (pr|qs) = sum_P B[P,p,r] B[P,q,s];
factor blocks Boo/Bov/Bvv as in models/dfccsd.DFERI.
"""

import jax
import jax.numpy as jnp

from ..cclambda import build_Goo, build_Gvv
from ..ops.contract import contract
from .ccsd import build_tau
from .dfhbar import ladder_apply


def _evvvo_extra_df(df, G):
    """sum <ab|ci> G[abci] for a MATERIALIZED v^3 o extra block (the (T)
    density's Gvvvo): a-mapped so the ERI slice never exists beyond one
    (v, o, v) sheet."""

    def one_a(args):
        Bva, Ga = args                              # (naux, v), (v, v, o)
        t = contract("Pc,Pib->cib", Bva, df.Bov)    # <a.|ci> sheet
        return contract("cib,bci->", t, Ga)

    es = jax.lax.map(one_a, (jnp.moveaxis(df.Bvv, 1, 0), G))
    return jnp.sum(es)


def _evvvv_df(model, df, t1, t2, l2, nblocks=None):
    """0.5 * sum <ab|cd> Dvvvv[abcd] without forming either v^4 tensor."""
    if model == "CC2":
        # Dvvvv = t1[ma] t1[nb] l2[mncd]: absorb both t1 into B
        Bt1 = contract("Pac,ma->Pcm", df.Bvv, t1)
        Z = contract("Pcm,Pdn->mncd", Bt1, Bt1)
        return 0.5 * contract("mncd,mncd->", l2, Z)
    x2 = t2 if model == "CCD" else build_tau(t1, t2)
    # Z[mncd] = sum_ef x2[mnef] <cd|ef>;  <cd|ef> = sum_P Bvv[P,c,e] Bvv[P,d,f]
    Z = ladder_apply(df.Bvv, df.Bvv, x2, nblocks=nblocks)
    return 0.5 * contract("mncd,mncd->", l2, Z)


def _evvvo_df(model, df, t1, t2, l1, l2, nblocks=None):
    """sum <ab|ci> Dvvvo[abci] with every term re-associated through the
    factors; largest intermediate o^2 v^2.  Term order follows
    ccdensity.build_Dvvvo.  <ab|ci> = sum_P Bvv[P,a,c] Bov[P,i,b]."""
    if model == "CCD":
        return jnp.asarray(0.0, t2.dtype)
    tau = build_tau(t1, t2)
    tauS = 2.0 * tau - tau.swapaxes(2, 3)

    Bl1 = contract("Pac,mc->Pam", df.Bvv, l1)      # (naux, v, o)
    Bt1v = contract("Pac,na->Pcn", df.Bvv, t1)     # (naux, v, o)
    Bt1o = contract("Pib,nb->Pin", df.Bov, t1)     # (naux, o, o)
    l2t1 = contract("nmce,ie->nmci", l2, t1)       # (o, o, v, o)

    # D += l1[mc] tauS[miab]
    X1 = contract("Pam,Pib->miab", Bl1, df.Bov)
    e = contract("miab,miab->", tauS, X1)
    # D += t1[ma] l2[imbc]
    X5 = contract("Pcn,Pib->ncib", Bt1v, df.Bov)
    e += contract("imbc,mcib->", l2, X5)
    if model != "CC2":
        Gvv = build_Gvv(t2, l2)
        # D -= 2 Gvv[ca] t1[ib];  D += Gvv[cb] t1[ia]
        u = contract("Pac,ca->P", df.Bvv, Gvv)
        w = contract("Pib,ib->P", df.Bov, t1)
        e -= 2.0 * contract("P,P->", u, w)
        tg = contract("Pib,cb->Pic", df.Bov, Gvv)
        e += contract("Pci,Pic->", Bt1v, tg)
        # tmp5 = t2[imbe] l2[nmce]:  D += 2 tmp5[ibnc] t1[na]
        #                            D -= tmp5[ianc] t1[nb]
        tmp5 = contract("imbe,nmce->ibnc", t2, l2)
        Y6 = contract("Pac,Pin->acin", df.Bvv, Bt1o)
        e += 2.0 * contract("ibnc,ncib->", tmp5, X5)
        e -= contract("ianc,acin->", tmp5, Y6)
        # D -= (t2[nmab] l2[nmce]) t1[ie]: a t1-dressed vvvv ladder —
        # Z7[nmce] = sum_ab t2[nmab] W[c,e,a,b],
        # W[c,e,a,b] = sum_P Bvv[P,c,a] (sum_i t1[ie] Bov[P,i,b])
        BRe = contract("ie,Pib->Peb", t1, df.Bov)
        Z7 = ladder_apply(df.Bvv.transpose(0, 2, 1), BRe, t2,
                          nblocks=nblocks)
        e -= contract("nmce,nmce->", l2, Z7)
        # tmp8 = t2[niae] l2[nmce]:  D -= tmp8[iamc] t1[mb]
        tmp8 = contract("niae,nmce->iamc", t2, l2)
        e -= contract("iamc,acim->", tmp8, Y6)
        # tmp9 = t2[mibe] l2[nmce]:  D -= tmp9[ibnc] t1[na]
        tmp9 = contract("mibe,nmce->ibnc", t2, l2)
        e -= contract("ibnc,ncib->", tmp9, X5)
    # D -= l2[nmce] t1[ie] t1[na] t1[mb]
    V10 = contract("Pcn,Pim->cnim", Bt1v, Bt1o)
    e -= contract("nmci,cnim->", l2t1, V10)
    return e


def density_energy_df(F, df, t1, t2, l1, l2, no, model="CCSD",
                      Doo=None, Dvv=None, Doooo=None, Dooov=None,
                      Dovov=None, Doovv=None, Gvvvo=None, nblocks=None):
    """(eone, etwo): the density-based correlation energy over factors.

    The o-heavy two-pdm blocks may be passed in (ccdensity caches them);
    when None they are built here.  Equals ccdensity.compute_energy on
    the factor-reconstructed integrals to contraction noise."""
    from ..ccdensity import (build_Doo, build_Dvv, build_Doooo,
                             build_Dooov, build_Dovov, build_Doovv)

    o, v = slice(0, no), slice(no, F.shape[0])
    if Doo is None:
        Doo = build_Doo(model, t1, t2, l1, l2)
    if Dvv is None:
        Dvv = build_Dvv(model, t1, t2, l1, l2)
    eone = (contract("ij,ij->", F[o, o], Doo)
            + contract("ab,ab->", F[v, v], Dvv))

    if Doooo is None:
        Doooo = build_Doooo(model, t1, t2, l2)
    if Dooov is None:
        Dooov = build_Dooov(model, t1, t2, l1, l2)
    if Dovov is None:
        Dovov = build_Dovov(model, t1, t2, l1, l2)
    if Doovv is None:
        Doovv = build_Doovv(model, t1, t2, l1, l2)

    Boo, Bov, Bvv = df.Boo, df.Bov, df.Bvv
    # <ij|kl> = (ik|jl)
    etwo = 0.5 * contract("Pik,Pjl,ijkl->", Boo, Boo, Doooo)
    # <ij|ka> = (ik|ja)
    etwo += contract("Pik,Pja,ijka->", Boo, Bov, Dooov)
    # <ia|jb> = (ij|ab)
    etwo += contract("Pij,Pab,iajb->", Boo, Bvv, Dovov)
    # <ij|ab> = (ia|jb)
    etwo += 0.5 * contract("Pia,Pjb,ijab->", Bov, Bov, Doovv)
    etwo += _evvvv_df(model, df, t1, t2, l2, nblocks=nblocks)
    etwo += _evvvo_df(model, df, t1, t2, l1, l2, nblocks=nblocks)
    if Gvvvo is not None:
        # (T)-density vvvo extra (ccwfn.t3_density's Gvvvo block)
        etwo += _evvvo_extra_df(df, Gvvvo)
    return eone, etwo
