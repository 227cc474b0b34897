"""Genuinely local-scaling lccwfn residuals (CCD), padded-batched.

Batched translation of the reference's overlap-stitched pair-space CCD
equations (/root/reference/pycc/lccwfn.py:201-784, CCD branches): every
per-pair Python loop becomes an einsum over stacked padded tensors.  All
integral transforms (iteration-independent) are precomputed once; each
iteration then costs O(no^4 D^3)-type contractions with NO dependence on
the full virtual dimension — the local-correlation speedup the truncation
exists to deliver.

Index conventions: i,j,m,n occupied; a,b,e,f,x,y padded local-virtual
slots; QLr[i,j] is the (nv, D) canonical->semicanonical-local transform of
pair ij; Sr[i,j,m,n] = QL[ij]^T QL[mn].
"""

import jax
import jax.numpy as jnp

from .ops.contract import contract


def precompute_ccd(H, Local, no, nv):
    """Iteration-independent transformed-integral stacks."""
    o, v = slice(0, no), slice(no, None)
    D = Local.D2
    QLr = Local.QLp.reshape(no, no, nv, D)
    Sr = Local.Sp.reshape(no, no, no, no, D, D)
    E4 = H.ERI[o, o, v, v]
    L4 = H.L[o, o, v, v]

    pre = {}
    pre["QLr"] = QLr
    pre["Sr"] = Sr
    pre["F_oo"] = H.F[o, o]
    pre["ERI_oooo"] = H.ERI[o, o, o, o]
    # local Fock vv blocks
    pre["Fvv"] = contract("ijva,vw,ijwb->ijab", QLr, H.F[v, v], QLr)
    # Fae tail: QL[ij]^T L[mn] QL[mn]
    pre["TL"] = contract("ijva,mnvw,mnwx->ijmnax", QLr, L4, QLr)
    # Fmi tail: (QL[jn]^T L[mn] QL[jn]) rows m
    pre["BL"] = contract("jnva,mnvw,jnwb->jnmab", QLr, L4, QLr)
    # Wmnij tail + r2 seed: QL[ij]^T ERI[mn] QL[ij]
    pre["BE"] = contract("ijva,mnvw,ijwb->ijmnab", QLr, E4, QLr)
    # Wmbej/Wmbje/Wmbie one-electron-like heads
    pre["W1"] = contract("ijvb,mvwj,imwe->ijmbe", QLr, H.ERI[o, v, v, o], QLr)
    pre["W1je"] = contract("ijvb,mvjw,imwe->ijmbe", QLr, H.ERI[o, v, o, v], QLr)
    pre["W1ie"] = contract("ijvb,mviw,mjwe->ijmbe", QLr, H.ERI[o, v, o, v], QLr)
    # cross-pair transformed oovv blocks
    pre["XE"] = contract("imve,mnvw,jnwf->imjnef", QLr, E4, QLr)
    pre["XL"] = contract("imve,mnvw,njwf->imnjef", QLr, L4, QLr)
    pre["XE2"] = contract("jnvf,mnvw,imwe->jnmife", QLr, E4, QLr)
    pre["XE3"] = contract("invf,mnvw,mjwe->inmjfe", QLr, E4, QLr)
    # pair-local vvvv block
    pre["VV"] = contract("ijva,ijwb,vwxy,ijxe,ijyf->ijabef",
                         QLr, QLr, H.ERI[v, v, v, v], QLr, QLr)
    # energy block: QL[ij]^T L[ij] QL[ij]
    pre["Ldiag"] = contract("ijva,ijvw,ijwb->ijab", QLr, L4, QLr)
    # diagonal overlap gathers
    pre["Sijjn"] = jnp.einsum("ijjnby->ijnby", Sr)
    pre["Sijnj"] = jnp.einsum("ijnjby->ijnby", Sr)
    pre["Sijim"] = jnp.einsum("ijimby->ijmby", Sr)
    pre["Sijin"] = jnp.einsum("ijinby->ijnby", Sr)
    pre["Sijmj"] = jnp.einsum("ijmjby->ijmby", Sr)
    return pre


def residuals_ccd_local(pre, t2r):
    """r2 (no,no,D,D) from local CCD equations; t2r is (no,no,D,D)."""
    Sr = pre["Sr"]
    t2s = t2r - t2r.swapaxes(2, 3)

    # Fae
    ST = contract("ijmnax,mnxy->ijmnay", Sr, t2r)
    Fae = pre["Fvv"] - contract("ijmnay,ijmney->ijae", ST, pre["TL"])
    # Fmi
    Fmi = pre["F_oo"] + contract("jnab,jnmab->mj", t2r, pre["BL"])
    # Wmnij
    Wmnij = pre["ERI_oooo"] + contract("ijef,ijmnef->mnij", t2r, pre["BE"])
    # Wmbej
    G = contract("ijnby,jnfy->ijnbf", pre["Sijjn"], t2r)
    Wmbej = pre["W1"] - 0.5 * contract("ijnbf,imjnef->ijmbe", G, pre["XE"])
    G = contract("ijnby,njfy->ijnbf", pre["Sijnj"], t2r)
    Wmbej += 0.5 * contract("ijnbf,imnjef->ijmbe", G, pre["XL"])
    # Wmbje
    G = contract("ijnby,jnxy->ijnbx", pre["Sijjn"], t2r)
    Wmbje = -pre["W1je"] + 0.5 * contract("ijnbx,jnmixe->ijmbe", G, pre["XE2"])
    # Wmbie
    G = contract("ijnby,inxy->ijnbx", pre["Sijin"], t2r)
    Wmbie = -pre["W1ie"] + 0.5 * contract("ijnbx,inmjxe->ijmbe", G, pre["XE3"])

    # r_T2
    r2 = 0.5 * jnp.einsum("ijijab->ijab", pre["BE"])
    r2 += contract("ijae,ijbe->ijab", t2r, Fae)
    r2 += 0.5 * contract("ijef,ijabef->ijab", t2r, pre["VV"])
    D3 = contract("ijmax,imxy,ijmby->ijmab", pre["Sijim"], t2r, pre["Sijim"])
    r2 -= contract("ijmab,mj->ijab", D3, Fmi)
    D5 = contract("ijmax,imxe->ijmae", pre["Sijim"], t2s)
    r2 += contract("ijmae,ijmbe->ijab", D5, Wmbej)
    D6 = contract("ijmax,imxe->ijmae", pre["Sijim"], t2r)
    r2 += contract("ijmae,ijmbe->ijab", D6, Wmbej + Wmbje)
    D7 = contract("ijmax,mjxe->ijmae", pre["Sijmj"], t2r)
    r2 += contract("ijmae,ijmbe->ijab", D7, Wmbie)
    D8 = contract("ijmnay,mnyx,ijmnbx->ijmnab", Sr, t2r, Sr)
    r2 += 0.5 * contract("ijmnab,mnij->ijab", D8, Wmnij)

    return r2 + r2.transpose(1, 0, 3, 2)


def energy_ccd_local(pre, t2r):
    return contract("ijab,ijab->", t2r, pre["Ldiag"])


# ---------------------------------------------------------------------------
# CCSD (local-scaling, padded-batched; lccwfn.py:201-784 else-branches)
# ---------------------------------------------------------------------------

def precompute_ccsd(H, Local, no, nv):
    """Iteration-independent transformed-integral stacks for local CCSD."""
    o, v = slice(0, no), slice(no, None)
    D = Local.D2
    QLr = Local.QLp.reshape(no, no, nv, D)
    QLd = jnp.einsum("iiva->iva", QLr)  # diagonal-pair transforms QL[ii]
    Sr = Local.Sp.reshape(no, no, no, no, D, D)
    E4 = H.ERI[o, o, v, v]
    L4 = H.L[o, o, v, v]
    Eovvv = H.ERI[o, v, v, v]
    Fov = H.F[o, v]

    pre = precompute_ccd(H, Local, no, nv)
    pre["QLd"] = QLd
    pre["Fov_loc"] = contract("mv,ijve->ijme", Fov, QLr)     # F[o,v] QL[ij]
    pre["Fov_ii"] = contract("iv,iva->ia", Fov, QLd)
    pre["FovD"] = contract("mv,jve->jme", Fov, QLd)          # pair jj rows
    # Fae singles tails
    pre["TLm"] = contract("ijva,mvwz,mwb,ijzc->ijmabc",
                          QLr, H.L[o, v, v, v], QLd, QLr)
    pre["TLnn"] = contract("ijve,mnvw,nwf->ijmnef", QLr, L4, QLd)
    # Fmi singles tails
    pre["LooovD"] = contract("mnjv,nve->mnje", H.L[o, o, o, v], QLd)
    pre["TL2"] = contract("mnvw,jve,nwf->mnjef", L4, QLd, QLd)
    # Wmnij singles tails
    pre["EooovD"] = contract("mniv,jve->mnije", H.ERI[o, o, o, v], QLd)
    pre["EoovoD"] = contract("mnvj,ive->mnije", H.ERI[o, o, v, o], QLd)
    pre["TE2"] = contract("mnvw,ive,jwf->mnijef", E4, QLd, QLd)
    # Zmbij
    pre["EovvvP"] = contract("mvwz,ijvb,ijwe,ijzf->ijmbef", Eovvv, QLr, QLr, QLr)
    pre["Eovvv_iijj"] = contract("mvwz,ijvb,iwe,jzf->ijmbef",
                                 Eovvv, QLr, QLd, QLd)
    # Wmbej singles tails
    pre["TE_mbe"] = contract("mvwz,ijvb,imwe,jzf->ijmbef", Eovvv, QLr, QLr, QLd)
    pre["Eoovo_loc"] = contract("mnvj,imve->ijmne", H.ERI[o, o, v, o], QLr)
    pre["XEjj"] = contract("imve,mnvw,jwf->ijmnef", QLr, E4, QLd)
    # Wmbje/Wmbie singles tails
    pre["TE_bFe"] = contract("mvwz,ijvb,jwf,imze->ijmbfe", Eovvv, QLr, QLd, QLr)
    pre["Eooov_loc"] = contract("mnjv,imve->ijmne", H.ERI[o, o, o, v], QLr)
    pre["XE5"] = contract("jvf,mnvw,imwe->ijmnfe", QLd, E4, QLr)
    pre["TE_bFe_mj"] = contract("mvwz,ijvb,iwf,mjze->ijmbfe",
                                Eovvv, QLr, QLd, QLr)
    pre["Eooov_mj"] = contract("mniv,mjve->ijmne", H.ERI[o, o, o, v], QLr)
    pre["XE6"] = contract("ivf,mnvw,mjwe->ijmnfe", QLd, E4, QLr)
    # r_T1 pieces
    pre["Eovvv_mi"] = contract("mvwz,iva,miwe,mizf->imaef", Eovvv, QLd, QLr, QLr)
    pre["Lnvvi"] = contract("nvwi,iva,nwf->inaf", H.L[o, v, v, o], QLd, QLd)
    pre["LoovoD"] = contract("nmvi,mnve->mnie", H.L[o, o, v, o], QLr)
    # r_T2 pieces
    pre["VV2"] = contract("vwxy,ijva,ijwb,ixe,jyf->ijabef",
                          H.ERI[v, v, v, v], QLr, QLr, QLd, QLd)
    pre["Evvvo_loc"] = contract("vwzj,ijva,ijwb,ize->ijabe",
                                H.ERI[v, v, v, o], QLr, QLr, QLd)
    pre["E9"] = contract("mvwj,ijva,iwe->ijmae", H.ERI[o, v, v, o], QLr, QLd)
    pre["E11"] = contract("mvjw,ijva,iwe->ijmae", H.ERI[o, v, o, v], QLr, QLd)
    pre["Eovoo_loc"] = contract("mvij,ijvb->ijmb", H.ERI[o, v, o, o], QLr)
    # energy singles block
    pre["LdiagX"] = contract("ijvw,iva,jwb->ijab", L4, QLd, QLd)
    # extra diagonal overlap gathers
    pre["Sijmm"] = jnp.einsum("ijmmax->ijmax", Sr)
    pre["Sijnn"] = pre["Sijmm"]
    pre["Siimm"] = jnp.einsum("iimmax->imax", Sr)
    pre["Siiim"] = jnp.einsum("iiimax->imax", Sr)
    pre["Siimn"] = jnp.einsum("iimnax->imnax", Sr)
    return pre


def residuals_ccsd_local(pre, t1loc, t2r):
    """(r1 (no,D), r2 (no,no,D,D)) from the local CCSD equations."""
    Sr = pre["Sr"]
    no = t1loc.shape[0]
    t2s = t2r - t2r.swapaxes(2, 3)
    t2s2 = 2.0 * t2r - t2r.swapaxes(2, 3)

    Sb_t1mm = contract("ijmbx,mx->ijmb", pre["Sijmm"], t1loc)
    Sb_t1nn = contract("ijnbx,nx->ijnb", pre["Sijnn"], t1loc)

    # ---- Fae
    ST = contract("ijmnax,mnxy->ijmnay", Sr, t2r)
    Fae = pre["Fvv"] - contract("ijmnay,ijmney->ijae", ST, pre["TL"])
    Fae -= 0.5 * contract("ijma,ijme->ijae", Sb_t1mm, pre["Fov_loc"])
    Fae += contract("mb,ijmabe->ijae", t1loc, pre["TLm"])
    Fae -= 0.5 * contract("ijma,nf,ijmnef->ijae", Sb_t1mm, t1loc, pre["TLnn"])

    # ---- Fmi
    Fmi = pre["F_oo"] + contract("jnab,jnmab->mj", t2r, pre["BL"])
    Fmi += 0.5 * contract("je,jme->mj", t1loc, pre["FovD"])
    Fmi += contract("ne,mnje->mj", t1loc, pre["LooovD"])
    Fmi += 0.5 * contract("je,nf,mnjef->mj", t1loc, t1loc, pre["TL2"])

    # ---- Fme (per pair ij, rows m)
    Fme = pre["Fov_loc"] + contract("nf,ijmnef->ijme", t1loc, pre["TLnn"])
    FmeD = jnp.einsum("jjme->jme", Fme)
    Fme_im = jnp.einsum("imme->ime", Fme)

    # ---- Wmnij
    Wmnij = pre["ERI_oooo"] + contract("ijef,ijmnef->mnij", t2r, pre["BE"])
    Wmnij += contract("je,mnije->mnij", t1loc, pre["EooovD"])
    Wmnij += contract("ie,mnije->mnij", t1loc, pre["EoovoD"])
    Wmnij += contract("ie,jf,mnijef->mnij", t1loc, t1loc, pre["TE2"])

    # ---- Zmbij
    Zmb = contract("ijef,ijmbef->ijmb", t2r, pre["EovvvP"])
    Zmb += contract("ie,jf,ijmbef->ijmb", t1loc, t1loc, pre["Eovvv_iijj"])

    # ---- Wmbej
    G = contract("ijnby,jnfy->ijnbf", pre["Sijjn"], t2r)
    Wmbej = pre["W1"] - 0.5 * contract("ijnbf,imjnef->ijmbe", G, pre["XE"])
    Gn = contract("ijnby,njfy->ijnbf", pre["Sijnj"], t2r)
    Wmbej += 0.5 * contract("ijnbf,imnjef->ijmbe", Gn, pre["XL"])
    Wmbej += contract("jf,ijmbef->ijmbe", t1loc, pre["TE_mbe"])
    Wmbej -= contract("ijnb,ijmne->ijmbe", Sb_t1nn, pre["Eoovo_loc"])
    Wmbej -= contract("jf,ijnb,ijmnef->ijmbe", t1loc, Sb_t1nn, pre["XEjj"])

    # ---- Wmbje
    G = contract("ijnby,jnxy->ijnbx", pre["Sijjn"], t2r)
    Wmbje = -pre["W1je"] + 0.5 * contract("ijnbx,jnmixe->ijmbe", G, pre["XE2"])
    Wmbje -= contract("jf,ijmbfe->ijmbe", t1loc, pre["TE_bFe"])
    Wmbje += contract("ijnb,ijmne->ijmbe", Sb_t1nn, pre["Eooov_loc"])
    Wmbje += contract("jf,ijnb,ijmnfe->ijmbe", t1loc, Sb_t1nn, pre["XE5"])

    # ---- Wmbie
    G = contract("ijnby,inxy->ijnbx", pre["Sijin"], t2r)
    Wmbie = -pre["W1ie"] + 0.5 * contract("ijnbx,inmjxe->ijmbe", G, pre["XE3"])
    Wmbie -= contract("if,ijmbfe->ijmbe", t1loc, pre["TE_bFe_mj"])
    Wmbie += contract("ijnb,ijmne->ijmbe", Sb_t1nn, pre["Eooov_mj"])
    Wmbie += contract("if,ijnb,ijmnfe->ijmbe", t1loc, Sb_t1nn, pre["XE6"])

    # ---- r_T1
    Fae_ii = jnp.einsum("iiae->iae", Fae)
    r1 = pre["Fov_ii"] + contract("ie,iae->ia", t1loc, Fae_ii)
    St1_iimm = contract("imax,mx->ima", pre["Siimm"], t1loc)
    r1 -= contract("ima,mi->ia", St1_iimm, Fmi)
    T1a = contract("imax,imxe->imae", pre["Siiim"], t2s2)
    r1 += contract("imae,ime->ia", T1a, Fme_im)
    r1 += contract("imaef,mief->ia", pre["Eovvv_mi"], t2s2)
    r1 += contract("nf,inaf->ia", t1loc, pre["Lnvvi"])
    ST1 = contract("imnax,mnxe->imnae", pre["Siimn"], t2r)
    r1 -= contract("imnae,mnie->ia", ST1, pre["LoovoD"])

    # ---- r_T2
    r2 = 0.5 * jnp.einsum("ijijab->ijab", pre["BE"])
    r2 += contract("ijae,ijbe->ijab", t2r, Fae)
    r2 += 0.5 * contract("ijef,ijabef->ijab", t2r, pre["VV"])
    r2 += 0.5 * contract("ie,jf,ijabef->ijab", t1loc, t1loc, pre["VV2"])
    r2 += contract("ie,ijabe->ijab", t1loc, pre["Evvvo_loc"])
    r2 -= 0.5 * contract("ijae,ijmb,ijme->ijab", t2r, Sb_t1mm, Fme)
    D3 = contract("ijmax,imxy,ijmby->ijmab", pre["Sijim"], t2r, pre["Sijim"])
    r2 -= contract("ijmab,mj->ijab", D3, Fmi)
    s4 = contract("je,jme->jm", t1loc, FmeD)
    r2 -= 0.5 * contract("ijmab,jm->ijab", D3, s4)
    r2 -= contract("ijma,ijmb->ijab", Sb_t1mm, Zmb)
    D5 = contract("ijmax,imxe->ijmae", pre["Sijim"], t2s)
    r2 += contract("ijmae,ijmbe->ijab", D5, Wmbej)
    D6 = contract("ijmax,imxe->ijmae", pre["Sijim"], t2r)
    r2 += contract("ijmae,ijmbe->ijab", D6, Wmbej + Wmbje)
    D7 = contract("ijmax,mjxe->ijmae", pre["Sijmj"], t2r)
    r2 += contract("ijmae,ijmbe->ijab", D7, Wmbie)
    r2 -= contract("ijma,ie,ijmbe->ijab", Sb_t1mm, t1loc, pre["E9"])
    r2 -= contract("ijmae,ie,ijmb->ijab", pre["E11"], t1loc, Sb_t1mm)
    r2 -= contract("ijma,ijmb->ijab", Sb_t1mm, pre["Eovoo_loc"])
    D8 = contract("ijmnay,mnyx,ijmnbx->ijmnab", Sr, t2r, Sr)
    r2 += 0.5 * contract("ijmnab,mnij->ijab", D8, Wmnij)
    r2 += 0.5 * contract("ijma,ijnb,mnij->ijab", Sb_t1mm, Sb_t1nn, Wmnij)

    return r1, r2 + r2.transpose(1, 0, 3, 2)


def residuals_cc2_local(pre, t1loc, t2r):
    """(r1, r2) from the local CC2 equations (pair-space, overlap-stitched).

    No reference counterpart: the reference's lccwfn implements only
    CCD/CCSD natively (/root/reference/pycc/lccwfn.py:7) and runs CC2 on
    the dense simulation path.  r1 is the full CCSD singles equation
    (CC2's singles are untruncated); r2 keeps only the bare-Fock doubles
    coupling plus T1-dressed integrals, mirroring models/ccsd.residuals_cc2
    term by term in the truncated pair bases."""
    Sr = pre["Sr"]

    Sb_t1mm = contract("ijmbx,mx->ijmb", pre["Sijmm"], t1loc)
    Sb_t1nn = contract("ijnbx,nx->ijnb", pre["Sijnn"], t1loc)

    # ---- full (CCSD) Fae / Fmi / Fme for the singles equation
    t2s2 = 2.0 * t2r - t2r.swapaxes(2, 3)
    ST = contract("ijmnax,mnxy->ijmnay", Sr, t2r)
    Fae = pre["Fvv"] - contract("ijmnay,ijmney->ijae", ST, pre["TL"])
    Fae -= 0.5 * contract("ijma,ijme->ijae", Sb_t1mm, pre["Fov_loc"])
    Fae += contract("mb,ijmabe->ijae", t1loc, pre["TLm"])
    Fae -= 0.5 * contract("ijma,nf,ijmnef->ijae", Sb_t1mm, t1loc, pre["TLnn"])

    Fmi = pre["F_oo"] + contract("jnab,jnmab->mj", t2r, pre["BL"])
    Fmi += 0.5 * contract("je,jme->mj", t1loc, pre["FovD"])
    Fmi += contract("ne,mnje->mj", t1loc, pre["LooovD"])
    Fmi += 0.5 * contract("je,nf,mnjef->mj", t1loc, t1loc, pre["TL2"])

    Fme = pre["Fov_loc"] + contract("nf,ijmnef->ijme", t1loc, pre["TLnn"])
    Fme_im = jnp.einsum("imme->ime", Fme)

    Fae_ii = jnp.einsum("iiae->iae", Fae)
    r1 = pre["Fov_ii"] + contract("ie,iae->ia", t1loc, Fae_ii)
    St1_iimm = contract("imax,mx->ima", pre["Siimm"], t1loc)
    r1 -= contract("ima,mi->ia", St1_iimm, Fmi)
    T1a = contract("imax,imxe->imae", pre["Siiim"], t2s2)
    r1 += contract("imae,ime->ia", T1a, Fme_im)
    r1 += contract("imaef,mief->ia", pre["Eovvv_mi"], t2s2)
    r1 += contract("nf,inaf->ia", t1loc, pre["Lnvvi"])
    ST1 = contract("imnax,mnxe->imnae", pre["Siimn"], t2r)
    r1 -= contract("imnae,mnie->ia", ST1, pre["LoovoD"])

    # ---- CC2 doubles: bare Fock coupling + T1-dressed integrals
    # effective fae/fmi fold the two canonical 0.5-halves into weight 1
    fae = pre["Fvv"] - contract("ijmb,ijme->ijbe", Sb_t1mm, pre["Fov_loc"])
    fmi = pre["F_oo"] + contract("je,jme->mj", t1loc, pre["FovD"])

    Wmnij = pre["ERI_oooo"]
    Wmnij += contract("je,mnije->mnij", t1loc, pre["EooovD"])
    Wmnij += contract("ie,mnije->mnij", t1loc, pre["EoovoD"])
    Wmnij += contract("ie,jf,mnijef->mnij", t1loc, t1loc, pre["TE2"])

    Zmb = contract("ie,jf,ijmbef->ijmb", t1loc, t1loc, pre["Eovvv_iijj"])

    r2 = 0.5 * jnp.einsum("ijijab->ijab", pre["BE"])
    r2 += contract("ijae,ijbe->ijab", t2r, fae)
    D3 = contract("ijmax,imxy,ijmby->ijmab", pre["Sijim"], t2r, pre["Sijim"])
    r2 -= contract("ijmab,mj->ijab", D3, fmi)
    r2 += 0.5 * contract("ijma,ijnb,mnij->ijab", Sb_t1mm, Sb_t1nn, Wmnij)
    r2 += 0.5 * contract("ie,jf,ijabef->ijab", t1loc, t1loc, pre["VV2"])
    r2 -= contract("ijma,ijmb->ijab", Sb_t1mm, Zmb)
    r2 -= contract("ijma,ie,ijmbe->ijab", Sb_t1mm, t1loc, pre["E9"])
    r2 -= contract("ijmae,ie,ijmb->ijab", pre["E11"], t1loc, Sb_t1mm)
    r2 += contract("ie,ijabe->ijab", t1loc, pre["Evvvo_loc"])
    r2 -= contract("ijma,ijmb->ijab", Sb_t1mm, pre["Eovoo_loc"])

    return r1, r2 + r2.transpose(1, 0, 3, 2)


def energy_ccsd_local(pre, t1loc, t2r):
    e = 2.0 * contract("ia,ia->", pre["Fov_ii"], t1loc)
    e += contract("ijab,ijab->", t2r, pre["Ldiag"])
    e += contract("ia,jb,ijab->", t1loc, t1loc, pre["LdiagX"])
    return e
