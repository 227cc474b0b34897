"""CC3 over Cholesky/DF factors (models/cc3.py cc3_intermediates_df /
residuals_cc3_scan_df): the factor-assembled T1-dressed W intermediates,
the slab-scanned residuals, and the end-to-end storage='df' CC3 solve all
equal the dense path given exact factors.

The reference's CC3 exists only as far as the dense MO ERI reaches
(/root/reference/pycc/ccwfn.py:371-404 via hamiltonian.py:36-39) — CC3
from factors has no counterpart there.
"""

import contextlib
import io

import numpy as np
import jax.numpy as jnp
import pytest

import pycc_tpu
from pycc_tpu.hamiltonian import build_hamiltonian
from pycc_tpu.models import cc3 as cc3q
from pycc_tpu.models.dfccsd import df_blocks
from pycc_tpu.ops.cholesky import cholesky_factor_eri
from pycc_tpu.scf import run_rhf

from .common import H2O as H2O_GEOM


@pytest.fixture(scope="module")
def setup():
    wfn = run_rhf(H2O_GEOM, "sto-3g", freeze_core=True)
    H = build_hamiltonian(wfn, host=True)
    ERI = np.asarray(H.ERI)
    no = H.no
    nv = ERI.shape[0] - no
    B = cholesky_factor_eri(ERI, tol=1e-14)
    rec = np.einsum("Ppr,Pqs->pqrs", B, B)
    L = 2.0 * rec - rec.swapaxes(2, 3)
    rng = np.random.default_rng(31)
    t1 = jnp.asarray(0.05 * rng.standard_normal((no, nv)))
    # NOT pair-symmetrized: the factor derivations must hold term by term
    t2 = jnp.asarray(0.05 * rng.standard_normal((no, no, nv, nv)))
    df = df_blocks(jnp.asarray(B), no)
    return (wfn, jnp.asarray(H.F), jnp.asarray(rec), jnp.asarray(L),
            df, t1, t2, no)


def _close(a, b, tol=1e-11):
    return np.abs(np.asarray(a) - np.asarray(b)).max() < tol


def test_cc3_intermediates_df(setup):
    wfn, F, rec, L, df, t1, t2, no = setup
    dense = cc3q.cc3_intermediates(rec, t1, no)
    from_df = cc3q.cc3_intermediates_df(df, t1, no)
    for name, d, f in zip(("Wmnij", "Wmbij", "Wmnie", "Wamef", "Wabei"),
                          dense, from_df):
        assert _close(d, f), name
    # scan layout == slab_layouts of the standard layout
    from pycc_tpu.triples import slab_layouts
    Wabei_o, Wmbij_t = slab_layouts(dense[4], dense[1])
    _, Wmbij_s, _, _, Wabei_s = cc3q.cc3_intermediates_df(
        df, t1, no, scan_layout=True)
    assert _close(Wabei_o, Wabei_s)
    assert _close(Wmbij_t, Wmbij_s)


def test_cc3_residuals_df(setup):
    wfn, F, rec, L, df, t1, t2, no = setup
    r1_ref, r2_ref = cc3q.residuals_cc3(F, rec, L, t1, t2, no)
    r1, r2 = cc3q.residuals_cc3_scan_df(F, df, t1, t2, no)
    assert _close(r1_ref, r1)
    assert _close(r2_ref, r2)
    # the host-stepped rows path from factors
    r1h, r2h = cc3q.residuals_cc3_rows(F, None, None, t1, t2, no, dfb=df)
    assert _close(r1_ref, r1h)
    assert _close(r2_ref, r2h)


def test_cc3_lambda_intermediates_df(setup):
    wfn, F, rec, L, df, t1, t2, no = setup
    nv = t2.shape[2]
    Wmbje_d, Wmbej_d, Wabef_d = cc3q.cc3_lambda_intermediates(rec, t1, no)
    Wmbje, Wmbej, Bd = cc3q.cc3_lambda_intermediates_df(df, t1, no)
    assert _close(Wmbje_d, Wmbje)
    assert _close(Wmbej_d, Wmbej)
    # the implicit Wvvvv: dressed bilinear == dense Wabef, probed through
    # the one consumer contraction (cc3_lambda_extra_rows Y1 term)
    rng = np.random.default_rng(7)
    Z = jnp.asarray(rng.standard_normal((nv, no, nv, nv)))
    ref = np.einsum("bide,deab->ia", np.asarray(Z), np.asarray(Wabef_d))
    from pycc_tpu.ops.contract import contract
    K = contract("bide,Peb->Pid", Z, Bd)
    got = contract("Pid,Pda->ia", K, Bd)
    assert _close(ref, got)


def test_cc3_lambda_extras_df(setup):
    wfn, F, rec, L, df, t1, t2, no = setup
    nv = t2.shape[2]
    rng = np.random.default_rng(5)
    l1 = jnp.asarray(0.05 * rng.standard_normal((no, nv)))
    l2r = 0.05 * rng.standard_normal((no, no, nv, nv))
    l2 = jnp.asarray(l2r + l2r.transpose(1, 0, 3, 2))
    Y1_ref, Y2_ref = cc3q.cc3_lambda_extra_rows(F, rec, L, t1, t2,
                                                l1, l2, no)
    Y1, Y2 = cc3q.cc3_lambda_extra_rows(F, None, None, t1, t2, l1, l2,
                                        no, dfb=df)
    assert _close(Y1_ref, Y1)
    assert _close(Y2_ref, Y2)


def test_cc3_df_lambda_end_to_end(setup):
    """storage='df' Lambda-CC3 (CCSD-form DF-HBAR residuals + factor-
    assembled host-rows extras) converges to the dense pseudoenergy."""
    wfn = setup[0]
    with contextlib.redirect_stdout(io.StringIO()):
        cc_d = pycc_tpu.ccwfn(wfn, model="CC3")
        cc_d.solve_cc(e_conv=1e-11, r_conv=1e-11)
        lam_d = pycc_tpu.cclambda(cc_d, pycc_tpu.cchbar(cc_d))
        le_d = lam_d.solve_lambda(e_conv=1e-11, r_conv=1e-11)
        cc_f = pycc_tpu.ccwfn(wfn, model="CC3", storage="df", df_tol=1e-13)
        cc_f.solve_cc(e_conv=1e-11, r_conv=1e-11)
        lam_f = pycc_tpu.cclambda(cc_f, pycc_tpu.cchbar(cc_f))
        le_f = lam_f.solve_lambda(e_conv=1e-11, r_conv=1e-11)
    assert lam_d.converged and lam_f.converged
    assert abs(le_d - le_f) < 1e-9, (le_d, le_f)
    assert np.abs(np.asarray(lam_d.l1) - np.asarray(lam_f.l1)).max() < 1e-7


def test_cc3_onepdm_df(setup):
    """The CC3 one-pdm over factors (cc3_onepdm_rows via
    cc3_lambda_prep_df) equals the dense rows path on arbitrary
    amplitudes."""
    from types import SimpleNamespace

    from pycc_tpu.models.cc3 import cc3_onepdm_rows

    wfn, F, rec, L, df, t1, t2, no = setup
    nv = t2.shape[2]
    rng = np.random.default_rng(13)
    l1 = jnp.asarray(0.05 * rng.standard_normal((no, nv)))
    l2r = 0.05 * rng.standard_normal((no, no, nv, nv))
    l2 = jnp.asarray(l2r + l2r.transpose(1, 0, 3, 2))
    H_d = SimpleNamespace(F=F, ERI=rec, L=L)
    cc_d = SimpleNamespace(no=no, nv=nv, nact=no + nv, model="CC3",
                           storage="full", H=H_d, t3_scan=None)
    cc_f = SimpleNamespace(no=no, nv=nv, nact=no + nv, model="CC3",
                           storage="df", dfb=df, t3_scan=None,
                           H=SimpleNamespace(F=F, ERI=None, L=None))
    o1_d, oc_d = cc3_onepdm_rows(cc_d, t1, t2, l1, l2)
    o1_f, oc_f = cc3_onepdm_rows(cc_f, t1, t2, l1, l2)
    assert _close(o1_d, o1_f)
    assert _close(oc_d, oc_f)


def test_cc3_df_lambda_split_equals_fused(setup):
    """The at-scale five-program DF Lambda split (auto-selected at
    no*nv^3 > 2e8, forced here) serves CC3 too: the split evaluates the
    CCSD-form residual with the CC3 extras folded into S1/S2 by the
    host-rows path."""
    wfn = setup[0]
    with contextlib.redirect_stdout(io.StringIO()):
        cc = pycc_tpu.ccwfn(wfn, model="CC3", storage="df", df_tol=1e-13)
        cc.solve_cc(e_conv=1e-11, r_conv=1e-11)
        hbar = pycc_tpu.cchbar(cc)
        lam = pycc_tpu.cclambda(cc, hbar)
        p0 = lam.solve_lambda(e_conv=1e-11, r_conv=1e-10)
        cc._force_split_lambda = True
        lam2 = pycc_tpu.cclambda(cc, hbar)
        p1 = lam2.solve_lambda(e_conv=1e-11, r_conv=1e-10)
    assert abs(p1 - p0) < 1e-12, (p0, p1)


def test_cc3_df_solve_end_to_end(setup):
    """storage='df' CC3 converges to the dense CC3 energy (and to the
    frozen Psi4 CC3 oracle through it, tests/test_004)."""
    wfn = setup[0]
    with contextlib.redirect_stdout(io.StringIO()):
        cc_d = pycc_tpu.ccwfn(wfn, model="CC3")
        e_d = cc_d.solve_cc(e_conv=1e-11, r_conv=1e-11)
        cc_f = pycc_tpu.ccwfn(wfn, model="CC3", storage="df", df_tol=1e-13)
        e_f = cc_f.solve_cc(e_conv=1e-11, r_conv=1e-11)
    assert abs(e_d - e_f) < 1e-9, (e_d, e_f)

    # from prepared factors, without an SCF object (the at-scale entry)
    H = build_hamiltonian(wfn, host=True)
    B = cholesky_factor_eri(np.asarray(H.ERI), tol=1e-13)
    with contextlib.redirect_stdout(io.StringIO()):
        cc_p = pycc_tpu.ccwfn.from_df_factors(B, np.asarray(H.F), H.no,
                                              model="CC3")
        e_p = cc_p.solve_cc(e_conv=1e-11, r_conv=1e-11)
    assert abs(e_d - e_p) < 1e-9, (e_d, e_p)


def test_cc3_rows_chunked_equals_unchunked(setup):
    """The k-chunked CC3 row (auto-selected past 2^27 no*v^3 elements,
    where the unchunked row's simultaneous slab temps compile-OOM —
    uracil/aug-cc-pVDZ measured 27.7 GB) accumulates identical X1/X2,
    including the real_time perturbation branch."""
    import jax

    from pycc_tpu.ops.ctensor import ct_zeros_like

    wfn, F, rec, L, df, t1, t2, no = setup
    prep = jax.jit(cc3q.cc3_scan_prep_df,
                   static_argnames=("no", "real_time", "nblocks"))
    (r1, r2, Fme, Wamef, Wmnie, Wabei_o, Wmbij_t,
     eps, Lo, Vov) = prep(F, df, t1, t2, no=no, real_time=False, F_ref=F,
                          nblocks=None)
    for rt, vov in ((False, Vov), (True, 0.01 * jnp.ones_like(Vov))):
        Xa = (ct_zeros_like(r1), ct_zeros_like(r2))
        Xb = (ct_zeros_like(r1), ct_zeros_like(r2))
        for i in range(no):
            Xa = cc3q._cc3_row_xs(jnp.asarray(i), Xa, Wabei_o, Wmbij_t,
                                  t2, eps, Lo, Fme, Wamef, Wmnie, vov,
                                  no=no, real_time=rt)
            Xb = cc3q._cc3_row_xs_chunked(jnp.asarray(i), Xb, Wabei_o,
                                          Wmbij_t, t2, eps, Lo, Fme,
                                          Wamef, Wmnie, vov, no=no,
                                          real_time=rt, kc=2)
        assert _close(Xa[0], Xb[0], 1e-12), rt
        assert _close(Xa[1], Xb[1], 1e-12), rt


def test_cc3_lambda_t3_row_chunked_equals_unchunked(setup):
    """The k-chunked t3-side Lambda-CC3 row (auto-selected past 2^27
    no*v^3 elements; the unchunked row compile-OOM'd at 18.8 GB at
    uracil/aug-cc-pVDZ) accumulates identical Zmndi/Zmdfa/Znf."""
    import jax

    wfn, F, rec, L, df, t1, t2, no = setup
    rng = np.random.default_rng(23)
    nv = t2.shape[-1]
    l2 = jnp.asarray(0.05 * rng.standard_normal((no, no, nv, nv)))
    prep = jax.jit(cc3q.cc3_lambda_prep_df,
                   static_argnames=("no", "real_time"))
    (Fov, Wmnij, Wmnie, Wamef, Wabei_o, Wmbij_t, _, _, _,
     eps, Lo, Eo, Vov) = prep(F, df, t1, t2, no=no, real_time=False,
                              F_ref=F)
    for rt, vov in ((False, Vov), (True, 0.01 * jnp.ones_like(Vov))):
        z = lambda sh: jnp.zeros(sh, t2.dtype)
        ca = (z((no, no, nv, no)), z((no, nv, nv, nv)), z((no, nv)))
        cb = (z((no, no, nv, no)), z((no, nv, nv, nv)), z((no, nv)))
        for l in range(no):
            ca = cc3q._cc3_lambda_row_t3(jnp.asarray(l), ca, Wabei_o,
                                         Wmbij_t, t2, l2, eps, Lo, Eo,
                                         vov, no=no, real_time=rt)
            cb = cc3q._cc3_lambda_row_t3_chunked(
                jnp.asarray(l), cb, Wabei_o, Wmbij_t, t2, l2, eps, Lo,
                Eo, vov, no=no, real_time=rt, kc=2)
        for x, y in zip(ca, cb):
            assert _close(x, y, 1e-12), rt


def test_cc3_lambda_l3_row_chunked_equals_unchunked(setup):
    """The j-chunked l3-side Lambda-CC3 row (the unchunked slab's ~6
    simultaneous permutation temps compile-OOM at uracil/aug-cc-pVDZ)."""
    import jax

    wfn, F, rec, L, df, t1, t2, no = setup
    rng = np.random.default_rng(29)
    nv = t2.shape[-1]
    l1 = jnp.asarray(0.05 * rng.standard_normal((no, nv)))
    l2 = jnp.asarray(0.05 * rng.standard_normal((no, no, nv, nv)))
    prep = jax.jit(cc3q.cc3_lambda_prep_df,
                   static_argnames=("no", "real_time"))
    (Fov, Wmnij, Wmnie, Wamef, Wabei_o, Wmbij_t, _, _, _,
     eps, Lo, Eo, Vov) = prep(F, df, t1, t2, no=no, real_time=False,
                              F_ref=F)
    z = lambda sh: jnp.zeros(sh, t2.dtype)
    shapes = ((nv, no, nv, nv), (nv, no, nv, nv), (nv, no, nv, nv),
              (no, no, no, nv), (no, no, no, nv), (no, no, no, nv),
              (no, no, nv, nv))
    # independent buffers: the row programs DONATE the carry
    ca = tuple(z(sh) for sh in shapes)
    cb = tuple(z(sh) for sh in shapes)
    for k in range(no):
        ca = cc3q._cc3_lambda_row_l3(jnp.asarray(k), ca, t2, l1, l2, Fov,
                                     Wamef, Wmnie, Wabei_o, Wmbij_t, eps,
                                     Lo, no=no)
        cb = cc3q._cc3_lambda_row_l3_chunked(
            jnp.asarray(k), cb, t2, l1, l2, Fov, Wamef, Wmnie, Wabei_o,
            Wmbij_t, eps, Lo, no=no, kc=2)
    for x, y in zip(ca, cb):
        assert _close(x, y, 1e-12)
