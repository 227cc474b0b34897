"""DF-HBAR (models/dfhbar.py): explicit blocks and implicit-big-block
consumers equal the dense HBAR path when built from exact Cholesky factors.

Both sides see the SAME integrals (the factor reconstruction), so
equalities hold to float64 contraction noise (~1e-11), independent of the
Cholesky truncation error.  Dense side: cchbar.build_hbar — the rebuild of
/root/reference/pycc/cchbar.py; the reference itself has no factorized
HBAR (its post-convergence stack exists only as far as the dense tensors
reach, /root/reference/pycc/cchbar.py:170-327).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pycc_tpu.cchbar import build_hbar
from pycc_tpu.hamiltonian import build_hamiltonian
from pycc_tpu.models import dfhbar as dfq
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
    rng = np.random.default_rng(11)
    t1 = jnp.asarray(0.05 * rng.standard_normal((no, nv)))
    # deliberately NOT pair-symmetrized: the factor derivations must hold
    # term-by-term for arbitrary t2, catching transposition errors that the
    # physical symmetry t2[ijab]=t2[jiba] would mask
    t2 = jnp.asarray(0.05 * rng.standard_normal((no, no, nv, nv)))
    F = jnp.asarray(H.F)
    df = df_blocks(jnp.asarray(B), no)
    dense = build_hbar("CCSD", F, jnp.asarray(rec), jnp.asarray(L),
                       t1, t2, no)
    dfh = dfq.build_hbar_df(F, df, t1, t2, no)
    return dense, dfh, t1, t2, no, nv, rng


def _close(a, b, tol=1e-11):
    return np.abs(np.asarray(a) - np.asarray(b)).max() < tol


def test_explicit_blocks(setup):
    dense, dfh, *_ = setup
    for name in ("Hov", "Hvv", "Hoo", "Hoooo", "Hooov", "Hovvo",
                 "Hovov", "Hovoo"):
        assert _close(getattr(dense, name), getattr(dfh, name)), name


def test_hvovv_consumers(setup):
    dense, dfh, t1, t2, no, nv, rng = setup
    C1 = jnp.asarray(rng.standard_normal((no, nv)))
    C2 = jnp.asarray(rng.standard_normal((no, no, nv, nv)))
    l1 = jnp.asarray(rng.standard_normal((no, nv)))
    Gvv = jnp.asarray(rng.standard_normal((nv, nv)))
    Hvovv = dense.Hvovv

    ref = (2.0 * np.einsum("amef,mf->ae", Hvovv, C1)
           - np.einsum("amfe,mf->ae", Hvovv, C1))
    assert _close(ref, dfq.zvv_c1_hvovv(dfh, C1))

    ref = (2.0 * np.einsum("imef,amef->ia", C2, Hvovv)
           - np.einsum("imef,amfe->ia", C2, Hvovv))
    assert _close(ref, dfq.r1_c2_hvovv(dfh, C2))

    ref = (-2.0 * np.einsum("ef,eifa->ia", Gvv, Hvovv)
           + np.einsum("ef,eiaf->ia", Gvv, Hvovv))
    assert _close(ref, dfq.r1_gvv_hvovv(dfh, Gvv))

    ref = (2.0 * np.einsum("ie,ejab->ijab", l1, Hvovv)
           - np.einsum("ie,ejba->ijab", l1, Hvovv))
    assert _close(ref, dfq.r2_l1_hvovv(dfh, l1))


def test_hvvvv_ladder(setup):
    dense, dfh, t1, t2, no, nv, rng = setup
    x2 = jnp.asarray(rng.standard_normal((no, no, nv, nv)))
    ref = 0.5 * np.einsum("ijef,efab->ijab", x2, dense.Hvvvv)
    assert _close(ref, dfq.hvvvv_x2_df(dfh, t2, x2))
    # blocked path == single-shot path
    assert _close(dfq.hvvvv_x2_df(dfh, t2, x2, nblocks=2),
                  dfq.hvvvv_x2_df(dfh, t2, x2, nblocks=1))


def test_hvvvo_consumers(setup):
    dense, dfh, t1, t2, no, nv, rng = setup
    l2 = jnp.asarray(rng.standard_normal((no, no, nv, nv)))
    C1 = jnp.asarray(rng.standard_normal((no, nv)))

    ref = np.einsum("imef,efam->ia", l2, dense.Hvvvo)
    assert _close(ref, dfq.r1_l2_hvvvo(dfh, t1, t2, l2, dfh.Hov))

    ref = np.einsum("ie,abej->ijab", C1, dense.Hvvvo)
    assert _close(ref, dfq.s2_c1_hvvvo(dfh, t1, t2, C1, dfh.Hov))


def test_lambda_residuals_df(setup):
    from pycc_tpu.cclambda import lambda_residuals

    dense, dfh, t1, t2, no, nv, rng = setup
    l1 = jnp.asarray(rng.standard_normal((no, nv)))
    l2r = rng.standard_normal((no, no, nv, nv))
    l2 = jnp.asarray(l2r + l2r.transpose(1, 0, 3, 2))
    rec = np.einsum("Ppr,Pqs->pqrs",
                    np.asarray(jnp.concatenate(
                        [jnp.concatenate([dfh.df.Boo, dfh.df.Bov], axis=2),
                         jnp.concatenate([dfh.df.Bov.transpose(0, 2, 1),
                                          dfh.df.Bvv], axis=2)], axis=1)),
                    np.asarray(jnp.concatenate(
                        [jnp.concatenate([dfh.df.Boo, dfh.df.Bov], axis=2),
                         jnp.concatenate([dfh.df.Bov.transpose(0, 2, 1),
                                          dfh.df.Bvv], axis=2)], axis=1)))
    L = 2.0 * rec - rec.swapaxes(2, 3)
    nact = no + nv
    F = jnp.zeros((nact, nact))  # F only enters dense r-L via hb; unused
    r1_ref, r2_ref = lambda_residuals("CCSD", dense, F, jnp.asarray(rec),
                                      jnp.asarray(L), t1, t2, l1, l2, no)
    r1, r2 = dfq.lambda_residuals_df(dfh, t1, t2, l1, l2, no)
    assert _close(r1_ref, r1)
    assert _close(r2_ref, r2)


def test_eom_sigmas_df(setup):
    from pycc_tpu.cceom import sigma1, sigma2
    from pycc_tpu.models.ccsd import slices

    dense, dfh, t1, t2, no, nv, rng = setup
    C1 = jnp.asarray(rng.standard_normal((no, nv)))
    C2 = jnp.asarray(rng.standard_normal((no, no, nv, nv)))
    Loovv = dfq.loovv_df(dfh.df)

    class _L:
        def __getitem__(self, key):
            return Loovv

    s1_ref = sigma1(dense, C1, C2, _L(), no)
    s2_ref = sigma2(dense, C1, C2, _L(), t2, no)
    assert _close(s1_ref, dfq.sigma1_df(dfh, C1, C2, Loovv, no))
    assert _close(s2_ref, dfq.sigma2_df(dfh, C1, C2, Loovv, t1, t2, no))


def test_df_lambda_eom_end_to_end():
    """The full post-convergence stack under storage='df': solve_cc ->
    DF-HBAR -> Lambda -> EOM, no tensor larger than o^2 v^2 anywhere.
    Oracles: the frozen Psi4 pseudoenergy (tests/test_005) and the dense
    storage='full' EOM roots computed side by side."""
    import contextlib
    import io

    import pycc_tpu

    wfn = run_rhf(H2O_GEOM, "sto-3g", freeze_core=True)
    with contextlib.redirect_stdout(io.StringIO()):
        cc = pycc_tpu.ccwfn(wfn, storage="df", df_tol=1e-13)
        ecc = cc.solve_cc(e_conv=1e-12, r_conv=1e-12)
        hbar = pycc_tpu.cchbar(cc)
        lam = pycc_tpu.cclambda(cc, hbar)
        lecc = lam.solve_lambda(e_conv=1e-12, r_conv=1e-12)
    assert abs(ecc - -0.070616830152761) < 1e-9
    assert lam.converged
    assert abs(lecc - -0.068826452648939) < 1e-9

    with contextlib.redirect_stdout(io.StringIO()):
        eom = pycc_tpu.cceom(hbar)
        E, C = eom.solve_eom(N=3, e_conv=1e-8, r_conv=1e-7)

        ccd_full = pycc_tpu.ccwfn(wfn)
        ccd_full.solve_cc(e_conv=1e-12, r_conv=1e-12)
        hbar_full = pycc_tpu.cchbar(ccd_full)
        eom_full = pycc_tpu.cceom(hbar_full)
        E_ref, _ = eom_full.solve_eom(N=3, e_conv=1e-8, r_conv=1e-7)
    assert eom.converged and eom_full.converged
    assert np.allclose(E, E_ref, atol=1e-7), (E, E_ref)

    # the big-system host-sequenced per-vector sigma gives the same roots
    eom.sigma_sequential = True
    with contextlib.redirect_stdout(io.StringIO()):
        E_seq, _ = eom.solve_eom(N=3, e_conv=1e-8, r_conv=1e-7,
                                 device_subspace=False)
    assert np.allclose(E_seq, E_ref, atol=1e-7), (E_seq, E_ref)

    # ... and so does the device-resident Davidson over the DF sigma
    with contextlib.redirect_stdout(io.StringIO()):
        E_dev, _ = eom.solve_eom(N=3, e_conv=1e-8, r_conv=1e-7,
                                 device_subspace=True)
    assert np.allclose(E_dev, E_ref, atol=1e-7), (E_dev, E_ref)


def test_cc2_hbar_and_lambda_df(setup):
    """model='CC2' DF-HBAR blocks and Lambda residuals equal the dense
    CC2 branch (cchbar.py:94-137, cclambda.py:56-61/78-82) given exact
    factors: the CC2 doubles blocks are pure t1-dressed integrals (the
    dressed-factor bilinears), plus bare-Fock t2 terms."""
    from pycc_tpu.cclambda import lambda_residuals

    dense_ccsd, dfh, t1, t2, no, nv, rng = setup
    df = dfh.df
    B = jnp.concatenate(
        [jnp.concatenate([df.Boo, df.Bov], axis=2),
         jnp.concatenate([df.Bov.transpose(0, 2, 1), df.Bvv], axis=2)],
        axis=1)
    rec = np.einsum("Ppr,Pqs->pqrs", np.asarray(B), np.asarray(B))
    L = 2.0 * rec - rec.swapaxes(2, 3)
    nact = no + nv
    rngF = np.random.default_rng(23)
    Fs = rngF.standard_normal((nact, nact))
    F = jnp.asarray(0.1 * (Fs + Fs.T) + np.diag(np.arange(nact, dtype=float)))

    dense = build_hbar("CC2", F, jnp.asarray(rec), jnp.asarray(L),
                       t1, t2, no)
    dfh2 = dfq.build_hbar_df(F, df, t1, t2, no, model="CC2")
    for name in ("Hov", "Hvv", "Hoo", "Hoooo", "Hooov", "Hovvo",
                 "Hovov", "Hovoo"):
        assert _close(getattr(dense, name), getattr(dfh2, name)), name

    l2 = jnp.asarray(rng.standard_normal((no, no, nv, nv)))
    o = slice(0, no)
    v = slice(no, None)
    ref = np.einsum("imef,efam->ia", l2, dense.Hvvvo)
    assert _close(ref, dfq.r1_l2_hvvvo(dfh2, t1, t2, l2, F[o, v], cc2=True))

    l1 = jnp.asarray(rng.standard_normal((no, nv)))
    l2s = l2 + l2.transpose(1, 0, 3, 2)
    r1_ref, r2_ref = lambda_residuals("CC2", dense, F, jnp.asarray(rec),
                                      jnp.asarray(L), t1, t2, l1, l2s, no)
    r1, r2 = dfq.lambda_residuals_df(dfh2, t1, t2, l1, l2s, no,
                                     model="CC2", F=F)
    assert _close(r1_ref, r1)
    assert _close(r2_ref, r2)


def test_df_lambda_ccd_model():
    """CCD and CC2 Lambda under storage='df' equal the dense branches:
    CCD because the CCSD HBAR/residual forms reduce to the CCD ones at
    t1 = l1 = 0 (r1 pinned to zero); CC2 through its own factor-implicit
    forms (models/dfhbar.py _lambda_residuals_cc2_df)."""
    import contextlib
    import io

    import pycc_tpu

    wfn = run_rhf(H2O_GEOM, "sto-3g", freeze_core=True)
    for model in ("CCD", "CC2"):
        with contextlib.redirect_stdout(io.StringIO()):
            cc_f = pycc_tpu.ccwfn(wfn, model=model, storage="df",
                                  df_tol=1e-13)
            cc_f.solve_cc(e_conv=1e-12, r_conv=1e-12)
            lam_f = pycc_tpu.cclambda(cc_f, pycc_tpu.cchbar(cc_f))
            le_f = lam_f.solve_lambda(e_conv=1e-12, r_conv=1e-12)
            cc_d = pycc_tpu.ccwfn(wfn, model=model)
            cc_d.solve_cc(e_conv=1e-12, r_conv=1e-12)
            lam_d = pycc_tpu.cclambda(cc_d, pycc_tpu.cchbar(cc_d))
            le_d = lam_d.solve_lambda(e_conv=1e-12, r_conv=1e-12)
        assert lam_f.converged and lam_d.converged, model
        assert abs(le_f - le_d) < 1e-9, (model, le_f, le_d)
        assert np.abs(np.asarray(lam_f.l1)
                      - np.asarray(lam_d.l1)).max() < 1e-7, model


def test_split_lambda_equals_fused():
    """The at-scale two-program DF Lambda residual (lambda_r2_seed_df +
    lambda_r1_r2_finish_df, auto-selected at no*nv^3 > 2e8) equals the
    fused lambda_residuals_df path exactly."""
    import io
    import contextlib
    import pycc_tpu
    from .common import scf
    wfn = scf("H2O", "sto-3g", freeze_core=True)
    with contextlib.redirect_stdout(io.StringIO()):
        cc = pycc_tpu.ccwfn(wfn, storage="df")
        cc.solve_cc(e_conv=1e-12, r_conv=1e-12)
        hbar = pycc_tpu.cchbar(cc)
        lam = pycc_tpu.cclambda(cc, hbar)
        p0 = lam.solve_lambda(e_conv=1e-11, r_conv=1e-10)
        cc._force_split_lambda = True
        lam2 = pycc_tpu.cclambda(cc, hbar)
        p1 = lam2.solve_lambda(e_conv=1e-11, r_conv=1e-10)
    assert abs(p1 - p0) < 1e-13, (p0, p1)
