"""DF response (models/dfresponse.py): the factor-implicit perturbed-
wave-function residuals equal the dense ccresponse path when built from
exact Cholesky factors, and the end-to-end storage='df' polarizability
matches storage='full'.

Dense side: ccresponse.r_X / in_Y1 / in_Y2 / r_Y — the rebuild of
/root/reference/pycc/ccresponse.py:479-823; the reference itself has no
factorized response (its property surface exists only as far as the
dense tensors reach).
"""

import contextlib
import io

import numpy as np
import jax.numpy as jnp
import pytest

from pycc_tpu import ccresponse as _crmod  # noqa: F401 (class shadow)
import pycc_tpu.ccresponse
import sys

cr = sys.modules["pycc_tpu.ccresponse"]
from pycc_tpu.cchbar import build_hbar
from pycc_tpu.hamiltonian import build_hamiltonian
from pycc_tpu.models import dfhbar as dfq
from pycc_tpu.models import dfresponse as dfr
from pycc_tpu.models.dfccsd import df_blocks, _eri_oovv
from pycc_tpu.ops.cholesky import cholesky_factor_eri
from pycc_tpu.scf import run_rhf

from .common import H2O as H2O_GEOM


class _CC:
    def __init__(self, no, nv, t1, t2, storage):
        self.o = slice(0, no)
        self.v = slice(no, no + nv)
        self.t1, self.t2, self.storage = t1, t2, storage


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
    rng = np.random.default_rng(7)
    t1 = jnp.asarray(0.05 * rng.standard_normal((no, nv)))
    # NOT pair-symmetrized: equalities must hold term-by-term
    t2 = jnp.asarray(0.05 * rng.standard_normal((no, no, nv, nv)))
    F = jnp.asarray(H.F)
    df = df_blocks(jnp.asarray(B), no)
    dense = build_hbar("CCSD", F, jnp.asarray(rec), jnp.asarray(L),
                       t1, t2, no)
    dfh = dfq.build_hbar_df(F, df, t1, t2, no)
    aux = cr.build_response_aux(dense)
    Loovv = dfq.loovv_df(df)
    Eoovv = _eri_oovv(df)
    nact = no + nv
    pert = jnp.asarray(rng.standard_normal((nact, nact)))
    pert = pert + pert.T
    Ad_dense = vars(cr.pertbar(pert, _CC(no, nv, t1, t2, "full")))
    Ad_df = vars(cr.pertbar(pert, _CC(no, nv, t1, t2, "df")))
    assert "Avvvo" not in Ad_df
    Loovv_shim = cr._OovvOnly(jnp.asarray(L[:no, :no, no:, no:]))
    Eoovv_shim = cr._OovvOnly(jnp.asarray(rec[:no, :no, no:, no:]))
    return dict(dense=dense, dfh=dfh, aux=aux, Loovv=Loovv, Eoovv=Eoovv,
                Ld=Loovv_shim, Ed=Eoovv_shim, Ad=Ad_dense, Ad_df=Ad_df,
                t1=t1, t2=t2, no=no, nv=nv, rng=rng)


def _close(a, b, tol=1e-11):
    return np.abs(np.asarray(a) - np.asarray(b)).max() < tol


def test_rX_df(setup):
    s = setup
    no, nv, rng = s["no"], s["nv"], s["rng"]
    X1 = jnp.asarray(rng.standard_normal((no, nv)))
    X2 = jnp.asarray(rng.standard_normal((no, no, nv, nv)))
    omega = 0.0656
    r1_ref, r2_ref = cr.r_X(s["dense"], s["Ld"], s["t2"], s["Ad"], omega,
                            X1, X2, no, s["aux"])
    r1, r2 = dfr.rX_df(s["dfh"], s["Loovv"], s["t1"], s["t2"], s["Ad_df"],
                       omega, X1, X2, no)
    assert _close(r1_ref, r1)
    assert _close(r2_ref, r2)


def test_inY_df(setup):
    s = setup
    no, nv, rng = s["no"], s["nv"], s["rng"]
    X1 = jnp.asarray(rng.standard_normal((no, nv)))
    X2 = jnp.asarray(rng.standard_normal((no, no, nv, nv)))
    l1 = jnp.asarray(rng.standard_normal((no, nv)))
    l2 = jnp.asarray(rng.standard_normal((no, no, nv, nv)))
    i1_ref = cr.in_Y1(s["dense"], s["Ld"], s["t2"], l1, l2, s["Ad"],
                      X1, X2, no, s["aux"])
    i2_ref = cr.in_Y2(s["dense"], s["Ld"], s["Ed"], s["t2"], l1, l2,
                      s["Ad"], X1, X2, no, s["aux"])
    i1 = dfr.inY1_df(s["dfh"], s["Loovv"], s["Eoovv"], s["t1"], s["t2"],
                     l1, l2, s["Ad_df"], s["Ad_df"]["pert_ov"], X1, X2, no)
    i2 = dfr.inY2_df(s["dfh"], s["Loovv"], s["Eoovv"], s["t1"], s["t2"],
                     l1, l2, s["Ad_df"], X1, X2, no)
    assert _close(i1_ref, i1)
    assert _close(i2_ref, i2)


def test_rY_df(setup):
    s = setup
    no, nv, rng = s["no"], s["nv"], s["rng"]
    Y1 = jnp.asarray(rng.standard_normal((no, nv)))
    Y2 = jnp.asarray(rng.standard_normal((no, no, nv, nv)))
    imY1 = jnp.asarray(rng.standard_normal((no, nv)))
    imY2 = jnp.asarray(rng.standard_normal((no, no, nv, nv)))
    omega = 0.0656
    r1_ref, r2_ref = cr.r_Y(s["dense"], s["Ld"], s["t2"], imY1, imY2,
                            omega, Y1, Y2, no, s["aux"])
    r1, r2 = dfr.rY_df(s["dfh"], s["Loovv"], s["t1"], s["t2"], imY1, imY2,
                       omega, Y1, Y2, no)
    assert _close(r1_ref, r1)
    assert _close(r2_ref, r2)


def test_df_polarizability_end_to_end():
    """storage='df' solve -> DF-HBAR -> DF-Lambda -> DF response:
    the full linresp polarizability tensor equals the storage='full'
    path, with no ov^3/v^4 object anywhere in the df branch."""
    import pycc_tpu

    wfn = run_rhf(H2O_GEOM, "sto-3g", freeze_core=True)
    omega = 0.0656
    out = {}
    for storage in ("full", "df"):
        with contextlib.redirect_stdout(io.StringIO()):
            kw = {"storage": "df", "df_tol": 1e-13} if storage == "df" else {}
            cc = pycc_tpu.ccwfn(wfn, **kw)
            cc.solve_cc(e_conv=1e-12, r_conv=1e-12)
            hbar = pycc_tpu.cchbar(cc)
            lam = pycc_tpu.cclambda(cc, hbar)
            lam.solve_lambda(e_conv=1e-12, r_conv=1e-12)
            dens = pycc_tpu.ccdensity(cc, lam, onlyone=True)
            resp = pycc_tpu.ccresponse(dens)
            out[storage] = resp.linresp("MU", "MU", omega)
    assert np.abs(out["df"] - out["full"]).max() < 1e-8, (
        out["df"], out["full"])
