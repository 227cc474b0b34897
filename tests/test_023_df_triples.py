"""(T) from Cholesky/DF factors (triples.t_vikings_scan, storage='df').

The factor-assembled integral slices must reproduce the dense slab scan
exactly (both sides see the factor-reconstructed integrals, so equality
holds to f64 contraction noise), and the end-to-end
ccwfn.from_df_factors(model='CCSD(T)') solve must land on the dense
ccwfn CCSD(T) energy when the factors are exact.

Reference counterpart: /root/reference/pycc/cctriples.py:106-217, which
requires the dense MO ERI (hamiltonian.py:36-39) — its (T) cannot run
where only factors exist.
"""

from types import SimpleNamespace

import numpy as np
import jax.numpy as jnp
import pytest

from pycc_tpu import ccwfn
from pycc_tpu.hamiltonian import build_hamiltonian
from pycc_tpu.models.dfccsd import df_blocks
from pycc_tpu.ops.cholesky import cholesky_factor_eri
from pycc_tpu.scf import run_rhf
from pycc_tpu.triples import t_vikings_scan

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
    rng = np.random.default_rng(23)
    # arbitrary (non-symmetrized) amplitudes: the slice derivations must
    # hold term-by-term, not only on the physical t2 symmetry manifold
    t1 = jnp.asarray(0.05 * rng.standard_normal((no, nv)))
    t2 = jnp.asarray(0.05 * rng.standard_normal((no, no, nv, nv)))
    return wfn, H, B, rec, L, t1, t2, no


def test_df_scan_equals_dense_scan(setup):
    wfn, H, B, rec, L, t1, t2, no = setup
    F = jnp.asarray(H.F)
    dense_cc = SimpleNamespace(
        storage="full", no=no, t1=t1, t2=t2,
        H=SimpleNamespace(F=F, ERI=jnp.asarray(rec), L=jnp.asarray(L)))
    df_cc = SimpleNamespace(
        storage="df", no=no, t1=t1, t2=t2,
        H=SimpleNamespace(F=F), dfb=df_blocks(jnp.asarray(B), no))
    e_dense = float(t_vikings_scan(dense_cc))
    e_df = float(t_vikings_scan(df_cc))
    assert abs(e_dense - e_df) < 1e-11


def test_df_chunked_equals_df_scan(setup):
    """The k-chunked single-resident path (t_vikings_scan_df_chunked)
    reproduces the slice-assembled df scan exactly, with a chunk size
    that forces multiple k-windows AND the label-permuted Evovv."""
    from pycc_tpu.triples import t_vikings_scan_df_chunked

    wfn, H, B, rec, L, t1, t2, no = setup
    F = jnp.asarray(H.F)
    dfb = df_blocks(jnp.asarray(B), no)
    df_cc = SimpleNamespace(
        storage="df", no=no, t1=t1, t2=t2,
        H=SimpleNamespace(F=F), dfb=dfb)
    e_scan = float(t_vikings_scan(df_cc))
    assert no % 2 == 0 and no > 2  # the kc=2 case below must chunk
    e_chunk = float(t_vikings_scan_df_chunked(dfb, F, t1, t2, no, kc=2))
    assert abs(e_scan - e_chunk) < 1e-12
    e_chunk1 = float(t_vikings_scan_df_chunked(dfb, F, t1, t2, no, kc=no))
    assert abs(e_scan - e_chunk1) < 1e-12


def test_from_df_factors_ccsd_t_solve(setup):
    wfn, H, B, rec, L, t1, t2, no = setup
    cc_dense = ccwfn(wfn, model="CCSD(T)")
    e_dense = cc_dense.solve_cc(e_conv=1e-11, r_conv=1e-11)
    cc_df = ccwfn.from_df_factors(B, np.asarray(H.F), no,
                                  model="CCSD(T)")
    e_df = cc_df.solve_cc(e_conv=1e-11, r_conv=1e-11)
    # exact factors: same fixed point and same (T); the two (T) drivers
    # (t_tjl vs the factor-assembled slab scan) agree to contraction noise
    assert abs(e_dense - e_df) < 1e-9
