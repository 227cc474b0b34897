"""Density-based energy from DF factors (models/dfdensity.py).

The factor-wise two-electron energy (vvvv via the a-blocked ladder,
every Dvvvo term re-associated through B) must equal the dense
ccdensity.compute_energy on the factor-reconstructed integrals —
for arbitrary (non-physical) amplitudes, so every term is checked
individually, for all three ground-state models.

Reference: /root/reference/pycc/ccdensity.py:500-614 requires the dense
MO ERI; its density energy cannot run where only factors exist.
"""

from types import SimpleNamespace

import numpy as np
import jax.numpy as jnp
import pytest

from pycc_tpu.ccdensity import ccdensity
from pycc_tpu.hamiltonian import build_hamiltonian
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
    nact = ERI.shape[0]
    nv = nact - no
    B = cholesky_factor_eri(ERI, tol=1e-14)
    rec = np.einsum("Ppr,Pqs->pqrs", B, B)
    rng = np.random.default_rng(24)
    t1 = jnp.asarray(0.05 * rng.standard_normal((no, nv)))
    t2 = jnp.asarray(0.05 * rng.standard_normal((no, no, nv, nv)))
    l1 = jnp.asarray(0.05 * rng.standard_normal((no, nv)))
    l2 = jnp.asarray(0.05 * rng.standard_normal((no, no, nv, nv)))
    return H, B, rec, t1, t2, l1, l2, no, nact


def _energies(setup, model):
    H, B, rec, t1, t2, l1, l2, no, nact = setup
    F = jnp.asarray(H.F)
    lam = SimpleNamespace(l1=l1, l2=l2)
    cc_dense = SimpleNamespace(
        model=model, t1=t1, t2=t2, no=no, nact=nact, storage="full",
        o=slice(0, no), v=slice(no, nact),
        H=SimpleNamespace(F=F, ERI=jnp.asarray(rec)))
    e_dense = ccdensity(cc_dense, lam).compute_energy()
    cc_df = SimpleNamespace(
        model=model, t1=t1, t2=t2, no=no, nact=nact, storage="df",
        o=slice(0, no), v=slice(no, nact),
        H=SimpleNamespace(F=F, ERI=None),
        dfb=df_blocks(jnp.asarray(B), no), _df_nblocks=None)
    e_df = ccdensity(cc_df, lam).compute_energy()
    return e_dense, e_df


@pytest.mark.parametrize("model", ["CCD", "CC2", "CCSD"])
def test_density_energy_df_equals_dense(setup, model):
    e_dense, e_df = _energies(setup, model)
    assert abs(e_dense - e_df) < 1e-11, (model, e_dense, e_df)


GEOM_T = """
O 0.000000000000000   0.000000000000000   0.143225857166674
H 0.000000000000000  -1.638037301628121  -1.136549142277225
H 0.000000000000000   1.638037301628121  -1.136549142277225
symmetry c1
units bohr
"""


def test_ccsd_t_density_df_oracles():
    """CCSD(T) density chain entirely over factors: solve + (T)-density
    extras (factor-assembled slices), Lambda S1/S2, density energy with
    the Gvvvo extra contracted a-mapped — against test_011's frozen Psi4
    oracles (exact factors, so 1e-9 headroom covers the 1e-14 Cholesky)."""
    import contextlib
    import io

    import pycc_tpu

    wfn = run_rhf(GEOM_T, "sto-3g", freeze_core=False)
    H = build_hamiltonian(wfn, host=True)
    B = cholesky_factor_eri(np.asarray(H.ERI), tol=1e-14)
    with contextlib.redirect_stdout(io.StringIO()):
        cc = pycc_tpu.ccwfn.from_df_factors(B, np.asarray(H.F), H.no,
                                            model="CCSD(T)")
        cc.make_t3_density = True
        cc.solve_cc(1e-12, 1e-12, 75, max_diis=0)
        hbar = pycc_tpu.cchbar(cc)
        lam = pycc_tpu.cclambda(cc, hbar)
        lcc = lam.solve_lambda(1e-12, 1e-12, 75, max_diis=0)
        dens = pycc_tpu.ccdensity(cc, lam)
        dens.compute_energy()
    assert abs(lcc - -0.069084521221746) < 1e-9
    assert abs(dens.eone - 0.104463374777302) < 1e-9
    assert abs(dens.etwo - -0.175243393781829) < 1e-9
