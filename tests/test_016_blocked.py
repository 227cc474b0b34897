"""Blocked Hamiltonian storage (models/blocked.py): six unique Dirac blocks
replace full ERI + L in the iterative solve.

Oracle: the frozen CCSD energy (reference test_002_ccsd_energy.py:40) must
come out identically through the blocked path, and every derived view must
match the corresponding dense slice bit-for-bit.
"""

import contextlib
import io

import numpy as np
import pycc_tpu
from pycc_tpu.models.blocked import blocks_from_full, blocked_views
from pycc_tpu.models.ccsd import slices
from pycc_tpu.utils.synth import synthetic_hamiltonian
from .common import scf


def test_all_sixteen_patterns_and_L():
    no, nv = 5, 7
    H = synthetic_hamiltonian(no, nv, seed=3)
    ERI, L = np.asarray(H.ERI), np.asarray(H.L)
    bE, bL = blocked_views(blocks_from_full(H.ERI, no), no)
    o, v = slices(no)
    sl = {"o": o, "v": v}
    for i in range(16):
        pat = "".join("ov"[(i >> k) & 1] for k in (3, 2, 1, 0))
        key = tuple(sl[c] for c in pat)
        assert np.array_equal(ERI[key], np.asarray(bE[key])), pat
        assert np.array_equal(L[key], np.asarray(bL[key])), pat


def test_blocked_ccsd_oracle():
    wfn = scf("H2O", "cc-pvdz", freeze_core=True)
    with contextlib.redirect_stdout(io.StringIO()):
        cc = pycc_tpu.ccwfn(wfn, storage="blocked")
        ecc = cc.solve_cc(1e-12, 1e-12)
    assert abs(ecc - -0.222029814166783) < 1e-11


def test_blocked_matches_dense_cc3_and_fused():
    wfn = scf("H2O", "cc-pvdz", freeze_core=True)
    with contextlib.redirect_stdout(io.StringIO()):
        e_d = pycc_tpu.ccwfn(wfn, model="CC3").solve_cc(1e-12, 1e-12)
        e_b = pycc_tpu.ccwfn(wfn, model="CC3",
                             storage="blocked").solve_cc(1e-12, 1e-12)
        e_f = pycc_tpu.ccwfn(wfn, storage="blocked").solve_cc_fused(1e-12,
                                                                    1e-12)
    assert abs(e_d - e_b) < 1e-13
    assert abs(e_f - -0.222029814166783) < 1e-11


def test_bad_storage_rejected():
    wfn = scf("He", "cc-pvdz", freeze_core=False)
    try:
        pycc_tpu.ccwfn(wfn, storage="sparse")
        assert False, "should have raised"
    except Exception as e:
        assert "sparse" in str(e)


def test_bf16_gated_solve():
    """bf16 residual gating (solve_cc(bf16_until=...)): early iterations
    contract from bfloat16 blocks, full precision after the gate; the fixed
    point equals the frozen oracle."""
    wfn = scf("H2O", "sto-3g", freeze_core=True)
    with contextlib.redirect_stdout(io.StringIO()):
        cc = pycc_tpu.ccwfn(wfn, storage="blocked")
        ecc = cc.solve_cc(1e-12, 1e-12, bf16_until=1e-3)
    assert abs(ecc - -0.070616830152761) < 1e-11


def test_bf16_requires_blocked():
    wfn = scf("He", "cc-pvdz", freeze_core=False)
    with contextlib.redirect_stdout(io.StringIO()):
        cc = pycc_tpu.ccwfn(wfn)
    try:
        cc.solve_cc(1e-8, 1e-8, bf16_until=1e-3)
        assert False, "should have raised"
    except Exception as e:
        assert "blocked" in str(e)


def test_bf16_noise_floor_guard():
    """A pathological bf16_until below the bf16 noise floor must not
    diverge: the guard rolls back and finishes in full precision."""
    wfn = scf("H2O", "sto-3g", freeze_core=True)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cc = pycc_tpu.ccwfn(wfn, storage="blocked")
        ecc = cc.solve_cc(1e-12, 1e-12, bf16_until=1e-14)
    assert abs(ecc - -0.070616830152761) < 1e-11
    assert "noise floor" in buf.getvalue()


def test_sharded_blocked_step_matches():
    """shard_blocks over the 8-device mesh: the blocked CCSD residual under
    GSPMD equals the single-device result."""
    import jax
    import numpy as np
    from pycc_tpu.models import ccsd as eqs
    from pycc_tpu.models.blocked import blocked_views
    from pycc_tpu.parallel import make_mesh, shard_amps, shard_blocks
    from pycc_tpu.utils.synth import mp2_guess

    no, nv = 4, 16
    H = synthetic_hamiltonian(no, nv, seed=9)
    t1, t2, _ = mp2_guess(H)
    t1 = t1 + 0.01
    blocks = blocks_from_full(H.ERI, no)

    @jax.jit
    def step(F, blocks, t1, t2):
        bE, bL = blocked_views(blocks, no)
        return eqs.residuals_ccsd(F, bE, bL, t1, t2, no)

    r1s, r2s = step(H.F, blocks, t1, t2)
    mesh = make_mesh(n_devices=8)
    r1m, r2m = step(H.F, shard_blocks(blocks, mesh),
                    *shard_amps(t1, t2, mesh))
    assert np.abs(np.asarray(r1s - r1m)).max() < 1e-13
    assert np.abs(np.asarray(r2s - r2m)).max() < 1e-13


def test_sharded_blocked_ri_split_rt_rhs():
    """The fully-composed configuration — GSPMD-sharded Dirac blocks +
    real/imag-split complex amplitudes driving the RT T+Lambda RHS —
    matches the single-device result (every architectural axis composes)."""
    import jax
    import numpy as np
    import jax.numpy as jnp
    from pycc_tpu.cclambda import lambda_residuals_from_F
    from pycc_tpu.models.blocked import blocked_views
    from pycc_tpu.models.ccsd import residuals_ccsd
    from pycc_tpu.ops.ctensor import CTensor
    from pycc_tpu.parallel import make_mesh, shard_blocks
    from pycc_tpu.utils.synth import mp2_guess

    no, nv = 4, 16
    H = synthetic_hamiltonian(no, nv, seed=11)
    t1r, t2r, _ = mp2_guess(H)
    rng = np.random.default_rng(2)
    t1 = CTensor(jnp.asarray(t1r + 0.01),
                 jnp.asarray(0.003 * rng.standard_normal((no, nv))))
    t2 = CTensor(t2r,
                 jnp.asarray(0.002 * rng.standard_normal((no, no, nv, nv))))
    l1, l2 = 2.0 * t1, 2.0 * (2.0 * t2 - t2.swapaxes(2, 3))
    blocks = blocks_from_full(H.ERI, no)

    @jax.jit
    def rhs(F, blocks, t1, t2, l1, l2):
        bE, bL = blocked_views(blocks, no)
        rt1, rt2 = residuals_ccsd(F, bE, bL, t1, t2, no)
        rl1, rl2 = lambda_residuals_from_F("CCSD", F, bE, bL,
                                           t1, t2, l1, l2, no)
        return rt2.re, rt2.im, rl2.re, rl2.im

    single = rhs(H.F, blocks, t1, t2, l1, l2)
    mesh = make_mesh(n_devices=8)
    sharded = rhs(H.F, shard_blocks(blocks, mesh), t1, t2, l1, l2)
    for a, b in zip(single, sharded):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-12


def test_bf16_gated_solve_df():
    """bf16 gating extends to storage='df': early residuals contract from
    bfloat16 Cholesky factors (half the factor footprint), full precision
    after the gate; the fixed point equals the frozen oracle."""
    wfn = scf("H2O", "sto-3g", freeze_core=True)
    with contextlib.redirect_stdout(io.StringIO()):
        cc = pycc_tpu.ccwfn(wfn, storage="df")
        ecc = cc.solve_cc(1e-12, 1e-12, bf16_until=1e-3)
    assert abs(ecc - -0.070616830152761) < 1e-10
