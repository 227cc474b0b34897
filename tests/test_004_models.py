"""CCD / CC2 / CCSD(T) energies vs the reference suite's frozen values.

Oracles: test_017_ccd.py:31 (CFOUR-checked CCD), test_020_cc2.py:31,
test_005_ccsd_t_energy.py:37,49 (three mutually-agreeing (T) algorithms).
"""

import contextlib
import io

import pycc_tpu
from pycc_tpu.triples import t_tjl, t_vikings, t_vikings_inverted
from .common import scf


def _solve(cc, **kw):
    with contextlib.redirect_stdout(io.StringIO()):
        return cc.solve_cc(e_conv=1e-12, r_conv=1e-12, maxiter=100, **kw)


def test_ccd_h2o():
    wfn = scf("H2O", "cc-pvdz", freeze_core=False)
    cc = pycc_tpu.ccwfn(wfn, model="CCD")
    ecc = _solve(cc)
    assert abs(ecc - -0.222559319034) < 1e-11


def test_cc2_h2o():
    wfn = scf("H2O", "cc-pvdz", freeze_core=False)
    cc = pycc_tpu.ccwfn(wfn, model="CC2")
    ecc = _solve(cc)
    assert abs(ecc - -0.215857544656) < 1e-11


def test_ccsd_t_h2o_sto3g():
    wfn = scf("H2O", "sto-3g")
    cc = pycc_tpu.ccwfn(wfn, model="CCSD(T)")
    _solve(cc)
    epsi4 = -0.000099957499645
    assert abs(float(t_vikings(cc)) - epsi4) < 1e-11
    assert abs(float(t_vikings_inverted(cc)) - epsi4) < 1e-11
    assert abs(float(t_tjl(cc)) - epsi4) < 1e-11


def test_ccsd_t_h2o_ccpvdz():
    wfn = scf("H2O", "cc-pvdz")
    cc = pycc_tpu.ccwfn(wfn, model="CCSD(T)")
    _solve(cc)
    epsi4 = -0.003861236558801
    assert abs(float(t_vikings(cc)) - epsi4) < 1e-11
    assert abs(float(t_vikings_inverted(cc)) - epsi4) < 1e-11
    assert abs(float(t_tjl(cc)) - epsi4) < 1e-11


def test_ccsd_t_scan_matches_full():
    """Memory-scalable occupied-sliced (T) equals the full-tensor driver."""
    from pycc_tpu.triples import t_vikings_scan
    wfn = scf("H2O", "cc-pvdz")
    cc = pycc_tpu.ccwfn(wfn, model="CCSD(T)")
    _solve(cc)
    assert abs(float(t_vikings(cc)) - float(t_vikings_scan(cc))) < 1e-14


def test_cc2_lambda_density_h2o():
    """CC2 Lambda pseudoenergy + density energy (test_020_cc2.py:36-42)."""
    wfn = scf("H2O", "cc-pvdz", freeze_core=False)
    cc = pycc_tpu.ccwfn(wfn, model="CC2")
    ecc = _solve(cc)
    with contextlib.redirect_stdout(io.StringIO()):
        hbar = pycc_tpu.cchbar(cc)
        lam = pycc_tpu.cclambda(cc, hbar)
        lcc = lam.solve_lambda(1e-12, 1e-12)
        dens = pycc_tpu.ccdensity(cc, lam)
        edens = dens.compute_energy()
    assert abs(lcc - -0.215765740373555) < 1e-11
    assert abs(edens - ecc) < 1e-11


def test_cc2_h2():
    """CC2 + Lambda for H2/cc-pVDZ (test_020_cc2.py:46-80)."""
    wfn = scf("H2", "cc-pvdz", freeze_core=False)
    cc = pycc_tpu.ccwfn(wfn, model="CC2")
    ecc = _solve(cc)
    assert abs(ecc - -0.026445902512140185) < 1e-11
    with contextlib.redirect_stdout(io.StringIO()):
        hbar = pycc_tpu.cchbar(cc)
        lam = pycc_tpu.cclambda(cc, hbar)
        lcc = lam.solve_lambda(1e-12, 1e-12)
    assert abs(lcc - -0.026443139737993) < 1e-11


def test_ccsd_t_scan_roofline_knobs():
    """The bandwidth-roofline knobs of the slab scan (PERF.md "Triples
    roofline"): a wider j-chunk is EXACTLY the same arithmetic (bit-level
    reassociation only at the chunk boundary), and a bf16 slab build
    reproduces the (T) correction to bf16 statistical noise while the
    energies accumulate in f32."""
    import jax.numpy as jnp
    from pycc_tpu.triples import t_vikings_scan
    wfn = scf("H2O", "cc-pvdz")
    with contextlib.redirect_stdout(io.StringIO()):
        cc = pycc_tpu.ccwfn(wfn)
        cc.solve_cc(1e-10, 1e-10)
    et = float(t_vikings_scan(cc))
    # jc must divide no; H2O/cc-pVDZ fzc has no=4
    et_jc4 = float(t_vikings_scan(cc, jc=4))
    assert abs(et - et_jc4) < 1e-13
    et_bf16 = float(t_vikings_scan(cc, slab_dtype=jnp.bfloat16))
    assert abs(et_bf16 - et) < 5e-3 * abs(et), (et_bf16, et)
    # the accumulation stayed wide: the result is not itself bf16-grainy
    assert abs(et_bf16 - et) > 0.0
