"""RT with local filters, autocorrelation, pertcheck property operators,
field plumbing, and SP-precision consistency.

Oracles: test_019_localrt.py:83-144 (frozen complex RT trajectories),
test_026_autocorrelation.py:63, test_027_linresp.py:42-82 (pseudoresponses
for mu/m/p/Q operators), test_014_field.py (internal consistency),
test_030_sp.py (SP behavior; f32 is summation-order-dependent so SP is
validated against the DP result, not the reference's frozen f32 bits).
"""

import contextlib
import io

import numpy as np

import pycc_tpu
from pycc_tpu.rt.integrators import rk4
from pycc_tpu.rt.lasers import gaussian_laser, sine_square_laser
from .common import scf


def _pipeline(mol, basis, **kw):
    wfn = scf(mol, basis, freeze_core=False)
    with contextlib.redirect_stdout(io.StringIO()):
        cc = pycc_tpu.ccwfn(wfn, **kw)
        cc.solve_cc(1e-13, 1e-13, 200)
        hbar = pycc_tpu.cchbar(cc)
        lam = pycc_tpu.cclambda(cc, hbar)
        lam.solve_lambda(1e-13, 1e-13)
        dens = pycc_tpu.ccdensity(cc, lam)
    return cc, lam, dens


def _rt_local(local, cutoff):
    cc, lam, dens = _pipeline("H2O", "cc-pvdz", local=local,
                              local_cutoff=cutoff, filter=True)
    V = gaussian_laser(0.001, 0, 0.01, center=0.05)
    rt = pycc_tpu.rtcc(cc, lam, dens, V)
    y0 = rt.collect_amps(cc.t1, cc.t2, lam.l1, lam.l2, 0).astype("complex128")
    with contextlib.redirect_stdout(io.StringIO()):
        ret = rt.propagate(rk4(0.02), y0, 0.5, ti=0)
    return ret["0.50"]


def test_rt_pno():
    r = _rt_local("PNO", 1e-5)
    ref = {"ecc": -84.21331867940133, "mu_x": -5.106207671158796e-05,
           "mu_y": -5.001503722097678e-05, "mu_z": -0.06905411053873889}
    for k, v in ref.items():
        assert abs(complex(r[k]).real - v) < 1e-8, k


def test_rt_pao():
    r = _rt_local("PAO", 1e-2)
    ref = {"ecc": -84.21540972040579, "mu_x": -4.987717148832141e-05,
           "mu_y": -4.707786986481166e-05, "mu_z": -0.0783037960868978}
    for k, v in ref.items():
        assert abs(complex(r[k]).real - v) < 1e-8, k


def test_autocorrelation_he():
    from scipy.integrate import complex_ode as ode
    cc, lam, dens = _pipeline("He", "cc-pvdz")
    V = sine_square_laser(1.0, 2.87, 5.0)
    rt = pycc_tpu.rtcc(cc, lam, dens, V)
    y0 = rt.collect_amps(cc.t1, cc.t2, lam.l1, lam.l2, 0).astype("complex128")
    ODE = ode(rt.f).set_integrator("vode", atol=1e-13, rtol=1e-13)
    ODE.set_initial_value(y0, 0)
    while ODE.successful() and ODE.t < 1.0:
        y = ODE.integrate(ODE.t + 0.01)
    A = rt.autocorrelation(y0, y)
    ref = -0.967109840555436 + 0.250976568630115j
    assert abs(A - ref) < 1e-9


def test_pertcheck_operators():
    cc, lam, dens = _pipeline("H2O", "sto-3g")
    with contextlib.redirect_stdout(io.StringIO()):
        resp = pycc_tpu.ccresponse(dens)
        check = resp.pertcheck(0.01)
    ref = {
        "MU_X_0.010000": 0.059711553704, "MU_Y_0.010000": 7.341419446523,
        "MU_Z_0.010000": 3.071438076138, "MU_X_-0.010000": 0.056273457658,
        "M_X_0.010000": 0.607770924164, "M_Y_0.010000": 0.710225214533,
        "M_Z_0.010000": 0.775111802368, "M*_X_-0.010000": 0.586575382108,
        "P_X_-0.010000": 0.097163221394, "P_Y_-0.010000": 2.169072875250,
        "P_Z_-0.010000": 1.497365713340, "P*_X_0.010000": 0.103276788499,
    }
    for k, v in ref.items():
        assert abs(complex(check[k]).real - v) < 1e-10, k
    # quadrupole pseudoresponses are origin-sensitive and pin the isotope
    # masses (scf/mol.py MASSES): 1e-10 requires the AME2016 values
    refQ = {"Q_XX_0.010000": 5.942498696750, "Q_YZ_0.010000": 19.240803761856,
            "Q_ZZ_0.010000": 0.250165812115, "Q_XY_-0.010000": 0.192591582644}
    for k, v in refQ.items():
        assert abs(complex(check[k]).real - v) < 1e-10, k


def test_field_plumbing():
    cc, lam, dens = _pipeline("(H2)_2", "6-31g")
    V = gaussian_laser(0.01, 0, 0.01, center=0.05)
    rt = pycc_tpu.rtcc(cc, lam, dens, V, magnetic=True)
    ref_mu_tot = sum(np.asarray(m) for m in cc.H.mu) / np.sqrt(3.0)
    assert np.allclose(ref_mu_tot, np.asarray(rt.mu_tot))
    rt2 = pycc_tpu.rtcc(cc, lam, dens, V, magnetic=True, kick="Y")
    assert np.allclose(np.asarray(cc.H.mu[1]), np.asarray(rt2.mu_tot))


def test_sp_precision_consistency():
    wfn = scf("H2O", "cc-pvdz", freeze_core=False)
    with contextlib.redirect_stdout(io.StringIO()):
        dp = pycc_tpu.ccwfn(wfn)
        e_dp = dp.solve_cc(1e-10, 1e-10)
        sp = pycc_tpu.ccwfn(wfn, precision="SP")
        e_sp = sp.solve_cc(1e-7, 1e-7)
    assert abs(e_sp - e_dp) < 2e-3
    assert sp.t2.dtype == "float32"
