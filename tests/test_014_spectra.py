"""Spectral post-processing unit tests (pure math, no chemistry).

The reference validates FT/Padé/denoise/damp/FWHM against stored .npy
artifacts (test_008..test_012); here the oracles are analytic signals.
"""

import numpy as np
from pycc_tpu.rt.utils import FT, FWHM, Pade, damp, denoise


def test_ft_peak_location():
    dt = 0.05
    w0 = 2.0
    t = np.arange(4000) * dt
    sig = np.cos(w0 * t)
    freq, spec = FT(sig, dt=dt)
    peak = freq[np.argmax(np.abs(spec))]
    assert abs(peak - w0) < 0.05


def test_pade_peak_location():
    dt = 0.05
    w0 = 2.0
    t = np.arange(2001) * dt
    sig = np.cos(w0 * t) * np.exp(-t / 50.0)
    p = Pade(sig, dt=dt)
    p.build()
    o = np.linspace(0.5, 4.0, 700)
    F = p.approx(o)
    peak = o[np.argmax(np.abs(F))]
    assert abs(peak - w0) < 0.02


def test_pade_solvers_agree():
    rng = np.random.default_rng(0)
    sig = rng.standard_normal(101)
    p1 = Pade(sig, dt=0.1)
    p1.build(toeplitz_solver=True)
    p2 = Pade(sig, dt=0.1)
    p2.build(toeplitz_solver=False)
    o = np.linspace(0, 5, 50)
    assert np.allclose(p1.approx(o), p2.approx(o), rtol=1e-6, atol=1e-8)


def test_denoise_removes_noise():
    dt = 0.05
    n = 2000
    t = np.arange(n) * dt
    # integer number of periods -> signal power concentrates in two bins
    w0 = 2 * np.pi * 32 / (n * dt)
    clean = np.cos(w0 * t)
    rng = np.random.default_rng(1)
    noisy = clean + 0.01 * rng.standard_normal(n)
    out = denoise(noisy, filter_level=1.0, timestep=dt)
    assert np.mean((out - clean) ** 2) < np.mean((noisy - clean) ** 2)


def test_damp():
    f = np.ones(100)
    out = damp(f, 0.1, 5.0)
    assert np.allclose(out, np.exp(-np.arange(100) * 0.1 / 5.0))


def test_fwhm_positive():
    dt = 0.05
    t = np.arange(4000) * dt
    sig = np.cos(2.0 * t) * np.exp(-t / 10.0)
    freq, spec = FT(sig, dt=dt)
    w = FWHM(np.abs(np.fft.fft(sig)), dt)
    assert w > 0
