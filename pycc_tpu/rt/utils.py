"""Spectral post-processing for RT-CC signals (host-side numpy/scipy).

Same API surface as /root/reference/pycc/rt/utils.py: FT, denoise, damp,
FWHM, and the Padé approximant to the discrete Fourier transform (Bruner,
LaMaster, Lopata, JCTC 12, 3741 (2016)).  These operate on collected
time-series after propagation, so there is no need for device execution.
"""

import numpy as np
from scipy.fft import fft, fftfreq, ifft
from scipy.linalg import solve, toeplitz
from scipy.signal import find_peaks, peak_widths


def FT(data, dt=1, norm=False, n=None):
    """Discrete FT of a time series; returns (freqs, spectrum) over the
    positive-frequency half (excluding DC)."""
    if not n:
        n = len(data)
    spec = fft(data, n=n)[1:n // 2]
    freq = fftfreq(n)[1:n // 2] * 2 * np.pi / dt
    if norm:
        re = np.real(spec) / np.abs(np.real(spec)).max()
        im = np.imag(spec) / np.abs(np.imag(spec)).max()
        spec = re + im * 1j
    return freq, spec


def denoise(f, filter_level, timestep):
    """Zero out frequency components whose power is below filter_level."""
    n = len(f)
    fhat = fft(f, n)
    power = fhat * np.conj(fhat) / n
    fhat = np.where(power > filter_level, fhat, 0.0)
    return np.real(ifft(fhat))


def damp(f, timestep, Tau):
    """Exponential damping window f(t) * exp(-t/Tau)."""
    t = np.arange(len(f)) * timestep
    return f * np.exp(-t / Tau)


def FWHM(freq_f, timestep):
    """Full width at half maximum of the tallest peak in the power
    spectrum of `freq_f`."""
    n = len(freq_f)
    power = np.real(freq_f * np.conj(freq_f) / n)
    freq = np.real(fftfreq(n) * 2 * np.pi / timestep)
    half = np.arange(1, np.floor(n / 2), dtype="int")
    peaks, _ = find_peaks(power[half])
    df = abs(freq[half][0] - freq[half][1])
    widths = peak_widths(power[half], peaks, rel_height=0.5)
    best = np.where(widths[1] == max(widths[1]))
    return widths[0][best][0] * df


class Pade:
    """Padé approximant to the FT of a time series (Bruner et al.)."""

    def __init__(self, data, dt=1):
        data = np.asarray(data)
        if len(data) % 2 == 0:
            print("Odd number required - removing last data point.")
            data = data[:-1].copy()
        else:
            data = data.copy()
        self.data = data
        self.M = len(data) - 1
        self.N = self.M // 2
        self.dt = dt

    def build(self, toeplitz_solver=True):
        N = self.N
        c = self.data
        d = -1 * c[N + 1:]
        if len(d) != N:
            raise ValueError("d vector has inconsistent length %d" % len(d))
        self.d = d
        b = np.ones(N + 1, dtype=c.dtype)
        if toeplitz_solver:
            G = (c[N:2 * N], np.flip(c[:N + 1])[:-1])
            b[1:] = solve(toeplitz(*G), d, overwrite_a=True, overwrite_b=True)
        else:
            G = np.zeros((N, N), dtype=c.dtype)
            for k in range(N):
                for m in range(N):
                    G[k][m] = c[N - m + k]
            b[1:] = solve(G, d)
        if toeplitz_solver:
            a = np.dot(np.tril(toeplitz(c[0:N + 1])), b)
        else:
            a = np.zeros(N + 1, dtype=c.dtype)
            a[0] = c[0]
            for k in range(1, N + 1):
                for m in range(k + 1):
                    a[k] += b[m] * c[k - m]
        self.a = np.asarray(a)
        self.b = np.asarray(b)

    def approx(self, o, norm=False):
        if not hasattr(self, "a"):
            raise AttributeError("Please `build()` Pade object.")
        O = np.exp(-1j * o * self.dt)
        p = np.poly1d(np.flip(self.a))
        q = np.poly1d(np.flip(self.b))
        F = p(O) / q(O)
        if norm:
            re = np.real(F) / np.abs(np.real(F)).max()
            im = np.imag(F) / np.abs(np.imag(F)).max()
            F = re + im * 1j
        return np.asarray(F)
