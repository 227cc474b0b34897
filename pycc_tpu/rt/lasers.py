"""Time-dependent laser-field envelopes.

Rebuild of /root/reference/pycc/rt/lasers.py:12-89 with jnp-pure arithmetic
(branch-free via jnp.where/heaviside) so that V(t) can be traced inside the
jitted RT step function.
"""

import jax.numpy as jnp


class gaussian_laser:
    def __init__(self, F_str, omega, sigma, center=0.0):
        self.F_str = F_str
        self.omega = omega
        self.sigma2 = sigma ** 2
        self.t0 = center

    def __call__(self, t):
        dt = t - self.t0
        return self.F_str * jnp.exp(-dt ** 2 / (2 * self.sigma2)) \
            * jnp.cos(self.omega * dt)


class sine_square_laser:
    def __init__(self, F_str, omega, tprime, phase=0):
        self.F_str = F_str
        self.omega = omega
        self.tprime = tprime
        self.phase = phase

    def __call__(self, t):
        return (jnp.sin(jnp.pi * t / self.tprime) ** 2
                * jnp.heaviside(t, 1.0)
                * jnp.heaviside(self.tprime - t, 1.0)
                * jnp.cos(self.omega * t + self.phase)
                * self.F_str)


class delta_pulse_laser:
    def __init__(self, F_str, center=0.0, tol=1e-7):
        self.F_str = F_str
        self.center = center
        self.tol = tol

    def __call__(self, t):
        return jnp.where(jnp.abs(t - self.center) <= self.tol,
                         self.F_str * 1.0, 0.0)


class lrcw_laser:
    """Linearly-ramped continuous wave; nr=0 gives a plain cosine wave."""

    def __init__(self, F_str, omega, nr):
        self.F_str = F_str
        self.omega = omega
        self.nr = nr

    def __call__(self, t):
        tc = 2 * jnp.pi / self.omega * self.nr
        ramp = jnp.where(t <= tc, jnp.where(tc > 0, t / jnp.maximum(tc, 1e-300), 1.0), 1.0)
        return ramp * self.F_str * jnp.cos(self.omega * t)


class qrcw_laser:
    """Quadratically-ramped continuous wave."""

    def __init__(self, F_str, omega, nr):
        self.F_str = F_str
        self.omega = omega
        self.nr = nr

    def __call__(self, t):
        tc = 2 * jnp.pi / self.omega * self.nr
        tsafe = jnp.maximum(tc, 1e-300)
        early = 2 * t ** 2 / tsafe ** 2
        mid = 1 - 2 * (t - tc) ** 2 / tsafe ** 2
        ramp = jnp.where(t <= 0.5 * tc, early, jnp.where(t <= tc, mid, 1.0))
        return ramp * self.F_str * jnp.cos(self.omega * t)
