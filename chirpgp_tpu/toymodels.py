"""Synthetic chirp generators and IF function families for tests and
benchmarks (reference ``chirpgp/toymodels.py``)."""

import math
from typing import Callable, List, Tuple, Union

import jax.numpy as jnp

from chirpgp_tpu.utils.sim import simulate_sde

__all__ = [
    "gen_chirp", "gen_harmonic_chirp", "gen_chirp_envelope",
    "constant_mag", "damped_exp_mag", "random_ou_mag",
    "affine_freq", "polynomial_freq", "meow_freq",
]


def gen_chirp(ts, magnitude_func, phase_func, base_phase: float = 0.0):
    r"""``y(t) = alpha(t) sin(phi_0 + 2 pi phi(t))`` (reference
    ``chirpgp/toymodels.py:37-70``)."""
    return magnitude_func(ts) * jnp.sin(base_phase + 2.0 * math.pi * phase_func(ts))


def gen_harmonic_chirp(ts, magnitude_funcs: List[Callable],
                       fundamental_phase_func: Callable,
                       base_phase: float = 0.0):
    r"""``y(t) = sum_i alpha_i(t) sin(phi_0 + i 2 pi phi(t))`` (reference
    ``chirpgp/toymodels.py:73-104``)."""
    ys = jnp.zeros_like(ts)
    for i, mag_func in enumerate(magnitude_funcs):
        ys = ys + mag_func(ts) * jnp.sin(
            base_phase + (i + 1) * 2.0 * math.pi * fundamental_phase_func(ts))
    return ys


def gen_chirp_envelope(ts, magnitude_func, phase_func, base_phase: float = 0.0):
    r"""Complex envelope ``alpha(t) exp(i (phi_0 + 2 pi phi(t)))`` (reference
    ``chirpgp/toymodels.py:107-119``)."""
    return magnitude_func(ts) * jnp.exp(
        (base_phase + 2.0 * math.pi * phase_func(ts)) * 1.0j)


def constant_mag(b: float) -> Callable:
    return lambda ts: jnp.ones_like(ts) * b


def damped_exp_mag(damp_rate: float) -> Callable:
    return lambda ts: jnp.exp(-damp_rate * ts)


def random_ou_mag(ell: float, sigma: float, key) -> Callable:
    """A fixed OU-process realization as the magnitude (reference
    ``chirpgp/toymodels.py:144-167``)."""

    def m_and_cov(x, dt):
        return jnp.exp(-dt / ell) * x, \
            jnp.array([[sigma ** 2 * (1.0 - jnp.exp(-2.0 * dt / ell))]])

    def generate_ou(ts):
        dt = ts[1] - ts[0]
        T = ts.shape[0]
        return simulate_sde(m_and_cov, jnp.array([0.0]),
                            jnp.array([[sigma ** 2]]), dt, T, key,
                            const_diag_cov=True).squeeze()

    return generate_ou


def affine_freq(a: float, b: float) -> Tuple[Callable, Callable]:
    """``f(t) = a t + b`` and its phase (reference
    ``chirpgp/toymodels.py:170-191``)."""
    return (lambda ts: a * ts + b,
            lambda ts: 0.5 * a * ts ** 2 + b * ts)


def polynomial_freq(coeffs: List[float]) -> Tuple[Callable, Callable]:
    """Polynomial frequency (coeffs low-to-high order) and its phase
    (reference ``chirpgp/toymodels.py:194-223``)."""

    def freq_func(ts):
        f = jnp.zeros_like(ts)
        for k, c in enumerate(coeffs):
            f = f + c * ts ** k
        return f

    def phase_func(ts):
        p = jnp.zeros_like(ts)
        for k, c in enumerate(coeffs):
            p = p + c / (k + 1) * ts ** (k + 1)
        return p

    return freq_func, phase_func


def meow_freq(mag: float = 500.0, scale: float = 5.0,
              offset: float = 5.5) -> Tuple[Callable, Callable]:
    r"""The canonical hard test IF: phase ``a e^{-b/sin(t)} + c t`` with
    frequency ``a b cot(t) csc(t) e^{-b csc(t)} + c``, valid on ``(0, pi)``
    (reference ``chirpgp/toymodels.py:226-268``)."""

    def freq_func(ts):
        return mag * scale * jnp.cos(ts) / jnp.sin(ts) ** 2 \
            * jnp.exp(-scale / jnp.sin(ts)) + offset

    def phase_func(ts):
        return mag * jnp.exp(-scale / jnp.sin(ts)) + offset * ts

    return freq_func, phase_func
