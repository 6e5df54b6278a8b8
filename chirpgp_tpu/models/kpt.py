"""Kalman pitch tracker (KPT) model of Shi et al. 2017.

Linear phase-accumulator dynamics with a nonlinear harmonic measurement
``h(x) = sum_k a_k sin(k g(omega + phi))`` (reference
``chirpgp/models.py:522-580``).  Used as a baseline via the
nonlinear-measurement EKF.
"""

import math
from typing import Callable, NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np

from chirpgp_tpu.models.bijections import g

__all__ = ["KPTModel", "build_kpt_chirp_model"]


class KPTModel(NamedTuple):
    """Iterable as ``F, Sigma, m0, P0, h = model`` for reference parity."""
    F: jnp.ndarray
    Sigma: jnp.ndarray
    m0: jnp.ndarray
    P0: jnp.ndarray
    h: Callable


def build_kpt_chirp_model(params: Sequence, fs: float,
                          num_harmonics: int = 1) -> KPTModel:
    """Build the KPT state-space model.

    ``params = [q1, q2, p0, f0, a0]``: process noise of frequency and
    amplitudes, initial covariance scale, initial frequency (Hz), initial
    amplitude.  State = (omega, a_1..a_K, phi) with phase accumulator
    ``phi_k = phi_{k-1} + omega_{k-1}``.
    """
    q1, q2, p0, f0, a0 = params
    K = num_harmonics
    dim_x = K + 2

    P0 = p0 * jnp.eye(dim_x)
    m0 = jnp.concatenate([
        jnp.atleast_1d(2.0 * math.pi * f0 / fs),
        a0 * jnp.ones((K,)),
        jnp.zeros((1,)),
    ])

    F_np = np.eye(dim_x)
    F_np[-1, 0] = 1.0
    F = jnp.asarray(F_np)

    # Process noise enters frequency and amplitudes, not the phase.
    diag = jnp.concatenate([
        jnp.atleast_1d((2.0 * math.pi * q1 / fs) ** 2),
        q2 * jnp.ones((K,)),
        jnp.zeros((1,)),
    ])
    Sigma = jnp.diag(diag)

    ks = jnp.arange(1, K + 1, dtype=jnp.result_type(float))

    def h(x):
        amps = x[..., 1:-1]
        phase = g(x[..., 0] + x[..., -1])
        return jnp.sum(amps * jnp.sin(phase[..., None] * ks), axis=-1)

    return KPTModel(F, Sigma, m0, P0, h)
