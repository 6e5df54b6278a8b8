"""Matern-3/2 SDE: closed-form transition and stationary covariance.

The IF prior ``V`` is the first component of a Matern-3/2 process written as
the 2-D SDE ``d(V, dV) = [[0, 1], [-gamma^2, -2 gamma]] (V, dV) dt +
(0, 2 sigma gamma^{3/2}) dW`` with ``gamma = sqrt(3)/ell``.

Closed forms match the reference's symbolic solution
(``chirpgp/models.py:56-73``); they are the accuracy backbone of the LCD
discretizations.
"""

import math
from typing import Tuple

import jax.numpy as jnp

from chirpgp_tpu.models.transitions import Transition

__all__ = ["stationary_cov_m32", "m32_solution", "m32_transition_mean",
           "disc_m32"]


def stationary_cov_m32(ell, sigma) -> jnp.ndarray:
    """Stationary covariance diag(sigma^2, gamma^2 sigma^2) of the
    Matern-3/2 state (reference ``chirpgp/models.py:56-58``)."""
    gamma_sq = 3.0 / ell ** 2
    return jnp.array([[1.0, 0.0], [0.0, 0.0]]) * sigma ** 2 + \
        jnp.array([[0.0, 0.0], [0.0, 1.0]]) * (gamma_sq * sigma ** 2)


def m32_solution(ell, sigma, dt) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact discrete transition matrix and noise covariance of the
    Matern-3/2 SDE over ``dt`` (reference ``chirpgp/models.py:61-73``)."""
    gamma = math.sqrt(3.0) / ell if not hasattr(ell, "dtype") else jnp.sqrt(3.0) / ell
    eta = dt * gamma
    decay = jnp.exp(-eta)
    beta = sigma ** 2 * jnp.exp(-2.0 * eta)

    F = jnp.stack([
        jnp.stack([(1.0 + eta) * decay, dt * decay]),
        jnp.stack([-dt * gamma ** 2 * decay, (1.0 - eta) * decay]),
    ])
    off = 2.0 * dt ** 2 * gamma ** 3 * beta
    Sigma = jnp.stack([
        jnp.stack([sigma ** 2 - beta * (2.0 * eta + 2.0 * eta ** 2 + 1.0), off]),
        jnp.stack([off, gamma ** 2 * (sigma ** 2 + beta * (2.0 * eta - 2.0 * eta ** 2 - 1.0))]),
    ])
    return F, Sigma


def m32_transition_mean(u: jnp.ndarray, F: jnp.ndarray) -> jnp.ndarray:
    """Apply the 2x2 Matern transition to states ``u`` of shape (..., 2)."""
    return jnp.einsum("ij,...j->...i", F, u)


def disc_m32(ell, sigma) -> Transition:
    """Exact discretization of the Matern-3/2 SDE as a :class:`Transition`
    (reference ``chirpgp/models.py:408-416``)."""

    def mean(u, dt):
        F, _ = m32_solution(ell, sigma, dt)
        return m32_transition_mean(u, F)

    def cov(_, dt):
        return m32_solution(ell, sigma, dt)[1]

    return Transition(mean=mean, cov=cov, const_cov=True)
