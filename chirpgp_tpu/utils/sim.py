"""Trajectory simulators for LGSSMs and SDEs (Gaussian-increment scheme).

Behavioral parity: reference ``chirpgp/tools.py:81-223``.  All simulators
are pure ``lax.scan`` programs, so they ``vmap`` cleanly over keys for
Monte-Carlo sweeps and ``shard_map`` over a device mesh.
"""

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import jax.scipy.linalg

__all__ = [
    "simulate_lgssm", "simulate_sde", "simulate_sde_init",
    "simulate_function_parametrised_sde",
]


def simulate_lgssm(F: jnp.ndarray, Sigma: jnp.ndarray, x0: jnp.ndarray,
                   T: int, key: jnp.ndarray) -> jnp.ndarray:
    """Simulate ``x_k = F x_{k-1} + chol(Sigma) eps_k`` for T steps.

    Returns the trajectory of shape (T, d) (x0 excluded), matching
    ``chirpgp/tools.py:81-116``.
    """
    d = x0.shape[-1]
    rnds = jax.random.normal(key, shape=(T, d), dtype=x0.dtype)
    chol = jax.scipy.linalg.cholesky(Sigma, lower=True)

    def step(x, rnd):
        x = F @ x + chol @ rnd
        return x, x

    _, traj = jax.lax.scan(step, x0, rnds)
    return traj


def _chol_of(cov: jnp.ndarray, const_diag_cov: bool) -> jnp.ndarray:
    return jnp.sqrt(cov) if const_diag_cov else jnp.linalg.cholesky(cov)


def simulate_sde(m_and_cov: Callable[[jnp.ndarray, float], Tuple[jnp.ndarray, jnp.ndarray]],
                 m0: jnp.ndarray, P0: jnp.ndarray, dt, T: int,
                 key: jnp.ndarray, const_diag_cov: bool = False) -> jnp.ndarray:
    """Simulate an SDE via its conditional discretization ``m_and_cov``,
    drawing ``x0 ~ N(m0, P0)`` (reference ``chirpgp/tools.py:119-170``).

    The noise dimension is assumed equal to the state dimension.
    """
    dim = m0.shape[-1]
    x0 = m0 + jax.scipy.linalg.cholesky(P0, lower=True) @ jax.random.normal(
        key, shape=(dim,), dtype=m0.dtype)
    key, _ = jax.random.split(key)
    dws = jax.random.normal(key, shape=(T, dim), dtype=m0.dtype)

    def step(x, dw):
        m, cov = m_and_cov(x, dt)
        x = m + _chol_of(cov, const_diag_cov) @ dw
        return x, x

    _, traj = jax.lax.scan(step, x0, dws)
    return traj


def simulate_sde_init(m_and_cov: Callable, x0: jnp.ndarray, dt, T: int,
                      key: jnp.ndarray, const_diag_cov: bool = False) -> jnp.ndarray:
    """Like :func:`simulate_sde` but starting from a fixed ``x0``
    (reference ``chirpgp/tools.py:173-194``)."""
    dim = x0.shape[-1]
    key, _ = jax.random.split(key)
    dws = jax.random.normal(key, shape=(T, dim), dtype=x0.dtype)

    def step(x, dw):
        m, cov = m_and_cov(x, dt)
        x = m + _chol_of(cov, const_diag_cov) @ dw
        return x, x

    _, traj = jax.lax.scan(step, x0, dws)
    return traj


def simulate_function_parametrised_sde(m_and_cov: Callable, vs: jnp.ndarray,
                                       m0: jnp.ndarray, P0: jnp.ndarray, dt,
                                       T: int, key: jnp.ndarray,
                                       const_diag_cov: bool = False) -> jnp.ndarray:
    """Simulate an SDE whose transition is conditioned on an exogenous path
    ``vs`` (reference ``chirpgp/tools.py:197-223``)."""
    dim = m0.shape[-1]
    x0 = m0 + jax.scipy.linalg.cholesky(P0, lower=True) @ jax.random.normal(
        key, shape=(dim,), dtype=m0.dtype)
    key, _ = jax.random.split(key)
    dws = jax.random.normal(key, shape=(T, dim), dtype=m0.dtype)

    def step(x, elem):
        v, dw = elem
        m, cov = m_and_cov(x, v, dt)
        x = m + _chol_of(cov, const_diag_cov) @ dw
        return x, x

    _, traj = jax.lax.scan(step, x0, (vs, dws))
    return traj
