"""Runge--Kutta moment-ODE integrators.

Generic RK4 over pytrees of state; used by the continuous-discrete filters
and smoothers to advance the mean/covariance ODE system one measurement
interval.  (Behavioral parity: reference ``chirpgp/quadratures.py:34-81``,
one macro RK4 step per interval, no substepping.)
"""

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

__all__ = ["rk4", "rk4_m_cov", "rk4_m_cov_backward"]


def rk4(ode: Callable, y, dt, *args):
    """One classic RK4 step of ``dy/dt = ode(y, *args)`` over a pytree ``y``.

    ``ode`` takes the pytree state (plus fixed extra args) and returns a
    pytree of the same structure.
    """
    add = lambda a, b, s: jax.tree_util.tree_map(lambda x, k: x + s * k, a, b)
    k1 = ode(y, *args)
    k2 = ode(add(y, k1, dt / 2), *args)
    k3 = ode(add(y, k2, dt / 2), *args)
    k4 = ode(add(y, k3, dt), *args)
    return jax.tree_util.tree_map(
        lambda x, a, b, c, d: x + dt * (a + 2 * b + 2 * c + d) / 6.0,
        y, k1, k2, k3, k4)


def rk4_m_cov(m_cov_ode: Callable[[jnp.ndarray, jnp.ndarray],
                                  Tuple[jnp.ndarray, jnp.ndarray]],
              m: jnp.ndarray, P: jnp.ndarray, dt) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RK4 step of the coupled mean/covariance filtering ODEs
    (reference ``chirpgp/quadratures.py:34-54``)."""
    return rk4(lambda y: m_cov_ode(*y), (m, P), dt)


def rk4_m_cov_backward(m_cov_ode: Callable, m: jnp.ndarray, P: jnp.ndarray,
                       mf: jnp.ndarray, Pf: jnp.ndarray,
                       dt) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RK4 step of the smoothing ODEs conditioned on fixed filter moments
    ``(mf, Pf)`` (reference ``chirpgp/quadratures.py:57-81``).  Pass a
    negative ``dt`` to integrate backwards."""
    return rk4(lambda y: m_cov_ode(*y, mf, Pf), (m, P), dt)
