"""Numerical helpers shared across the framework."""

import jax.numpy as jnp

__all__ = ["phi1", "ou_variance"]


def phi1(x: jnp.ndarray) -> jnp.ndarray:
    r"""Smooth evaluation of :math:`\phi_1(x) = (1 - e^{-x}) / x`.

    Replaces the reference's ``lax.cond(lam == 0., ...)`` branch on the
    damped-harmonic transition variance (``chirpgp/models.py:302-308``) with
    a single smooth expression: differentiable at ``x = 0`` (the ``cond``
    kills gradients and breaks under ``vmap`` batching) and free of the
    0/0 at small ``x`` via a Taylor switch.
    """
    small = jnp.abs(x) < 1e-4
    x_safe = jnp.where(small, 1.0, x)
    exact = -jnp.expm1(-x_safe) / x_safe
    taylor = 1.0 - x / 2.0 + x * x / 6.0
    return jnp.where(small, taylor, exact)


def ou_variance(b, lam, dt):
    r"""Stationary-increment variance of a damped (OU-like) channel:
    :math:`b^2 (1 - e^{-2\lambda dt}) / (2\lambda)`, smoothly equal to
    ``b^2 dt`` at ``lam = 0``."""
    return b ** 2 * dt * phi1(2.0 * lam * dt)
