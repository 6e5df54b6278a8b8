"""LTI SDE discretization utilities.

``lti_sde_to_disc`` converts ``dX = A X dt + B dW`` into the exact discrete
transition ``X_k = F X_{k-1} + q, q ~ N(0, Sigma)`` via the matrix-fraction
(van Loan / Axelsson--Gustafsson) construction.  Behavioral parity with
reference ``chirpgp/tools.py:44-78``.
"""

from typing import Tuple

import jax.numpy as jnp
import jax.scipy.linalg

__all__ = ["lti_sde_to_disc"]


def _gram(z: jnp.ndarray) -> jnp.ndarray:
    """B B^T for scalar / vector / matrix dispersion."""
    if z.ndim == 0:
        return (z ** 2).reshape(1, 1)
    if z.ndim == 1:
        return jnp.outer(z, z)
    return z @ z.T


def lti_sde_to_disc(A: jnp.ndarray, B: jnp.ndarray, dt) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact discretization of an LTI SDE over an interval ``dt``.

    Returns the transition matrix ``F = expm(A dt)`` and noise covariance
    ``Sigma`` from the 2d-by-2d matrix exponential of
    ``[[A, BB^T], [0, -A^T]]``.
    """
    dim = A.shape[0]
    F = jax.scipy.linalg.expm(A * dt)
    phi = jnp.block([[A, _gram(B)],
                     [jnp.zeros_like(A), -A.T]])
    AB = jax.scipy.linalg.expm(phi * dt) @ jnp.vstack(
        [jnp.zeros((dim, dim), A.dtype), jnp.eye(dim, dtype=A.dtype)])
    Sigma = AB[0:dim, :] @ F.T
    return F, Sigma
