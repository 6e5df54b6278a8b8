"""Positivity bijection for the instantaneous frequency.

``g`` is the softplus map, ``g_inv`` its inverse.  Matches the reference
(``chirpgp/models.py:50-53``) but uses overflow-safe formulations:
``log(exp(x) + 1)`` overflows in float32 for x >~ 88, softplus does not.
"""

import jax
import jax.numpy as jnp

__all__ = ["g", "g_inv"]


def g(x):
    """Softplus: ``log(1 + exp(x))``, numerically stable for large |x|."""
    return jax.nn.softplus(x)


def g_inv(x):
    """Inverse softplus: ``log(exp(x) - 1) = x + log(1 - exp(-x))``."""
    return x + jnp.log(-jnp.expm1(-x))
