"""Metrics and small math utilities (reference ``chirpgp/tools.py:226-293``)."""

from functools import partial
from typing import Callable, Union

import jax
import jax.numpy as jnp
import jax.scipy.linalg

__all__ = ["rmse", "fwd_transformed_pdf", "chol_partial_const_diag"]


def rmse(x1: jnp.ndarray, x2: jnp.ndarray,
         reduce_sum: bool = True) -> Union[float, jnp.ndarray]:
    """Per-dimension RMSE over the time axis; summed over dimensions when
    ``reduce_sum`` (reference ``chirpgp/tools.py:279-293``)."""
    val = jnp.sqrt(jnp.mean((x1 - x2) ** 2, axis=0))
    return jnp.sum(val) if reduce_sum else val


def fwd_transformed_pdf(pdf_x: Callable[[float], float],
                        g_inv: Callable[[float], float]) -> Callable:
    r"""PDF of ``Y = g(X)`` by change of variables:
    ``p_Y(y) = p_X(g^{-1}(y)) |d g^{-1}/dy|`` (reference
    ``chirpgp/tools.py:226-258``)."""

    @partial(jax.vmap, in_axes=[0])
    def pdf_y(y):
        return pdf_x(g_inv(y)) * jnp.abs(jax.grad(g_inv)(y))

    return pdf_y


def chol_partial_const_diag(a: jnp.ndarray, n: int, *args, **kwargs) -> jnp.ndarray:
    """Cholesky of a block-diagonal matrix whose top-left ``n x n`` block is
    diagonal (sqrt applied elementwise) and whose remainder is factorized
    normally (reference ``chirpgp/tools.py:261-276``)."""
    return jax.scipy.linalg.block_diag(
        jnp.sqrt(a[:n, :n]),
        jax.scipy.linalg.cholesky(a[n:, n:], *args, **kwargs))
