"""Posterior Cramer--Rao lower bound (Tichavsky et al. 1998 recursion).

Monte-Carlo estimate of the information recursion
``J_k = D22 - D12^T (J_{k-1} + D11)^{-1} D12`` with the D blocks averaged
over sampled trajectories (reference ``chirpgp/models.py:583-644``).

The per-step Hessian averages are the natural ``psum`` reduction point when
the Monte-Carlo axis is sharded over a device mesh (see
``chirpgp_tpu.parallel``).
"""

from typing import Callable

import jax
import jax.numpy as jnp
from jax import jacfwd, jacrev

__all__ = ["posterior_cramer_rao"]


def posterior_cramer_rao(xss: jnp.ndarray, yss: jnp.ndarray, j0: jnp.ndarray,
                         logpdf_transition: Callable,
                         logpdf_likelihood: Callable) -> jnp.ndarray:
    """Inverse-PCRLB matrices ``J_k`` for a 1-D measurement model.

    Parameters
    ----------
    xss : (T + 1, N, d) state trajectories (initial samples first).
    yss : (T, N) measurements.
    j0 : (d, d) ``-E[Hess log p(x0)]``.
    logpdf_transition : ``(x_k, x_{k-1}) -> float``.
    logpdf_likelihood : ``(y_k, x_k) -> float``.

    Returns
    -------
    (T, d, d) array of ``J_k``.
    """
    htt_trans = jax.vmap(jax.hessian(logpdf_transition, argnums=0), in_axes=[0, 0])
    hts_trans = jax.vmap(jacfwd(jacrev(logpdf_transition, argnums=1), argnums=0),
                         in_axes=[0, 0])
    hss_trans = jax.vmap(jax.hessian(logpdf_transition, argnums=1), in_axes=[0, 0])
    htt_like = jax.vmap(jax.hessian(logpdf_likelihood, argnums=1), in_axes=[0, 0])

    def scan_body(j, elem):
        yt, xt, xs = elem
        d11 = -jnp.mean(hss_trans(xt, xs), axis=0)
        d12 = -jnp.mean(hts_trans(xt, xs), axis=0)
        d22 = -jnp.mean(htt_trans(xt, xs) + htt_like(yt, xt), axis=0)
        j = d22 - d12.T @ jnp.linalg.solve(j + d11, d12)
        return j, j

    _, js = jax.lax.scan(scan_body, j0, (yss, xss[1:], xss[:-1]))
    return js
