"""Gaussian expectations of nonlinear transforms, vectorized over time.

Used to push the posterior of the latent frequency state ``V`` through the
softplus bijection ``g`` to get ``E[g(V_t)]`` per time step (reference
``chirpgp/quadratures.py:234-274``).  Here the whole time axis is handled as
a single batched einsum rather than a ``vmap`` of scalar quadratures.
"""

from typing import Callable

import jax.numpy as jnp

from chirpgp_tpu.quad.sigma_points import gauss_hermite

__all__ = ["gaussian_expectation", "gaussian_expectation_1d"]


def gaussian_expectation(ms: jnp.ndarray, chol_Ps: jnp.ndarray,
                         func: Callable = None, d: int = 1, order: int = 10,
                         force_shape: bool = False) -> jnp.ndarray:
    r"""Approximate :math:`E[f(V_t)]` for ``V_t ~ N(ms[t], Ps[t])`` with
    Gauss--Hermite quadrature, batched over ``t``.

    Parameters
    ----------
    ms : (T, d) means (or (T,) with ``force_shape``).
    chol_Ps : (T, d, d) Cholesky factors (or (T,) std-devs with ``force_shape``).
    func : callable applied elementwise to sigma points; defaults to the
        softplus bijection ``g``.
    order : Gauss--Hermite order (default 10, matching the reference).
    force_shape : reshape inputs to (T, 1) / (T, 1, 1) first.

    Returns
    -------
    (T, d) array of expectations.
    """
    if func is None:
        from chirpgp_tpu.models.bijections import g as func  # lazy, avoid cycle
    if force_shape:
        ms = jnp.reshape(ms, (-1, 1))
        chol_Ps = jnp.reshape(chol_Ps, (-1, 1, 1))

    sgps = gauss_hermite(d=d, order=order)
    chi = sgps.gen_sigma_points(ms, chol_Ps)          # (T, S, d)
    return jnp.einsum("s,tsd->td", sgps.w, func(chi))


def gaussian_expectation_1d(ms: jnp.ndarray, stds: jnp.ndarray,
                            func: Callable = None, order: int = 10) -> jnp.ndarray:
    """Scalar-state fast path: ``ms`` and ``stds`` of shape ``(T,)``.

    Equivalent to ``gaussian_expectation(..., force_shape=True)[:, 0]`` but
    avoids the trailing singleton plumbing.
    """
    if func is None:
        from chirpgp_tpu.models.bijections import g as func
    sgps = gauss_hermite(d=1, order=order)
    nodes = sgps.xi[:, 0]                              # (S,)
    chi = ms[:, None] + stds[:, None] * nodes[None, :]  # (T, S)
    return func(chi) @ sgps.w
