"""Taylor moment expansion (TME) discretization, implemented in-framework.

The reference depends on the external ``tme`` package
(``chirpgp/models.py:24,395-405``, ``requirements.txt:6``); here TME is
built from first principles with JAX autodiff.

For ``dX = a(X) dt + B(X) dW`` with generator
``A phi = J_phi a + 1/2 sum_ij Gamma_ij d^2 phi / dx_i dx_j``
(``Gamma = B B^T``), the conditional moments over a step ``dt`` expand as

- mean:  ``m(x, dt) = sum_{r=0}^{p} dt^r / r! A^r id(x)``
- cov:   ``Sigma(x, dt) = sum_{r=1}^{p} dt^r / r! [A^r(x x^T)
  - sum_{k=0}^{r} C(r, k) (A^k x)(A^{r-k} x)^T]``

(the consistent truncation of ``E[XX^T] - E[X]E[X]^T`` at order ``dt^p``;
Zhao 2021, *State-space deep Gaussian processes*, Ch. 3).  At order 1 this
reduces to Euler--Maruyama moments; order 3 matches the reference's
``disc_chirp_tme`` behavior.
"""

import math
from typing import Callable

import jax
import jax.numpy as jnp

from chirpgp_tpu.models.transitions import Transition

__all__ = ["generator", "tme_mean_and_cov", "disc_tme", "disc_chirp_tme"]


def generator(phi: Callable, drift: Callable, dispersion: Callable) -> Callable:
    """Infinitesimal generator ``A phi`` of the diffusion, for ``phi`` with
    arbitrary output shape."""

    def a_phi(x):
        ax = drift(x)
        jvp_term = jax.jvp(phi, (x,), (ax,))[1]
        B = dispersion(x)
        gamma = B @ B.T
        hess = jax.jacfwd(jax.jacfwd(phi))(x)      # (out..., d, d)
        return jvp_term + 0.5 * jnp.einsum("...ij,ij->...", hess, gamma)

    return a_phi


def tme_mean_and_cov(x: jnp.ndarray, dt, drift: Callable,
                     dispersion: Callable, order: int = 3):
    """TME conditional mean and covariance at a single state ``x``.

    Drop-in for the reference's ``tme.mean_and_cov(x, dt, drift, dispersion,
    order)`` call (``chirpgp/models.py:402-404``).
    """
    # A^r applied to the identity and to the second-moment map, r = 0..order.
    phi_m = [lambda u: u]
    phi_p = [lambda u: jnp.outer(u, u)]
    for _ in range(order):
        phi_m.append(generator(phi_m[-1], drift, dispersion))
        phi_p.append(generator(phi_p[-1], drift, dispersion))

    m_evals = [f(x) for f in phi_m]
    p_evals = [f(x) for f in phi_p]

    mean = m_evals[0]
    coeff = 1.0
    for r in range(1, order + 1):
        coeff = coeff * dt / r
        mean = mean + coeff * m_evals[r]

    cov = jnp.zeros((x.shape[-1], x.shape[-1]), dtype=x.dtype)
    coeff = 1.0
    for r in range(1, order + 1):
        coeff = coeff * dt / r
        cross = sum(math.comb(r, k) * jnp.outer(m_evals[k], m_evals[r - k])
                    for k in range(r + 1))
        cov = cov + coeff * (p_evals[r] - cross)
    return mean, cov


def disc_tme(drift: Callable, dispersion: Callable, order: int = 3) -> Transition:
    """TME discretization of an arbitrary SDE as a :class:`Transition`.

    Batched evaluation vmaps the single-point expansion; the closed-form LCD
    transitions remain the fast path for the chirp family -- TME is the
    generic/cross-check discretization (reference usage:
    ``test/test_models.py:92-100,129-146``).
    """

    def single(u, dt):
        return tme_mean_and_cov(u, dt, drift, dispersion, order)

    def mean(u, dt):
        f = lambda v: single(v, dt)[0]
        for _ in range(u.ndim - 1):
            f = jax.vmap(f)
        return f(u)

    def cov(u, dt):
        f = lambda v: single(v, dt)[1]
        for _ in range(u.ndim - 1):
            f = jax.vmap(f)
        return f(u)

    return Transition(mean=mean, cov=cov, const_cov=False)


def disc_chirp_tme(lam, b, ell, sigma, order: int = 3) -> Transition:
    """TME discretization of the chirp model (reference
    ``chirpgp/models.py:395-405``)."""
    from chirpgp_tpu.models.chirp import model_chirp
    drift, dispersion, _, _, _ = model_chirp(lam, b, ell, sigma, 1.0)
    return disc_tme(drift, dispersion, order)
