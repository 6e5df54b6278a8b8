"""Shared building blocks of the Gaussian filters and smoothers.

Behavioral parity: reference ``chirpgp/filters_smoothers.py:39-142`` (linear
predict/update with accumulated Gaussian NLL, RTS-type smoother gain,
sigma-point prediction).  The sigma-point prediction here consumes
:class:`~chirpgp_tpu.models.transitions.Transition` objects: batched mean
evaluation, optional state-independent covariance fast path, and centered
(deviation-form) moment reduction.
"""

import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import jax.scipy.linalg

from chirpgp_tpu.models.transitions import Transition, as_transition
from chirpgp_tpu.quad.sigma_points import SigmaPoints
from chirpgp_tpu.utils.numerics import psd_cholesky, psd_solve

__all__ = [
    "log_normal_pdf", "linear_predict", "linear_update",
    "gaussian_smoother_step", "sgp_prediction", "cd_sgp_moment_odes",
    "stack_smoothing_results",
]

_LOG_2PI = math.log(2.0 * math.pi)


def log_normal_pdf(x, mu, variance):
    """Scalar Gaussian log-density (used for the filter marginal
    likelihood)."""
    return -0.5 * (_LOG_2PI + jnp.log(variance) + (x - mu) ** 2 / variance)


def linear_predict(F: jnp.ndarray, Sigma: jnp.ndarray,
                   m: jnp.ndarray, P: jnp.ndarray):
    """Moments of ``X_k = F X_{k-1} + q`` (reference
    ``filters_smoothers.py:48-52``)."""
    return F @ m, F @ P @ F.T + Sigma


def linear_update(mp: jnp.ndarray, Pp: jnp.ndarray, H: jnp.ndarray,
                  Xi, y) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """1-D-measurement Kalman update returning the posterior moments and the
    negative log-likelihood increment (reference
    ``filters_smoothers.py:55-68``)."""
    S = H @ Pp @ H + Xi
    K = Pp @ H / S
    pred = H @ mp
    mf = mp + K * (y - pred)
    Pf = Pp - jnp.outer(K, K) * S
    return mf, Pf, -log_normal_pdf(y, pred, S)


def gaussian_smoother_step(DT: jnp.ndarray,
                           mf: jnp.ndarray, Pf: jnp.ndarray,
                           mp: jnp.ndarray, Pp: jnp.ndarray,
                           ms: jnp.ndarray, Ps: jnp.ndarray):
    """One RTS-type backward step with gain ``G = D Pp^{-1}`` solved via
    a degenerate-safe Cholesky (``cho_solve`` NaNs on the f32-singular
    predicted covariances of noise-free-block models like La Scala);
    ``DT = D^T`` (reference ``filters_smoothers.py:71-85``)."""
    G = psd_solve(Pp, DT).T
    ms = mf + G @ (ms - mp)
    Ps = Pf + G @ (Ps - Pp) @ G.T
    return ms, Ps


def sgp_prediction(sgps: SigmaPoints, trans, dt,
                   mf: jnp.ndarray, Pf: jnp.ndarray):
    """Sigma-point prediction through a discretized transition.

    Returns ``(mp, Pp, chi, evals_of_m)``; the last two feed the smoother's
    cross-covariance.  Compared to the reference
    (``filters_smoothers.py:88-121``): batched mean evaluation instead of a
    vmap of block-diag matmuls, centered covariance reduction, and the
    per-point covariance expectation is skipped entirely when the transition
    covariance is state-independent (always true for the chirp family).
    The filtered covariance is factored with the degenerate-safe
    :func:`psd_cholesky` (f32 roundoff can push it indefinite on models
    with noise-free blocks).
    """
    trans = as_transition(trans) if not isinstance(trans, Transition) else trans
    chol_Pf = psd_cholesky(Pf)
    chi = sgps.gen_sigma_points(mf, chol_Pf)            # (..., S, d)
    evals = trans.mean(chi, dt)                         # (..., S, d)
    mp, Pdev = sgps.mean_and_cov(evals)
    if trans.const_cov:
        Pp = Pdev + trans.cov_const(dt)
    else:
        covs = trans.cov(chi, dt)                       # (..., S, d, d)
        Pp = Pdev + jnp.einsum("s,...sij->...ij", sgps.w, covs)
    return mp, Pp, chi, evals


def cd_sgp_moment_odes(sgps: SigmaPoints, drift: Callable,
                       dispersion_const: jnp.ndarray,
                       m: jnp.ndarray, P: jnp.ndarray):
    """RHS of the continuous-time sigma-point moment ODEs
    ``dm/dt = E[a]``, ``dP/dt = E[(x-m)a^T] + sym + BB^T`` (reference
    ``filters_smoothers.py:124-137``), with the drift evaluated batched
    over sigma points."""
    chol_P = psd_cholesky(P)
    chi = sgps.gen_sigma_points(m, chol_P)              # (S, d)
    evals = drift(chi)                                  # (S, d) batched drift
    mp = jnp.einsum("s,sd->d", sgps.w, evals)
    cross = jnp.einsum("s,si,sj->ij", sgps.w, chi - m, evals)
    Pp = cross + cross.T + dispersion_const @ dispersion_const.T
    return mp, Pp


def stack_smoothing_results(mfs, Pfs, mss, Pss):
    """Append the final filtering moments to the backward-smoothed stack
    (reference ``filters_smoothers.py:140-142``)."""
    return jnp.concatenate([mss, mfs[-1][None]]), \
        jnp.concatenate([Pss, Pfs[-1][None]])
