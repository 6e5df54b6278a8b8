"""Backward Gaussian smoothers matching the filters in
``chirpgp_tpu.infer.filters``.

All return ``(mss, Pss)`` over the full sequence (final filter moments
appended), matching the reference (``chirpgp/filters_smoothers.py:187-632``).
"""

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import jax.scipy.linalg

from chirpgp_tpu.infer.common import (
    gaussian_smoother_step, sgp_prediction, cd_sgp_moment_odes,
    stack_smoothing_results)
from chirpgp_tpu.models.transitions import Transition, as_transition
from chirpgp_tpu.quad.integrators import rk4_m_cov_backward
from chirpgp_tpu.quad.sigma_points import SigmaPoints
from chirpgp_tpu.utils.numerics import psd_solve

__all__ = ["rts", "eks", "sgp_smoother", "cd_eks", "cd_sgp_smoother"]

SmootherResult = Tuple[jnp.ndarray, jnp.ndarray]


def _run_smoother(step_fn, mfs, Pfs) -> SmootherResult:
    """Common reverse-scan skeleton over the filtering results."""
    init = (mfs[-1], Pfs[-1])
    _, (mss, Pss) = jax.lax.scan(step_fn, init, (mfs[:-1], Pfs[:-1]),
                                 reverse=True)
    return stack_smoothing_results(mfs, Pfs, mss, Pss)


def rts(F: jnp.ndarray, Sigma: jnp.ndarray,
        mfs: jnp.ndarray, Pfs: jnp.ndarray) -> SmootherResult:
    """RTS smoother for LGSSMs (reference ``filters_smoothers.py:187-219``)."""

    def step(carry, elem):
        ms, Ps = carry
        mf, Pf = elem
        ms, Ps = gaussian_smoother_step(
            F @ Pf, mf, Pf, F @ mf, F @ Pf @ F.T + Sigma, ms, Ps)
        return (ms, Ps), (ms, Ps)

    return _run_smoother(step, mfs, Pfs)


def eks(cond_m_cov, mfs: jnp.ndarray, Pfs: jnp.ndarray, dt) -> SmootherResult:
    """Extended Kalman smoother (reference
    ``filters_smoothers.py:317-349``)."""
    trans = as_transition(cond_m_cov)

    def step(carry, elem):
        ms, Ps = carry
        mf, Pf = elem
        mean_fn = lambda u: trans.mean(u, dt)
        F = jax.jacfwd(mean_fn)(mf)
        mp = mean_fn(mf)
        Sigma = trans.cov_const(dt) if trans.const_cov else trans.cov(mf, dt)
        Pp = F @ Pf @ F.T + Sigma
        ms, Ps = gaussian_smoother_step(F @ Pf, mf, Pf, mp, Pp, ms, Ps)
        return (ms, Ps), (ms, Ps)

    return _run_smoother(step, mfs, Pfs)


def sgp_smoother(cond_m_cov, sgps: SigmaPoints, mfs: jnp.ndarray,
                 Pfs: jnp.ndarray, dt) -> SmootherResult:
    """Sigma-point smoother (reference ``filters_smoothers.py:493-531``).

    The prediction is recomputed per backward step (same recompute-vs-store
    trade as the reference); the cross-covariance uses the centered
    sigma-point reduction.
    """
    trans = as_transition(cond_m_cov)

    def step(carry, elem):
        ms, Ps = carry
        mf, Pf = elem
        mp, Pp, chi, evals = sgp_prediction(sgps, trans, dt, mf, Pf)
        D = sgps.cross_cov(chi, evals, mf, mp)
        ms, Ps = gaussian_smoother_step(D.T, mf, Pf, mp, Pp, ms, Ps)
        return (ms, Ps), (ms, Ps)

    return _run_smoother(step, mfs, Pfs)


def cd_eks(a: Callable, b: Callable, mfs: jnp.ndarray, Pfs: jnp.ndarray,
           dt) -> SmootherResult:
    """Continuous-discrete EKS: backward RK4 of the smoothing ODEs
    (reference ``filters_smoothers.py:400-443``)."""
    neg_dt = -dt
    jac_of_a = jax.jacfwd(a)

    def odes(m, P, mf, Pf):
        gamma = b(m) @ b(m).T
        J_plus = jac_of_a(m) + psd_solve(Pf, gamma.T).T
        dm = a(m) + gamma @ psd_solve(Pf, m - mf)
        dP = J_plus @ P + P @ J_plus.T - gamma
        return dm, dP

    def step(carry, elem):
        ms, Ps = carry
        mf, Pf = elem
        ms, Ps = rk4_m_cov_backward(odes, ms, Ps, mf, Pf, neg_dt)
        return (ms, Ps), (ms, Ps)

    return _run_smoother(step, mfs, Pfs)


def cd_sgp_smoother(a: Callable, b: jnp.ndarray, sgps: SigmaPoints,
                    mfs: jnp.ndarray, Pfs: jnp.ndarray, dt) -> SmootherResult:
    """Continuous-discrete sigma-point smoother (reference
    ``filters_smoothers.py:585-632``)."""
    neg_dt = -dt
    vec_drift = jax.vmap(a)
    gamma = b @ b.T

    def odes(m, P, mf, Pf):
        G = psd_solve(Pf, gamma)
        _m, _P = cd_sgp_moment_odes(sgps, vec_drift, b, m, P)
        return _m + G.T @ (m - mf), _P + G.T @ P + P @ G - 2.0 * gamma

    def step(carry, elem):
        ms, Ps = carry
        mf, Pf = elem
        ms, Ps = rk4_m_cov_backward(odes, ms, Ps, mf, Pf, neg_dt)
        return (ms, Ps), (ms, Ps)

    return _run_smoother(step, mfs, Pfs)
