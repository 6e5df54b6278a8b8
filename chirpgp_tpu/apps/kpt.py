"""Kalman pitch tracker (KPT) baseline pipeline.

Reference contract (``tetralith/jobs/kpt_mle.py``): build the KPT model
(``chirpgp/models.py:522``), run the nonlinear-measurement EKF
(``filters_smoothers.py:267``) and the *linear* RTS smoother over its
output, learn [q1, q2, p0, f0, a0] by filter-marginal MLE with init
``g^{-1}([0.02, 1e-5, 1e-5, 8, 1])``, and estimate the IF as the GH
expectation of ``g`` over the smoothed ``omega`` posterior scaled by
``fs / (2 pi)`` (``kpt_mle.py:74-78``).
"""

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from chirpgp_tpu.fit.mle import lbfgs_minimize, scipy_minimize, MLEResult
from chirpgp_tpu.infer import ekf_for_kpt, rts
from chirpgp_tpu.models import g, g_inv, build_kpt_chirp_model
from chirpgp_tpu.quad import gaussian_expectation_1d

__all__ = ["KPT_INIT_PARAMS", "kpt_filter", "kpt_smooth", "kpt_mle",
           "kpt_if_estimate"]

# Reference init for the toymodel sweep (``kpt_mle.py:37``).
KPT_INIT_PARAMS = (0.02, 1e-5, 1e-5, 8.0, 1.0)


def kpt_filter(params, fs: float, Xi, ys, num_harmonics: int = 1):
    """Run the KPT EKF at fixed (constrained) params."""
    F, Sigma, m0, P0, h = build_kpt_chirp_model(params, fs,
                                                num_harmonics=num_harmonics)
    return ekf_for_kpt(F, Sigma, h, Xi, m0, P0, 1.0 / fs, ys)


def kpt_smooth(params, fs: float, mfs, Pfs, num_harmonics: int = 1):
    """Linear RTS smoothing over the KPT EKF output (the KPT dynamics are
    linear; only the measurement is nonlinear)."""
    F, Sigma, _, _, _ = build_kpt_chirp_model(params, fs,
                                              num_harmonics=num_harmonics)
    return rts(F, Sigma, mfs, Pfs)


def kpt_mle(fs: float, Xi, ys, init_params=KPT_INIT_PARAMS,
            num_harmonics: int = 1, optimizer: str = "lbfgs",
            max_iters: int = 200) -> MLEResult:
    """Learn KPT params by maximizing the EKF marginal likelihood; params
    are softplus-reparametrized for positivity."""

    def nll(theta):
        return kpt_filter(g(theta), fs, Xi, ys,
                          num_harmonics=num_harmonics)[2][-1]

    init_theta = g_inv(jnp.asarray(init_params))
    if optimizer == "lbfgs":
        return lbfgs_minimize(nll, init_theta, max_iters=max_iters)
    return scipy_minimize(nll, init_theta)


def kpt_if_estimate(params, fs: float, Xi, ys, num_harmonics: int = 1,
                    expectation_order: int = 10) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full KPT pipeline at fixed params: EKF -> RTS -> IF posterior mean
    ``E[g(omega)] * fs / (2 pi)`` (reference ``kpt_mle.py:74-78``)."""
    mfs, Pfs, nell = kpt_filter(params, fs, Xi, ys,
                                num_harmonics=num_harmonics)
    mss, Pss = kpt_smooth(params, fs, mfs, Pfs, num_harmonics=num_harmonics)
    scale = fs / (2.0 * math.pi)
    if_mean = gaussian_expectation_1d(mss[:, 0] * scale,
                                      jnp.sqrt(Pss[:, 0, 0]) * scale,
                                      order=expectation_order)
    return if_mean, nell
