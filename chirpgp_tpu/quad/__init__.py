"""Quadrature and linearization core: sigma-point rules, RK4 moment
integrators, and batched Gaussian expectations."""

from chirpgp_tpu.quad.sigma_points import (
    SigmaPoints, cubature, gauss_hermite, unscented)
from chirpgp_tpu.quad.integrators import rk4, rk4_m_cov, rk4_m_cov_backward
from chirpgp_tpu.quad.expectations import (
    gaussian_expectation, gaussian_expectation_1d)

__all__ = [
    "SigmaPoints", "cubature", "gauss_hermite", "unscented",
    "rk4", "rk4_m_cov", "rk4_m_cov_backward",
    "gaussian_expectation", "gaussian_expectation_1d",
]
