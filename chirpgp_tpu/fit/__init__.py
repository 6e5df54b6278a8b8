"""Hyperparameter estimation: in-JAX L-BFGS MLE, SciPy fallback,
Gauss-Newton / Levenberg-Marquardt."""

from chirpgp_tpu.fit.mle import lbfgs_minimize, scipy_minimize, MLEResult
from chirpgp_tpu.fit.gauss_newton import gauss_newton, levenberg_marquardt

__all__ = ["lbfgs_minimize", "scipy_minimize", "MLEResult",
           "gauss_newton", "levenberg_marquardt"]
