"""chirpgp_tpu: a TPU-native Bayesian chirp / instantaneous-frequency estimation
framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
``spdes/chirpgp`` package (probabilistic IF estimation of chirp signals via
SDE state-space priors and Gaussian filters/smoothers; see
arXiv:2205.06306).  Everything here is built TPU-first:

- batched moment maps so sigma-point propagation runs as fused einsums,
- state-independent process covariances exploited (no per-point cov reduce),
- square-root (Cholesky) filter forms for float32 TPU numerics,
- associative-scan (parallel-in-time) Kalman filtering/smoothing,
- in-JAX L-BFGS so hyperparameter MLE jits end-to-end,
- ``shard_map`` Monte-Carlo sweeps over device meshes.

Subpackages
-----------
quad       sigma-point rules, RK4 moment integrators, Gaussian expectations
models     SDE priors (chirp / harmonic chirp / La Scala / Matern-3/2 / KPT)
           and their discretizations (LCD closed form, exact LTI, TME)
infer      filters and smoothers (KF/RTS, EKF/EKS, SGP, CD variants,
           associative-scan parallel forms)
fit        hyperparameter estimation (in-JAX L-BFGS MLE, Gauss-Newton, LM)
parallel   mesh/sharding utilities for Monte-Carlo sweeps
utils      LTI discretization, simulators, metrics
ops        Pallas kernels and native (C++) ops
baselines  classical IF estimators (Hilbert, spectrogram, poly-MLE, ANF)
apps       end-to-end pipelines (toymodel demos, bats, LIGO)
"""

from chirpgp_tpu import quad, models, infer, utils

__version__ = "0.1.0"
