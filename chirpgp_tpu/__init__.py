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

import os as _os

import jax as _jax

# Multi-pass f32-accurate matmuls by default.  On TPU, XLA lowers f32
# dot/conv to SINGLE-pass bfloat16 MXU ops unless told otherwise; for
# this framework's small (d<=16) sequential filter algebra that default
# is a correctness bug, not a speed win: the per-step ~1e-3 relative
# rounding accumulates over T~3e3 scan steps into estimate-level error.
# Measured on the CKFS Table-I column at the reference optimum: IF
# RMSE x10 = 0.92 under default precision vs 0.777 under "high" vs
# 0.7764 under "highest" vs 0.7762 for the float64 reference -- "high"
# (multi-pass bf16) already restores f64-grade estimates, at 14.8M
# fused steps/s/chip vs 11.6M for "highest" (bench.py, B=4096).  The
# MLE objective itself was similarly corrupted under the default.
# Override with CHIRPGP_TPU_MATMUL_PRECISION=default|high|highest.
_jax.config.update(
    "jax_default_matmul_precision",
    _os.environ.get("CHIRPGP_TPU_MATMUL_PRECISION", "high"))

# Persistent compilation cache: the QR-in-scan filter programs take
# minutes to compile on remote-compile TPU backends; every runner
# (sweeps, bench, demos) shares this cache so only the first-ever
# process pays.  Override the location with CHIRPGP_TPU_JAX_CACHE.
_jax.config.update(
    "jax_compilation_cache_dir",
    _os.environ.get("CHIRPGP_TPU_JAX_CACHE", "/tmp/chirpgp_tpu_jax_cache"))
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from chirpgp_tpu import quad, models, infer, utils

__version__ = "0.1.0"
