"""Benchmark harness: filter+smoother throughput on the canonical chirp
config (T=3141, d=4, Gauss-Hermite order 3 -- ``demos/ghfs_mle.py:20-34``).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measurement: a batch of B independent Monte-Carlo seeds runs the full GHFS
filter + smoother, vmapped and jitted, in float32 on one chip.  The metric
is total (filter+smoother) time-steps processed per second per chip.

Baseline (vs_baseline denominator): 32,772 steps/sec -- a faithful
reference-style implementation (per-sigma-point ``block_diag`` transition
construction, raw-moment covariance reduction, sequential seeds; the shape
of ``chirpgp/filters_smoothers.py:446-531`` + ``chirpgp/models.py:264-311``)
measured on this host's CPU in float64, the reference's actual operating
point (it is CPU/f64-only and loops seeds in Python:
``tetralith/jobs/ghfs_mle.py:26-87``).
"""

import json
import math
import sys
import time

import jax
import jax.numpy as jnp

# Persistent compile cache: first-ever compile of the batched QR-in-scan
# program takes minutes on the remote-compile TPU path; subsequent bench
# runs (e.g. the driver's end-of-round run) hit this cache.
jax.config.update("jax_compilation_cache_dir", "/tmp/chirpgp_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE_BASELINE_STEPS_PER_SEC = 32772.0

DT = 1e-3
T = 3141
XI = 0.1
BATCH = 4096
REPEATS = 5


def main():
    from chirpgp_tpu.apps import IFEstimationConfig, estimate_if
    from chirpgp_tpu.models import g
    from chirpgp_tpu.toymodels import gen_chirp, constant_mag, meow_freq

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    ts = jnp.linspace(DT, DT * T, T, dtype=jnp.float32)
    _, phase_func = meow_freq(offset=8.0)
    base = gen_chirp(ts, constant_mag(1.0), phase_func)
    keys = jax.random.split(jax.random.PRNGKey(999), BATCH)
    yss = base[None, :] + math.sqrt(XI) * jax.vmap(
        lambda k: jax.random.normal(k, (T,), dtype=jnp.float32))(keys)

    # sqrt form: the float32-safe production path (QR-triangularized
    # predict/update/smooth; the covariance form needs float64, which TPUs
    # do not have).
    cfg = IFEstimationConfig(method="ghfs", form="sqrt")
    params = g(cfg.default_init_theta()).astype(jnp.float32)
    pack = cfg.build(params)
    rule = cfg.sigma_points()
    H32 = pack.H.astype(jnp.float32)
    m032 = pack.m0.astype(jnp.float32)
    P032 = pack.P0.astype(jnp.float32)
    dt32 = jnp.float32(DT)
    Xi32 = jnp.float32(XI)

    from chirpgp_tpu.infer.batched import (
        sqrt_sgp_filter_smoother_batched, gaussian_expectation_batched)
    from chirpgp_tpu.models.bijections import g as g_fn

    def fn_impl(yss_):
        # Channels-first batched kernels (MC batch on the TPU lane
        # dimension), fused filter+smoother: the QR-stable forward pass
        # emits the affine smoother maps (u, G, D) so the backward scan
        # is a handful of (d, d, B) einsums per step.  ~1.6x over the
        # separate filter-then-smoother sqrt path at this config.
        mss, Pss, nll = sqrt_sgp_filter_smoother_batched(
            pack.m_and_cov, rule, H32, Xi32, m032, P032, dt32, yss_,
            return_factors=False)
        v_mean = mss[:, 2, :]
        v_std = jnp.sqrt(jnp.maximum(Pss[:, 2, 2, :], 0.0))
        if_means = gaussian_expectation_batched(v_mean, v_std, g_fn)
        return if_means.T, nll[-1]

    fn = jax.jit(fn_impl)

    # Warm-up / compile
    if_means, nlls = fn(yss)
    jax.block_until_ready(if_means)
    if not bool(jnp.all(jnp.isfinite(if_means))):
        print("WARNING: non-finite IF means in f32 benchmark run",
              file=sys.stderr)

    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        if_means, nlls = fn(yss)
        jax.block_until_ready(if_means)
        times.append(time.perf_counter() - t0)
    best = min(times)
    steps_per_sec = BATCH * T / best
    print(f"batch={BATCH} T={T} best={best:.4f}s "
          f"times={[f'{t:.4f}' for t in times]}", file=sys.stderr)

    result = {
        "metric": "ghfs_filter_smoother_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 1),
        "unit": "steps/sec/chip (batch=4096 seeds, T=3141, d=4, GH-3, f32, sqrt channels-first)",
        "vs_baseline": round(steps_per_sec / REFERENCE_BASELINE_STEPS_PER_SEC, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
