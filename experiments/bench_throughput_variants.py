"""Throughput-recovery experiment matrix (VERDICT r3 #3).

Times the fused batched filter+smoother variants on the real TPU at the
bench operating point (B=4096, T=3141, d=4, GH-3) under different matmul
precisions, and measures each variant's ESTIMATE ACCURACY at the
reference optimum on paired seed-0 data so speed is never quoted without
its accuracy.

Variants:
- sqrt  : ``sqrt_sgp_filter_smoother_batched`` (return_factors=False) --
          the current bench headline kernel (QR/Householder forward).
- cov   : ``cov_sgp_filter_smoother_batched`` -- Gram + unrolled-Cholesky
          forward (ONE contraction instead of ~30 sequential Householder
          column updates per step); candidate faster headline if its f32
          accuracy holds on this model.

Precisions: the package default ("high", multi-pass bf16) vs XLA's
"default" (single-pass bf16; the round-2 wrong-results-fast operating
point), switched with the ``jax.default_matmul_precision`` context
manager at trace time.

    python experiments/bench_throughput_variants.py          # on TPU
"""

# Allow running straight from a source checkout (no pip install).
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import math
import sys
import time

import numpy as np

ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--unrolls", type=int, nargs="+", default=[4])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from chirpgp_tpu.apps import IFEstimationConfig
    from chirpgp_tpu.infer.batched import (
        sqrt_sgp_filter_smoother_batched, cov_sgp_filter_smoother_batched,
        gaussian_expectation_batched)
    from chirpgp_tpu.models import g
    from chirpgp_tpu.models.bijections import g as g_fn
    from chirpgp_tpu.toymodels import gen_chirp, constant_mag, meow_freq
    from chirpgp_tpu.utils import rmse

    DT, T, XI, B = 1e-3, 3141, 0.1, args.batch
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    ts = jnp.linspace(DT, DT * T, T, dtype=jnp.float32)
    _, phase_func = meow_freq(offset=8.0)
    base = gen_chirp(ts, constant_mag(1.0), phase_func)
    keys = jax.random.split(jax.random.PRNGKey(999), B)
    yss = base[None, :] + math.sqrt(XI) * jax.vmap(
        lambda k: jax.random.normal(k, (T,), dtype=jnp.float32))(keys)

    cfg = IFEstimationConfig(method="ghfs", form="sqrt")
    params = g(cfg.default_init_theta()).astype(jnp.float32)
    pack = cfg.build(params)
    rule = cfg.sigma_points()
    H32 = pack.H.astype(jnp.float32)
    m032 = pack.m0.astype(jnp.float32)
    P032 = pack.P0.astype(jnp.float32)
    dt32 = jnp.float32(DT)
    Xi32 = jnp.float32(XI)

    # Accuracy probe: CKFS seed-0 estimate at the reference optimum
    # (PARITY.md r3 §1 isolation; 0.776 good / 0.92 corrupted).
    acc_data = np.load(_os.path.join(ROOT, "results/data/toydata_const.npz"))
    acc_ref = np.load(_os.path.join(ROOT,
                                    "results/reference/ckfs_const.npz"))
    acc_ys = jnp.asarray(acc_data["ys"][0], jnp.float32)[None]
    acc_tf = jnp.asarray(acc_data["true_freqs"], jnp.float32)
    acc_params = jnp.asarray(acc_ref["params"][0], jnp.float32)
    acc_cfg = IFEstimationConfig(method="ghfs", quadrature="cubature",
                                 form="sqrt")
    acc_pack_builder = acc_cfg.build
    acc_rule = acc_cfg.sigma_points()

    def time_call(f, *a):
        out = f(*a)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        times = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            out = f(*a)
            jax.block_until_ready(jax.tree.leaves(out)[0])
            times.append(time.perf_counter() - t0)
        return min(times)

    def make_kernel(variant, unroll):
        if variant == "sqrt":
            def run(yss_):
                mss, Pss, nll = sqrt_sgp_filter_smoother_batched(
                    pack.m_and_cov, rule, H32, Xi32, m032, P032, dt32,
                    yss_, return_factors=False, unroll=unroll)
                v_mean = mss[:, 2, :]
                v_std = jnp.sqrt(jnp.maximum(Pss[:, 2, 2, :], 0.0))
                if_means = gaussian_expectation_batched(v_mean, v_std, g_fn)
                return if_means.T, nll[-1]
        else:
            def run(yss_):
                mss, Pss, nll = cov_sgp_filter_smoother_batched(
                    pack.m_and_cov, rule, H32, Xi32, m032, P032, dt32,
                    yss_, unroll=unroll)
                v_mean = mss[:, 2, :]
                v_std = jnp.sqrt(jnp.maximum(Pss[:, 2, 2, :], 0.0))
                if_means = gaussian_expectation_batched(v_mean, v_std, g_fn)
                return if_means.T, nll[-1]
        return run

    def make_acc_kernel(variant):
        apack = acc_pack_builder(acc_params)
        aH = apack.H.astype(jnp.float32)
        am0 = apack.m0.astype(jnp.float32)
        aP0 = apack.P0.astype(jnp.float32)
        fs = (sqrt_sgp_filter_smoother_batched if variant == "sqrt"
              else cov_sgp_filter_smoother_batched)
        kw = {"return_factors": False} if variant == "sqrt" else {}

        def run(ys_):
            mss, Pss, _ = fs(apack.m_and_cov, acc_rule, aH, Xi32, am0,
                             aP0, dt32, ys_, **kw)
            v_mean = mss[:, 2, :]
            v_std = jnp.sqrt(jnp.maximum(Pss[:, 2, 2, :], 0.0))
            return gaussian_expectation_batched(v_mean, v_std, g_fn).T
        return run

    results = {}
    for variant in ("sqrt", "cov"):
        for prec in ("high", "default"):
            for unroll in args.unrolls:
                key = f"{variant}_{prec}_u{unroll}"
                try:
                    with jax.default_matmul_precision(prec):
                        t = time_call(jax.jit(make_kernel(variant, unroll)),
                                      yss)
                        ifm = jax.jit(make_acc_kernel(variant))(acc_ys)
                        acc = float(rmse(acc_tf, ifm[0])) * 10.0
                except Exception as e:
                    print(f"{key} failed: {type(e).__name__}: {e}",
                          file=sys.stderr)
                    results[key] = None
                    continue
                rate = B * T / t
                results[key] = {"steps_per_sec": round(rate, 1),
                                "ckfs_seed0_rmse_x10": round(acc, 4)}
                print(f"{key}: {rate / 1e6:.2f}M steps/s, "
                      f"ckfs seed0 RMSEx10 = {acc:.4f}", file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
