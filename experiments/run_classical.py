"""Classical-baseline Monte-Carlo sweep (reference
``tetralith/jobs/{anf,hilbert,mean_spectrogram,mle_polynomial}.py``):
the same pregenerated-key toymodel data as the state-space sweeps, with
IF RMSE per seed per method, written to reference-format .npz files.

All four estimators are JAX-native here; the ANF and spectrogram sweeps
vmap over seeds in one program.

Usage:
    python experiments/run_classical.py --methods hilbert anf --seeds 100
"""

# Allow running straight from a source checkout (no pip install).
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import math
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--methods", nargs="+",
                    default=["hilbert", "spectrogram", "anf", "poly"])
    ap.add_argument("--seeds", type=int, default=100)
    ap.add_argument("--T", type=int, default=3141)
    ap.add_argument("--mags", nargs="+",
                    default=["const", "damped", "random"])
    ap.add_argument("--out", default="./results")
    ap.add_argument("--platform", default="cpu",
                    help="jax platform for data generation / estimators "
                         "(these baselines are host-side; default cpu)")
    args = ap.parse_args()
    if args.platform:
        import jax as _jax
        _jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp

    from chirpgp_tpu.apps import generate_rnd_keys, toymodel_measurements
    from chirpgp_tpu.apps.sweeps import _magnitude, print_rmse_table
    from chirpgp_tpu.baselines import (
        hilbert_method, mean_power_spectrum, mle_polynomial,
        adaptive_notch_filter, butter_lowpass)
    from chirpgp_tpu.toymodels import gen_chirp_envelope, meow_freq
    from chirpgp_tpu.utils import rmse

    dt, T, Xi = 1e-3, args.T, 0.1
    ts = jnp.linspace(dt, dt * T, T)
    fs = 1.0 / dt
    freq_func, phase_func = meow_freq(offset=8.0)
    true_if = freq_func(ts)
    keys = generate_rnd_keys(args.seeds)
    os.makedirs(args.out, exist_ok=True)

    all_results = {}
    for method in args.methods:
        by_mag = {}
        for mag in args.mags:
            if method == "poly":
                # Batched path: per-seed polyfit inits on host, then ONE
                # vmapped while_loop LM program for all seeds.
                from chirpgp_tpu.baselines import mle_polynomial_batched
                yss, inits = [], []
                for k in np.asarray(keys):
                    _, _, ys = toymodel_measurements(
                        jnp.asarray(k), mag, dt=dt, T=T, Xi=Xi)
                    new_ts, rough = mean_power_spectrum(ts, ys)
                    coeffs = np.polyfit(np.asarray(new_ts),
                                        np.asarray(rough), 7)
                    inits.append(np.concatenate([[1.0], coeffs[::-1]]))
                    yss.append(np.asarray(ys))
                res_b = mle_polynomial_batched(
                    ts, jnp.asarray(np.stack(yss)), Xi,
                    jnp.asarray(np.stack(inits)))
                cs = np.asarray(res_b.params[:, 1:])   # (B, n+1)
                powers = np.asarray(ts)[None, :, None] ** \
                    np.arange(cs.shape[1])[None, None, :]
                est_if = np.einsum("btk,bk->bt", powers, cs)
                errs = np.sqrt(np.mean(
                    (est_if - np.asarray(true_if)[None, :]) ** 2, axis=1))
                res = dict(rmse=errs,
                           converged=np.asarray(res_b.converged))
                np.savez(os.path.join(args.out, f"{method}_{mag}.npz"),
                         **res)
                by_mag[mag] = res
                continue
            rmses = []
            for k in np.asarray(keys):
                key = jnp.asarray(k)
                _, _, ys = toymodel_measurements(key, mag, dt=dt, T=T,
                                                 Xi=Xi)
                if method == "hilbert":
                    # Reference prefilters with an order-8 Butterworth
                    # lowpass (demos/classical_methods/hilbert.py:37-38).
                    est = hilbert_method(ts, butter_lowpass(ys, 30.0, fs))
                    err = rmse(true_if[:-1], est)
                elif method == "spectrogram":
                    new_ts, est = mean_power_spectrum(
                        ts, butter_lowpass(ys, 30.0, fs))
                    err = rmse(freq_func(new_ts), est)
                elif method == "anf":
                    key_noise, key_mag = jax.random.split(key)
                    env = gen_chirp_envelope(ts, _magnitude(mag, key_mag),
                                             phase_func) \
                        + math.sqrt(Xi) * jax.random.normal(key_noise, (T,))
                    mu = 0.015
                    gamma_w = mu ** 2 / 2
                    gamma_alpha = mu * gamma_w / 4
                    est, _, _ = adaptive_notch_filter(
                        ts, env, 0.0, 8.0, 0.1 + 0.0j, mu, gamma_alpha,
                        gamma_w)
                    err = rmse(true_if, est)
                else:
                    raise ValueError(method)
                rmses.append(float(err))
            res = dict(rmse=np.asarray(rmses))
            np.savez(os.path.join(args.out, f"{method}_{mag}.npz"), **res)
            by_mag[mag] = res
        all_results[method] = by_mag

    print_rmse_table(all_results)


if __name__ == "__main__":
    main()
