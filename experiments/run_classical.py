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
    # The reference runs every classical job in float64
    # (``tetralith/jobs/hilbert.py:10`` etc.); the polynomial MLE in
    # particular is catastrophically ill-conditioned in f32 (a degree-11
    # polynomial evaluated at t up to 3.14 with +-2.6e3 coefficients).
    jax.config.update("jax_enable_x64", True)
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
                # Batched path: ONE vmapped while_loop LM program for all
                # seeds.  Init protocol mirrors the reference job
                # (``tetralith/jobs/mle_polynomial.py:35-41``): a
                # degree-11 polynomial fitted to the TRUE meow IF (the
                # reference hardcodes MATLAB polyfit output from
                # ``init_poly_coeffs.m``; we refit with numpy's
                # domain-scaled Polynomial.fit) plus a 2e-5 relative
                # Gaussian perturbation.
                from chirpgp_tpu.baselines import mle_polynomial_batched
                # No init perturbation: the reference adds 2e-5 relative
                # noise with a FIXED key (same for every seed, so no MC
                # diversity); with this fit's larger high-order
                # coefficients the same relative noise detunes the chirp
                # phase by whole cycles and throws LM out of the basin.
                fit = np.polynomial.Polynomial.fit(
                    np.asarray(ts), np.asarray(true_if), 11)
                init = jnp.asarray(
                    np.concatenate([[1.0], fit.convert().coef]))
                base_init = np.asarray(init)
                yss = []
                for k in np.asarray(keys):
                    _, _, ys = toymodel_measurements(
                        jnp.asarray(k), mag, dt=dt, T=T, Xi=Xi)
                    yss.append(np.asarray(ys))
                inits = np.broadcast_to(np.asarray(init),
                                        (len(yss), len(base_init)))
                res_b = mle_polynomial_batched(
                    ts, jnp.asarray(np.stack(yss)), Xi,
                    jnp.asarray(inits))
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
                    # Reference job protocol: order-8 Butterworth lowpass
                    # at 18 Hz, IF compared to true[1:]
                    # (``tetralith/jobs/hilbert.py:35-39``).
                    est = hilbert_method(ts, butter_lowpass(ys, 18.0, fs))
                    err = rmse(true_if[1:], est)
                elif method == "spectrogram":
                    # Reference: same 18 Hz prefilter; cosine window,
                    # nperseg=450, noverlap=449
                    # (``tetralith/jobs/mean_spectrogram.py:35-39``).
                    new_ts, est = mean_power_spectrum(
                        ts, butter_lowpass(ys, 18.0, fs), nperseg=450,
                        noverlap=449, window="cosine")
                    err = rmse(freq_func(new_ts), est)
                elif method == "anf":
                    key_noise, key_mag = jax.random.split(key)
                    env = gen_chirp_envelope(ts, _magnitude(mag, key_mag),
                                             phase_func) \
                        + math.sqrt(Xi) * jax.random.normal(key_noise, (T,))
                    # Reference init: alpha0=0, w0=true IF at t=dt,
                    # s0=1+0j (``tetralith/jobs/anf.py:36-37``).
                    mu = 0.015
                    gamma_w = mu ** 2 / 2
                    gamma_alpha = mu * gamma_w / 4
                    est, _, _ = adaptive_notch_filter(
                        ts, env, 0.0, float(freq_func(jnp.asarray(dt))),
                        1.0 + 0.0j, mu, gamma_alpha, gamma_w)
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
