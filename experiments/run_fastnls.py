"""Fast-NLS pitch-tracking Monte-Carlo sweep (reference
``tetralith/jobs/fastf0nls.py:144-193``): sliding-window single/harmonic
pitch tracking with median smoothing over the pregenerated-key toymodel
data, via the in-repo C++ estimator.

Usage:
    python experiments/run_fastnls.py -harmonic 0 --seeds 100
"""

# Allow running straight from a source checkout (no pip install).
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-harmonic", type=float, default=0,
                    help="1 for 3-harmonic chirps, 0 for single")
    ap.add_argument("--seeds", type=int, default=100)
    ap.add_argument("--T", type=int, default=3141)
    ap.add_argument("--window-length", type=int, default=300)
    ap.add_argument("--out", default="./results")
    ap.add_argument("--platform", default="cpu",
                    help="jax platform for data generation / estimators "
                         "(these baselines are host-side; default cpu)")
    args = ap.parse_args()
    if args.platform:
        import jax as _jax
        _jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp

    from chirpgp_tpu.apps import generate_rnd_keys, toymodel_measurements
    from chirpgp_tpu.apps.sweeps import print_rmse_table
    from chirpgp_tpu.baselines.fastnls import (
        pitch_track, median_smooth, force_odd)
    from chirpgp_tpu.toymodels import meow_freq
    from chirpgp_tpu.utils import rmse

    dt, T = 1e-3, args.T
    fs = 1.0 / dt
    num_harmonics = 3 if args.harmonic else 1
    freq_func, _ = meow_freq(offset=8.0)
    keys = generate_rnd_keys(args.seeds)
    os.makedirs(args.out, exist_ok=True)
    prefix = "harmonic_fastf0nls" if args.harmonic else "fastf0nls"

    # Reference window contract: length 300, overlap 299
    # (fastf0nls.py:176-177), median kernel ~ window/2 forced odd.
    wl = args.window_length
    overlap = wl - 1

    all_results = {}
    for mag in ["const", "damped", "random"]:
        rmses = []
        for k in np.asarray(keys):
            _, _, ys = toymodel_measurements(
                jnp.asarray(k), mag, dt=dt, T=T,
                num_harmonics=num_harmonics)
            times, f0s = pitch_track(np.asarray(ys), fs, num_harmonics,
                                     window_length=wl,
                                     window_overlap=overlap)
            smoothed = median_smooth(f0s, force_odd(round(wl / 2)))
            err = rmse(jnp.asarray(smoothed),
                       freq_func(jnp.asarray(times)))
            rmses.append(float(err))
        res = dict(rmse=np.asarray(rmses))
        np.savez(os.path.join(args.out, f"{prefix}_{mag}.npz"), **res)
        all_results.setdefault(prefix, {})[mag] = res

    print_rmse_table(all_results)


if __name__ == "__main__":
    main()
