"""FHC (harmonic-chirp NLS) Monte-Carlo sweep.

Reference counterpart: ``tetralith/jobs/fhc.m`` batches the MATLAB
``fhc_estimator`` over a parcluster and the table printer reads the
resulting ``.mat`` files (``print_rmse_table.py:41-46``).  Here the
estimator is the in-framework JAX grid NLS
(:func:`chirpgp_tpu.baselines.fhc.fhc_pitch_track`), run over the same
pregenerated-key harmonic-chirp data with the fastF0NLS window protocol
(length 300, hop 5, median smoothing), RMSE against the true IF at the
window centres.

The reference runs FHC twice (``fhc.m:25-46``): once on the single-chirp
data with nHarmonics=1 (``fhc_*`` column) and once on the 3-harmonic data
with nHarmonics=3 (``harmonic_fhc_*`` column); the output prefix follows
the same convention here.

Usage:
    python experiments/run_fhc.py --seeds 100 --num-harmonics 1
    python experiments/run_fhc.py --seeds 100 --num-harmonics 3
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
    ap.add_argument("--seeds", type=int, default=100)
    ap.add_argument("--T", type=int, default=3141)
    ap.add_argument("--num-harmonics", type=int, default=3)
    ap.add_argument("--window-length", type=int, default=300)
    ap.add_argument("--hop", type=int, default=5)
    ap.add_argument("--mags", nargs="+",
                    default=["const", "damped", "random"])
    ap.add_argument("--out", default="./results")
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--data-dir", default="./results/data",
                    help="pregenerated measurement data (bit-exact seed "
                         "pairing with the SSM sweeps); '' regenerates "
                         "on-device")
    args = ap.parse_args()
    if args.platform:
        import jax as _jax
        _jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp

    from chirpgp_tpu.apps import generate_rnd_keys, toymodel_measurements
    from chirpgp_tpu.apps.sweeps import print_rmse_table
    from chirpgp_tpu.baselines.fastnls import median_smooth, force_odd
    from chirpgp_tpu.baselines.fhc import fhc_pitch_track_batch
    from chirpgp_tpu.toymodels import meow_freq
    from chirpgp_tpu.utils import rmse

    dt, T = 1e-3, args.T
    fs = 1.0 / dt
    freq_func, _ = meow_freq(offset=8.0)
    keys = generate_rnd_keys(args.seeds)
    os.makedirs(args.out, exist_ok=True)
    wl, overlap = args.window_length, args.window_length - args.hop
    prefix = "harmonic_fhc" if args.num_harmonics > 1 else "fhc"

    import functools
    import jax

    all_results = {}
    for mag in args.mags:
        if args.data_dir:
            dprefix = ("toydata" if args.num_harmonics == 1
                       else f"toydata_h{args.num_harmonics}")
            data = np.load(os.path.join(args.data_dir,
                                        f"{dprefix}_{mag}.npz"))
            yss = np.asarray(data["ys"][:args.seeds])
        else:
            gen = functools.partial(toymodel_measurements, mag_name=mag,
                                    dt=dt, T=T,
                                    num_harmonics=args.num_harmonics)
            _, _, yss = jax.jit(jax.vmap(gen))(keys)
        times, f0s = fhc_pitch_track_batch(np.asarray(yss), fs,
                                           args.num_harmonics,
                                           window_length=wl,
                                           window_overlap=overlap)
        tf = freq_func(jnp.asarray(times))
        rmses = []
        for b in range(f0s.shape[0]):
            smoothed = median_smooth(f0s[b], force_odd(round(wl / 10)))
            rmses.append(float(rmse(jnp.asarray(smoothed), tf)))
        res = dict(rmse=np.asarray(rmses))
        np.savez(os.path.join(args.out, f"{prefix}_{mag}.npz"), **res)
        all_results.setdefault(prefix, {})[mag] = res
        print(f"{prefix} {mag}: median rmse {np.nanmedian(res['rmse']):.4f}",
              flush=True)

    print_rmse_table(all_results)


if __name__ == "__main__":
    main()
