"""Bat echolocation IF analysis (counterpart of the reference
``real_applications/bats/{eptesicus_nilssonii,myotis_myotis}_analysis.py``).

The wav files are from batcalls.com and are not vendored (same as the
reference); pass the path explicitly.  Fixed hand-set harmonic-model
parameters, cubature sigma points, freq_scale=1e4, filter+smoother wall
time printed (the reference's headline real-data timing).

Usage:
    python demos/bats_analysis.py --wav path/to/call.wav --species myotis \
        [--crop-start 19000 --crop-end 44334] [--plot out.png]
"""

# Allow running straight from a source checkout (no pip install).
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wav", required=True)
    ap.add_argument("--species", default="myotis",
                    choices=["myotis", "eptesicus"])
    ap.add_argument("--crop-start", type=int, default=None)
    ap.add_argument("--crop-end", type=int, default=None)
    ap.add_argument("--form", default="cov", choices=["cov", "sqrt"])
    ap.add_argument("--plot", default=None)
    args = ap.parse_args()

    import jax.numpy as jnp
    from chirpgp_tpu.apps import (
        EPTESICUS, MYOTIS, analyze_bat_call, load_wav, standardize)

    crop = None
    if args.crop_start is not None or args.crop_end is not None:
        crop = (args.crop_start or 0, args.crop_end)
    fs, ys = load_wav(args.wav, crop=crop)
    ys = standardize(ys)
    bat = MYOTIS if args.species == "myotis" else EPTESICUS

    est, wall = analyze_bat_call(ys, float(fs), bat, form=args.form,
                                 time_it=True)
    print(f"T={ys.shape[0]} samples at fs={fs} Hz, "
          f"{bat.num_harmonics} harmonics")
    print(f"filter+smoother wall time (post warm-up): {wall:.4f} s")
    print(f"IF range: {float(jnp.min(est['if_mean'])):.1f} .. "
          f"{float(jnp.max(est['if_mean'])):.1f} Hz")

    if args.plot:
        import numpy as np
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        dt = 1.0 / float(fs)
        ts = np.arange(ys.shape[0]) * dt
        fig, ax = plt.subplots(figsize=(8, 5))
        ax.specgram(np.asarray(ys), NFFT=256, Fs=float(fs),
                    noverlap=192, cmap="magma")
        ax.plot(ts, np.asarray(est["if_mean"]), "c", lw=1.5,
                label="IF posterior mean")
        ax.set_xlabel("time (s)")
        ax.set_ylabel("frequency (Hz)")
        ax.legend()
        fig.savefig(args.plot, dpi=130)
        print(f"wrote {args.plot}")


if __name__ == "__main__":
    main()
