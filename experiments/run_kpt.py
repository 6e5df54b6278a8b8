"""Kalman-pitch-tracker Monte-Carlo sweep (reference
``tetralith/jobs/kpt_mle.py`` and ``harmonic_kpt_mle.py``): per seed,
learn the KPT parameters by EKF-marginal MLE, smooth, estimate the IF,
record RMSE with NaN-on-divergence, over the pregenerated-key toymodel
data.

Usage:
    python experiments/run_kpt.py --seeds 100
    python experiments/run_kpt.py --num-harmonics 3 --seeds 100
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
    ap.add_argument("--num-harmonics", type=int, default=1)
    ap.add_argument("--max-iters", type=int, default=100)
    ap.add_argument("--mags", nargs="+",
                    default=["const", "damped", "random"])
    ap.add_argument("--out", default="./results")
    ap.add_argument("--platform", default="cpu",
                    help="KPT is a small-d EKF; the monolithic in-JAX "
                         "L-BFGS sweep runs fine on CPU")
    args = ap.parse_args()
    if args.platform:
        import jax as _jax
        _jax.config.update("jax_platforms", args.platform)

    from chirpgp_tpu.apps import generate_rnd_keys
    from chirpgp_tpu.apps.sweeps import mc_kpt_sweep, print_rmse_table

    keys = generate_rnd_keys(args.seeds)
    os.makedirs(args.out, exist_ok=True)
    prefix = "harmonic_kpt" if args.num_harmonics > 1 else "kpt"

    all_results = {}
    for mag in args.mags:
        res = mc_kpt_sweep(keys, mag, T=args.T,
                           num_harmonics=args.num_harmonics,
                           max_iters=args.max_iters)
        np.savez(os.path.join(args.out, f"{prefix}_{mag}.npz"), **res)
        all_results.setdefault(prefix, {})[mag] = res
        print(f"{prefix} {mag}: median rmse "
              f"{np.nanmedian(res['rmse']):.4f} "
              f"nan={int(np.sum(~np.isfinite(res['rmse'])))}", flush=True)

    print_rmse_table(all_results)


if __name__ == "__main__":
    main()
