"""Multi-harmonic toy-chirp IF estimation (counterpart of the reference
``demos/ghfs_harmonics_mle.py``): 3 harmonics (d=8), cubature sigma
points, MLE via the in-JAX L-BFGS.

Usage: python demos/ghfs_harmonics_mle.py [--harmonics 3] [--plot]
"""

# Allow running straight from a source checkout (no pip install).
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import math

import jax
import jax.numpy as jnp

from chirpgp_tpu.apps import IFEstimationConfig, run_pipeline
from chirpgp_tpu.toymodels import (
    gen_harmonic_chirp, constant_mag, meow_freq)
from chirpgp_tpu.utils import rmse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--harmonics", type=int, default=3)
    ap.add_argument("--form", default="cov", choices=["cov", "sqrt"])
    ap.add_argument("--T", type=int, default=3141)
    ap.add_argument("--plot", action="store_true")
    args = ap.parse_args()

    dt, T, Xi = 1e-3, args.T, 0.1
    ts = jnp.linspace(dt, dt * T, T)
    true_freq_func, true_phase_func = meow_freq(offset=8.0)

    key = jax.random.PRNGKey(555)
    mags = [constant_mag(1.0 / k) for k in range(1, args.harmonics + 1)]
    true_chirp = gen_harmonic_chirp(ts, mags, true_phase_func)
    ys = true_chirp + math.sqrt(Xi) * jax.random.normal(key, (T,))

    cfg = IFEstimationConfig(dt=dt, Xi=Xi, method="ghfs", model="harmonic",
                             num_harmonics=args.harmonics,
                             quadrature="cubature", form=args.form)
    opt, params, est = run_pipeline(cfg, ys)
    err = rmse(true_freq_func(ts), est["if_mean"])
    print(f"learnt params: {params}  converged={bool(opt.success)}")
    print(f"IF RMSE: {float(err):.4f}")

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        plt.plot(ts, true_freq_func(ts), "--", label="True")
        plt.plot(ts, est["if_mean"], "k", label="Estimated")
        plt.legend()
        plt.savefig("ghfs_harmonics_if.png", dpi=120)


if __name__ == "__main__":
    main()
