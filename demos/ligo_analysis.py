"""LIGO GW150914 chirp IF estimation (counterpart of the reference
``real_applications/ligo/gw_freq_estimate.py``).

Strain data: two-column text files (time, strain), e.g. the GW150914
releases from the Gravitational Wave Open Science Center.  Xi=0.3, GH
order 3, MLE from g^{-1}([0.1, 2, 0.5, 0.02, 40, 1]).

Usage:
    python demos/ligo_analysis.py --data H-H1_strain.txt [L-L1_strain.txt]
        [--plot out.png]
"""

# Allow running straight from a source checkout (no pip install).
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", nargs="+", required=True)
    ap.add_argument("--plot", default=None)
    args = ap.parse_args()

    import jax.numpy as jnp
    from chirpgp_tpu.apps import analyze_ligo, load_ligo_strain

    records = load_ligo_strain(args.data)
    results = []
    for path, (ts, ys) in zip(args.data, records):
        opt, params, est = analyze_ligo(ts, ys)
        print(f"[{path}] converged={bool(opt.success)} "
              f"({int(opt.num_iters)} iters), params={params}")
        print(f"[{path}] IF range: {float(jnp.min(est['if_mean'])):.1f} .. "
              f"{float(jnp.max(est['if_mean'])):.1f} Hz")
        results.append((ts, ys, est))

    if args.plot:
        import numpy as np
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(len(results), 1, figsize=(8, 3 * len(results)),
                                 squeeze=False)
        for ax_row, (ts, ys, est) in zip(axes, results):
            ax = ax_row[0]
            ax.plot(np.asarray(ts), np.asarray(est["if_mean"]), "k")
            ax.fill_between(np.asarray(ts), np.asarray(est["if_lower"]),
                            np.asarray(est["if_upper"]), alpha=0.2,
                            color="k")
            ax.set_xlabel("time (s)")
            ax.set_ylabel("IF (Hz)")
        fig.tight_layout()
        fig.savefig(args.plot, dpi=130)
        print(f"wrote {args.plot}")


if __name__ == "__main__":
    main()
