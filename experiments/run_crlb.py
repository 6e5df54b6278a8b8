"""Filter-error Monte-Carlo sweep vs the CRLB (paper Fig 5 reproduction).

Counterpart of ``tetralith/jobs/crlb_{ekf,ghf}.py`` + ``run_crlbs.sh``:
the reference burns one 20-core/130GB Slurm node per (lam, b) grid point
for 1e6 trajectories (``crlb_ekf.py:59``, ``run_crlb_ekf.sh:3-5``); here
each grid point runs on ONE chip as a chunked channels-batched program
(simulate + filter + per-step error reduction, sums accumulated in f64 on
host), and the (lam, b) sweep is a plain loop.  ``--pcrlb`` additionally
computes the posterior Cramer--Rao bound overlay at the same parameters.

Usage:
    python experiments/run_crlb.py -method ekf -num_mcs 1000000 \
        -lam 0.1 0.4 0.7 1.0 -b 0.1 0.4 0.7 1.0 --pcrlb
"""

# Allow running straight from a source checkout (no pip install).
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    # Flag names mirror the reference job (``crlb_ekf.py:16-23``).
    ap.add_argument("-method", default="ghf", choices=["ghf", "ekf"])
    ap.add_argument("-lam", type=float, nargs="+", default=[0.1])
    ap.add_argument("-b", type=float, nargs="+", default=[0.1])
    ap.add_argument("-delta", type=float, default=0.1)
    ap.add_argument("-ell", type=float, default=1.0)
    ap.add_argument("-sigma", type=float, default=1.0)
    ap.add_argument("-Xi", type=float, default=0.1)
    ap.add_argument("-num_mcs", type=int, default=1_000_000)
    ap.add_argument("-dt", type=float, default=0.01)
    ap.add_argument("-T", type=int, default=500)
    ap.add_argument("-out", default="./results")
    ap.add_argument("--chunk", type=int, default=16384)
    ap.add_argument("--backend", default="auto",
                    choices=["auto", "cf", "vmap"],
                    help="chunk filter backend: channels-first batched "
                         "kernel (cf; sigma-point only) or per-seed vmap")
    ap.add_argument("--pcrlb", action="store_true",
                    help="also compute the PCRLB overlay (1e5 MC) per "
                         "grid point")
    ap.add_argument("--pcrlb-mcs", type=int, default=100_000)
    ap.add_argument("--sharded", action="store_true",
                    help="use the mesh-sharded in-memory path instead of "
                         "the chunked accumulator (small num_mcs only)")
    args = ap.parse_args()

    from chirpgp_tpu.apps.crlb import (
        filter_error_mc, filter_error_mc_chunked, pcrlb_chirp_mc)

    os.makedirs(args.out, exist_ok=True)
    for lam in args.lam:
        for b in args.b:
            t0 = time.time()
            if args.sharded:
                from chirpgp_tpu.parallel import make_mesh
                res = filter_error_mc(
                    lam, b, args.delta, args.ell, args.sigma, args.Xi,
                    args.num_mcs, method=args.method, dt=args.dt,
                    T=args.T, mesh=make_mesh())
            else:
                res = filter_error_mc_chunked(
                    lam, b, args.delta, args.ell, args.sigma, args.Xi,
                    args.num_mcs, method=args.method, dt=args.dt,
                    T=args.T, chunk=args.chunk, backend=args.backend)
            wall = time.time() - t0
            res["wall_s"] = np.float64(wall)
            res["num_mcs"] = np.int64(args.num_mcs)
            res["dt"] = np.float64(args.dt)
            if args.pcrlb:
                res.update(pcrlb_chirp_mc(
                    lam, b, args.delta, args.ell, args.sigma, args.Xi,
                    num_mcs=args.pcrlb_mcs, dt=args.dt, T=args.T))
            path = os.path.join(
                args.out, f"crlb_{args.method}_lam{lam}_b{b}.npz")
            np.savez(path, **res)
            print(f"lam={lam} b={b}: {args.num_mcs} trajs in {wall:.1f}s "
                  f"({args.num_mcs * args.T / wall / 1e6:.2f}M "
                  f"filter-steps/s) final mean err_x2="
                  f"{res['mean_err_x2'][-1]:.5f} err_v="
                  f"{res['mean_err_v'][-1]:.5f} -> {path}", flush=True)


if __name__ == "__main__":
    main()
