"""Filter-error Monte-Carlo sweep vs the CRLB (paper Fig 5 reproduction).

Counterpart of ``tetralith/jobs/crlb_{ekf,ghf}.py`` + ``run_crlbs.sh``:
the reference burns one 20-core/130GB Slurm node per (lam, b) grid point
for 1e6 trajectories; here each grid point is a sharded vmapped program
(seeds over the mesh, psum-reduced error statistics), and the (lam, b)
sweep is a plain loop.

Usage:
    python experiments/run_crlb.py -method ghf -num_mcs 10000
    python experiments/run_crlb.py -lam 0.1 0.4 0.7 1.0 -b 0.1 0.4 0.7 1.0
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
    # Flag names mirror the reference job (``crlb_ekf.py:16-23``).
    ap.add_argument("-method", default="ghf", choices=["ghf", "ekf"])
    ap.add_argument("-lam", type=float, nargs="+", default=[0.1])
    ap.add_argument("-b", type=float, nargs="+", default=[0.1])
    ap.add_argument("-delta", type=float, default=0.1)
    ap.add_argument("-ell", type=float, default=1.0)
    ap.add_argument("-sigma", type=float, default=1.0)
    ap.add_argument("-Xi", type=float, default=0.1)
    ap.add_argument("-num_mcs", type=int, default=10000)
    ap.add_argument("-dt", type=float, default=0.01)
    ap.add_argument("-T", type=int, default=500)
    ap.add_argument("-out", default="./results")
    args = ap.parse_args()

    from chirpgp_tpu.apps import filter_error_mc
    from chirpgp_tpu.parallel import make_mesh

    mesh = make_mesh()
    os.makedirs(args.out, exist_ok=True)
    for lam in args.lam:
        for b in args.b:
            res = filter_error_mc(lam, b, args.delta, args.ell, args.sigma,
                                  args.Xi, args.num_mcs,
                                  method=args.method, dt=args.dt, T=args.T,
                                  mesh=mesh)
            path = os.path.join(
                args.out, f"crlb_{args.method}_lam{lam}_b{b}.npz")
            np.savez(path, **res)
            print(f"lam={lam} b={b}: final mean err_x2="
                  f"{res['mean_err_x2'][-1]:.5f} err_v="
                  f"{res['mean_err_v'][-1]:.5f} -> {path}")


if __name__ == "__main__":
    main()
