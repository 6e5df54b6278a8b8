"""Monte-Carlo RMSE-table experiment (paper Table I reproduction).

TPU-native counterpart of the reference's per-method Slurm jobs
(``tetralith/jobs/*_mle.py`` + ``paper_plots_tables/print_rmse_table.py``):
instead of a sequential Python loop per seed per method, each method's
100-seed sweep runs as ONE sharded program over the device mesh; results
are written as idempotent .npz files and aggregated into the reference's
table format (RMSE x10 mean+-std / median / min / #NaN).

Usage:
    python experiments/run_rmse_table.py --methods ghfs ekfs --seeds 100
    python experiments/run_rmse_table.py --methods all --out ./results
"""

# Allow running straight from a source checkout (no pip install).
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse

import jax


METHOD_CONFIGS = {
    # method name -> IFEstimationConfig kwargs
    "ghfs": dict(method="ghfs"),
    "ekfs": dict(method="ekfs"),
    "cd_ghfs": dict(method="cd_ghfs"),
    "cd_ekfs": dict(method="cd_ekfs"),
    "lascala_ghfs": dict(method="ghfs", model="lascala"),
    "lascala_ekfs": dict(method="ekfs", model="lascala"),
    "harmonic_ghfs": dict(method="ghfs", model="harmonic",
                          num_harmonics=3, quadrature="cubature"),
    "harmonic_ekfs": dict(method="ekfs", model="harmonic",
                          num_harmonics=3),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--methods", nargs="+", default=["ghfs"],
                    help=f"any of {sorted(METHOD_CONFIGS)} or 'all'")
    ap.add_argument("--seeds", type=int, default=100)
    ap.add_argument("--T", type=int, default=3141)
    ap.add_argument("--mags", nargs="+",
                    default=["const", "damped", "random"])
    ap.add_argument("--out", default="./results")
    ap.add_argument("--form", default="cov", choices=["cov", "sqrt"])
    ap.add_argument("--x64", action="store_true")
    ap.add_argument("--max-iters", type=int, default=200)
    ap.add_argument("--stepped", action="store_true",
                    help="host-stepped batched L-BFGS (one short dispatch "
                         "per iteration; all magnitudes in one batch) -- "
                         "the robust mode on the tunneled single-chip TPU "
                         "backend (PARITY.md backend notes)")
    args = ap.parse_args()

    if args.x64:
        jax.config.update("jax_enable_x64", True)

    from chirpgp_tpu.apps import (
        IFEstimationConfig, generate_rnd_keys, mc_mle_sweep,
        print_rmse_table)
    from chirpgp_tpu.apps.sweeps import save_results
    from chirpgp_tpu.parallel import make_mesh, pad_to_multiple

    methods = sorted(METHOD_CONFIGS) if args.methods == ["all"] \
        else args.methods
    keys = generate_rnd_keys(max(args.seeds, 1))[:args.seeds]

    all_results = {}
    if args.stepped:
        import functools
        import jax.numpy as jnp
        from chirpgp_tpu.apps.sweeps import (
            mle_sweep_on_measurements, toymodel_measurements)

        for method in methods:
            cfg = IFEstimationConfig(form=args.form,
                                     max_iters=args.max_iters,
                                     **METHOD_CONFIGS[method])
            nh = cfg.num_harmonics if cfg.model == "harmonic" else 1
            tf_parts, ys_parts = [], []
            for mag in args.mags:
                gen = functools.partial(
                    toymodel_measurements, mag_name=mag, dt=cfg.dt,
                    T=args.T, Xi=cfg.Xi, num_harmonics=nh)
                _, tf, ys = jax.jit(jax.vmap(gen))(keys)
                tf_parts.append(tf)
                ys_parts.append(ys)
            res = mle_sweep_on_measurements(
                cfg, jnp.concatenate(tf_parts), jnp.concatenate(ys_parts),
                verbose=True)
            n = keys.shape[0]
            by_mag = {}
            for i, mag in enumerate(args.mags):
                r = {k: v[i * n:(i + 1) * n] for k, v in res.items()}
                path = save_results(r, method, mag, args.out)
                print(f"saved {path}", flush=True)
                by_mag[mag] = r
            all_results[method] = by_mag
        print_rmse_table(all_results)
        return

    mesh = make_mesh()
    n_dev = mesh.devices.size
    keys, n_real = pad_to_multiple(keys, n_dev)

    for method in methods:
        cfg = IFEstimationConfig(form=args.form, max_iters=args.max_iters,
                                 **METHOD_CONFIGS[method])
        by_mag = {}
        for mag in args.mags:
            res = mc_mle_sweep(cfg, keys, mag, T=args.T, mesh=mesh)
            res = {k: v[:n_real] for k, v in res.items()}
            path = save_results(res, method, mag, args.out)
            print(f"saved {path}")
            by_mag[mag] = res
        all_results[method] = by_mag

    print_rmse_table(all_results)


if __name__ == "__main__":
    main()
