"""Scaling-efficiency harness: parallel seeds/sec at 1 -> N devices.

The BASELINE.md target: 10k parallel seeds with >= 80% samples/sec
scaling efficiency from 1 chip to >= 2 hosts.  This harness measures
seeds/sec of the sharded Monte-Carlo GHFS filter+smoother sweep on
meshes of increasing size and reports the efficiency relative to the
1-device throughput.

On a multi-host pod, run under the same launcher on every host (the
mesh spans all hosts via ``jax.distributed``).  On a single CPU host you
can exercise the *machinery* with virtual devices -- but virtual devices
share the physical cores, so the efficiency numbers are only meaningful
on real multi-chip hardware:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python bench_scaling.py --platform cpu --seeds 256
"""

import argparse
import json
import math
import sys
import time

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=1024)
    ap.add_argument("--T", type=int, default=512)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--distributed", action="store_true",
                    help="initialize jax.distributed first (pods)")
    args = ap.parse_args()

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.distributed:
        from chirpgp_tpu.parallel.multihost import initialize_distributed
        initialize_distributed()

    from chirpgp_tpu.apps import IFEstimationConfig, estimate_if
    from chirpgp_tpu.models import g
    from chirpgp_tpu.parallel import make_mesh, sharded_seed_sweep
    from chirpgp_tpu.toymodels import gen_chirp, constant_mag, meow_freq

    n_dev = len(jax.devices())
    print(f"devices: {n_dev}", file=sys.stderr)

    DT, XI, T = 1e-3, 0.1, args.T
    ts = jnp.linspace(DT, DT * T, T, dtype=jnp.float32)
    _, phase = meow_freq(offset=8.0)
    base = gen_chirp(ts, constant_mag(1.0), phase)
    cfg = IFEstimationConfig(method="ghfs", form="sqrt")
    params = g(cfg.default_init_theta()).astype(jnp.float32)

    def per_seed(key):
        ys = base + math.sqrt(XI) * jax.random.normal(key, (T,),
                                                      dtype=jnp.float32)
        est = estimate_if(cfg, params, ys)
        return est["nell"][-1]

    results = {}
    n = 1
    sizes = []
    while n <= n_dev:
        sizes.append(n)
        n *= 2
    for size in sizes:
        mesh = make_mesh(size)
        seeds = (args.seeds // size) * size
        keys = jax.random.split(jax.random.PRNGKey(0), seeds)
        run = lambda: sharded_seed_sweep(per_seed, keys, mesh)
        out = run()
        jax.block_until_ready(out)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = run()
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        best = min(times)
        results[size] = seeds / best
        print(f"devices={size}: {seeds} seeds in {best:.3f}s -> "
              f"{seeds / best:,.1f} seeds/s", file=sys.stderr)

    base_rate = results[sizes[0]]
    effs = {size: results[size] / (base_rate * size) for size in sizes}
    print(json.dumps({
        "metric": "mc_sweep_seeds_per_sec_scaling",
        "seeds_per_sec": {str(k): round(v, 1) for k, v in results.items()},
        "efficiency_vs_1dev": {str(k): round(v, 3) for k, v in effs.items()},
    }))


if __name__ == "__main__":
    main()
