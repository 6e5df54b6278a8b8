"""Wall-clock timing of the filters/smoothers on the canonical config
(reference ``paper_plots_tables/print_time.py:44-61``), via the
first-class timing utility (warm-up + repeats).

Usage: python experiments/print_time.py [--T 3141] [--form sqrt]
"""

# Allow running straight from a source checkout (no pip install).
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import math


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--T", type=int, default=3141)
    ap.add_argument("--form", default="cov", choices=["cov", "sqrt"])
    ap.add_argument("--methods", nargs="+",
                    default=["ekfs", "ghfs"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from chirpgp_tpu.apps import IFEstimationConfig, estimate_if
    from chirpgp_tpu.models import g
    from chirpgp_tpu.toymodels import gen_chirp, constant_mag, meow_freq
    from chirpgp_tpu.utils import time_jitted

    dt, T, Xi = 1e-3, args.T, 0.1
    ts = jnp.linspace(dt, dt * T, T)
    _, phase = meow_freq(offset=8.0)
    key = jax.random.PRNGKey(555)
    ys = gen_chirp(ts, constant_mag(1.0), phase) \
        + math.sqrt(Xi) * jax.random.normal(key, (T,))

    for method in args.methods:
        cfg = IFEstimationConfig(dt=dt, Xi=Xi, method=method,
                                 form=args.form)
        params = g(cfg.default_init_theta())
        fn = jax.jit(lambda y, cfg=cfg, params=params:
                     estimate_if(cfg, params, y)["if_mean"])
        res = time_jitted(fn, ys)
        print(f"[{method}/{args.form}] filter+smoother+expectation, "
              f"T={T}: {res}")


if __name__ == "__main__":
    main()
