"""On-TPU regression check for the matmul-precision policy (PARITY.md r3 §1).

Reproduces the round-3 isolation that motivated the package default
``jax_default_matmul_precision = "high"``: the CKFS (cubature sigma-point)
filter+smoother estimate at the REFERENCE'S OWN learnt optimum on seed-0
constant-magnitude data.  Measured on TPU v5e:

    IF RMSE x10 = 0.918  under XLA's default (single-pass bf16) lowering
    IF RMSE x10 = 0.776  under the package "high" (multi-pass) policy
    IF RMSE x10 = 0.7762 for the float64 reference (CPU)

Exit code 0 iff the policy-protected estimate lands at <= --threshold
(default 0.85, comfortably separating 0.776 from 0.918).  Pass
--also-default to additionally measure under the unfixed lowering in a
subprocess and require it to be WORSE than the threshold -- proving the
guard still binds on this hardware generation.

Run on the real TPU (the failure mode is the TPU MXU lowering; CPU f32
passes trivially):

    python experiments/check_precision_policy.py --also-default
"""

# Allow running straight from a source checkout (no pip install).
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import subprocess
import sys


def measure() -> float:
    """IF RMSE x10 of the f32 CKFS estimate at the reference optimum,
    seed 0, constant magnitude (whatever precision policy is active)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from chirpgp_tpu.apps import IFEstimationConfig, estimate_if
    from chirpgp_tpu.utils import rmse

    root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    data = np.load(_os.path.join(root, "results/data/toydata_const.npz"))
    ref = np.load(_os.path.join(root,
                                "results/reference/ckfs_const.npz"))
    ys = jnp.asarray(data["ys"][0], dtype=jnp.float32)
    true_freqs = jnp.asarray(data["true_freqs"], dtype=jnp.float32)
    params = jnp.asarray(ref["params"][0], dtype=jnp.float32)

    cfg = IFEstimationConfig(method="ghfs", quadrature="cubature",
                             form="sqrt")
    est = jax.jit(lambda p, y: estimate_if(cfg, p, y))(params, ys)
    return float(rmse(true_freqs, est["if_mean"])) * 10.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=0.85)
    ap.add_argument("--also-default", action="store_true",
                    help="also measure under CHIRPGP_TPU_MATMUL_PRECISION="
                         "default and require it to exceed the threshold")
    ap.add_argument("--_measure-only", action="store_true",
                    help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args._measure_only:
        print(json.dumps({"rmse_x10": measure()}))
        return

    val = measure()
    ok = val <= args.threshold
    print(f"policy-protected CKFS seed-0 estimate: RMSE x10 = {val:.4f} "
          f"(threshold {args.threshold}) -> {'OK' if ok else 'FAIL'}")

    if args.also_default:
        env = dict(_os.environ, CHIRPGP_TPU_MATMUL_PRECISION="default")
        out = subprocess.run(
            [sys.executable, _os.path.abspath(__file__), "--_measure-only"],
            capture_output=True, text=True, env=env, timeout=1200)
        if out.returncode != 0:
            print(f"default-precision subprocess failed:\n{out.stderr[-2000:]}")
            sys.exit(1)
        val_def = json.loads(out.stdout.strip().splitlines()[-1])["rmse_x10"]
        binds = val_def > args.threshold
        print(f"unprotected (default bf16 lowering): RMSE x10 = "
              f"{val_def:.4f} -> guard {'still binds' if binds else 'NO LONGER binds'}")
        ok = ok and binds

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
