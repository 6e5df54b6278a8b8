"""Per-op matmul-precision sensitivity of the batched filter+smoother.

Round 3 fixed the Table-I accuracy gaps with a PACKAGE-WIDE
``jax_default_matmul_precision = "high"`` (multi-pass bf16), costing ~19%
of the fused throughput (19.1M -> 14.8M steps/s/chip) because the 3-pass
lowering triples the op count in a latency-bound scan body.  VERDICT r3
asks whether high precision can be SCOPED to the ops that actually need
it (#3 "Recover throughput at validated accuracy").

This script answers the accuracy half ON CPU by emulating the TPU's
default lowering per einsum call-site: TPU "default" rounds the f32
INPUTS to bfloat16 and accumulates in f32, so casting operands
bf16 -> f32 before an exact-f32 einsum reproduces exactly the error model
(input rounding, full-precision accumulate).  Each named group of einsum
equations in ``chirpgp_tpu.infer.batched`` is downgraded in isolation
(and jointly) and the end-to-end estimate error is measured at the
reference's own learnt optimum on paired seed-0 data -- the same
isolation PARITY.md r3 §1 used to diagnose the original corruption.

    python experiments/precision_sensitivity.py          # CPU, ~a minute

The perf half (does scoping actually recover throughput on the TPU)
is measured by bench.py once the einsums carry explicit ``precision=``.
"""

# Allow running straight from a source checkout (no pip install).
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import types

import numpy as np


# Einsum-equation groups in chirpgp_tpu/infer/batched.py, keyed by role.
GROUPS = {
    # sigma-point generation chi = m + xi @ L (K = d)
    "chi": {"sj,ijb->sib"},
    # weighted moment reduction mp = w @ mu (K = S)
    "mp": {"s,sib->ib"},
    # joint-pre-array projection A = xiw^T dev, dev_perp remainder (K = S, d)
    "proj": {"sp,sib->pib", "sp,pib->sib"},
    # Householder column updates inside tria_cf (K = rows)
    "tria": {"nb,nkb->kb"},
    # backward smoother maps: gain applications + Gram D (batched, K = d)
    "back": {"ijb,jb->ib", "ikb,kjb->ijb", "kib,kjb->ijb", "ikb,jkb->ijb"},
    # final Gauss-Hermite IF expectation (K = order)
    "exp": {"s,stb->tb"},
}


def install_bf16_emulation(downgraded_eqs):
    """Replace ``batched.jnp`` with a proxy whose einsum rounds operands
    to bf16 (then back to f32) for the given equations -- the TPU
    default-precision error model -- and is exact otherwise."""
    import jax.numpy as real_jnp
    from chirpgp_tpu.infer import batched

    proxy = types.SimpleNamespace()
    for name in dir(real_jnp):
        if not name.startswith("_"):
            setattr(proxy, name, getattr(real_jnp, name))

    def einsum(eq, *ops, **kw):
        if eq in downgraded_eqs:
            ops = tuple(o.astype(real_jnp.bfloat16).astype(real_jnp.float32)
                        for o in ops)
        return real_jnp.einsum(eq, *ops, **kw)

    proxy.einsum = einsum
    batched.jnp = proxy
    return batched


def restore():
    import jax.numpy as real_jnp
    from chirpgp_tpu.infer import batched
    batched.jnp = real_jnp


def measure(cfg, params, ys, true_freqs, downgraded_eqs):
    import jax
    import jax.numpy as jnp
    from chirpgp_tpu.apps.pipeline import estimate_if_batched
    from chirpgp_tpu.utils import rmse

    install_bf16_emulation(downgraded_eqs)
    try:
        # Eager (no jit): each downgrade set retraces anyway, and the
        # one-hot H check in the batched kernels is host-side.
        est = estimate_if_batched(cfg, params, ys[None])
        return float(rmse(true_freqs, est["if_mean"][0])) * 10.0
    finally:
        restore()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--method", default="ckfs", choices=["ckfs", "ghfs"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--seeds", type=int, default=1,
                    help="average the key configs over this many seeds")
    ap.add_argument("--full", action="store_true",
                    help="also run the per-group leave-one-out grid on "
                         "--seed")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from chirpgp_tpu.apps import IFEstimationConfig

    root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    data = np.load(_os.path.join(root, "results/data/toydata_const.npz"))
    ref = np.load(_os.path.join(
        root, f"results/reference/{args.method}_const.npz"))

    def load_seed(s):
        return (jnp.asarray(ref["params"][s], dtype=jnp.float32),
                jnp.asarray(data["ys"][s], dtype=jnp.float32),
                jnp.asarray(data["true_freqs"], dtype=jnp.float32))

    quad = "cubature" if args.method == "ckfs" else "gauss_hermite"
    cfg = IFEstimationConfig(method="ghfs", quadrature=quad, form="sqrt")

    all_eqs = set().union(*GROUPS.values())
    sensitive = GROUPS["chi"] | GROUPS["mp"]

    # Key configs over several seeds: exact, everything downgraded, and
    # the scoping candidate (downgrade all EXCEPT the sigma-point
    # generation + moment reduction).
    configs = [("none (exact f32)", set()),
               ("ALL groups", all_eqs),
               ("all but chi+mp", all_eqs - sensitive),
               ("only chi+mp", sensitive)]
    print(f"\n{args.method} @ reference optimum, {args.seeds} seed(s) -- "
          f"IF RMSE x10 under emulated bf16-input rounding:")
    print(f"{'downgraded group(s)':24s} {'mean RMSE x10':>13s} "
          f"{'vs exact':>9s} per-seed")
    base_vals = None
    for name, eqs in configs:
        vals = []
        for s in range(args.seeds):
            params, ys, tf = load_seed(s)
            vals.append(measure(cfg, params, ys, tf, eqs))
        if base_vals is None:
            base_vals = vals
        rel = np.mean(np.asarray(vals) / np.asarray(base_vals))
        print(f"{name:24s} {np.mean(vals):13.4f} {rel:9.3f}x "
              f"{[round(v, 4) for v in vals]}")

    if args.full:
        params, ys, tf = load_seed(args.seed)
        rows = [("none (exact f32)", measure(cfg, params, ys, tf, set())),
                ("ALL groups", measure(cfg, params, ys, tf, all_eqs))]
        for name, eqs in GROUPS.items():
            rows.append((f"only {name}", measure(cfg, params, ys, tf, eqs)))
        for name, eqs in GROUPS.items():
            rows.append((f"all but {name}",
                         measure(cfg, params, ys, tf, all_eqs - eqs)))
        base = rows[0][1]
        print(f"\nleave-one-out grid, seed {args.seed}:")
        print(f"{'downgraded group(s)':24s} {'RMSE x10':>9s} "
              f"{'vs exact':>9s}")
        for name, v in rows:
            print(f"{name:24s} {v:9.4f} {v / base:9.3f}x")


if __name__ == "__main__":
    main()
