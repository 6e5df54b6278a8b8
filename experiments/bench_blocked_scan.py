"""Single-chip timing of the blocked parallel KF/RTS vs the sequential
scan and the flat associative scan (VERDICT r3 weak #4 follow-up: the
flat scan measured 0.49x/0.03x on TPU; the blocked form is the
TPU-idiomatic fix -- see ``parallel_kf.blocked_scan``)."""

import argparse
import json
import time

import jax
import jax.numpy as jnp

from chirpgp_tpu.infer import kf, rts
from chirpgp_tpu.infer.parallel_kf import kf_rts_parallel
from chirpgp_tpu.models import m32_solution, stationary_cov_m32


def time_call(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--T", type=int, nargs="+", default=[3141, 25000])
    ap.add_argument("--blocks", type=int, nargs="+",
                    default=[64, 128, 256, 512])
    ap.add_argument("--flat", action="store_true",
                    help="also time the flat associative scan")
    args = ap.parse_args()

    F, Sig = (a.astype(jnp.float32) for a in m32_solution(1.0, 1.0, 1e-3))
    H = jnp.array([1.0, 0.0], jnp.float32)
    P0 = stationary_cov_m32(1.0, 1.0).astype(jnp.float32)
    m0 = jnp.zeros(2, jnp.float32)

    print(f"devices: {jax.devices()}")
    res = {}
    for T in args.T:
        ys = jax.random.normal(jax.random.PRNGKey(0), (T,), jnp.float32)

        def seq(ys_):
            mfs, Pfs, nll = kf(F, Sig, H, 0.1, m0, P0, ys_)
            return rts(F, Sig, mfs, Pfs), nll

        t_seq = time_call(jax.jit(seq), ys)
        res[f"seq_T{T}_s"] = round(t_seq, 5)
        print(f"T={T} sequential: {t_seq*1e3:8.2f} ms "
              f"({T/t_seq:,.0f} steps/s)")
        for bs in args.blocks:
            t = time_call(jax.jit(
                lambda ys_, bs=bs: kf_rts_parallel(F, Sig, H, 0.1, m0, P0,
                                                   ys_, block_size=bs)), ys)
            res[f"blocked{bs}_T{T}_s"] = round(t, 5)
            print(f"T={T} blocked C={bs:4d}: {t*1e3:8.2f} ms "
                  f"({T/t:,.0f} steps/s, {t_seq/t:.2f}x vs seq)")
        if args.flat:
            t = time_call(jax.jit(
                lambda ys_: kf_rts_parallel(F, Sig, H, 0.1, m0, P0, ys_)), ys)
            res[f"flat_T{T}_s"] = round(t, 5)
            print(f"T={T} flat assoc:    {t*1e3:8.2f} ms "
                  f"({T/t:,.0f} steps/s, {t_seq/t:.2f}x vs seq)")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
