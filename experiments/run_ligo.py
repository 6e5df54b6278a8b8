"""GW150914-config LIGO pipeline run.

The reference's LIGO job (``real_applications/ligo/gw_freq_estimate.py``)
reads ``data/fig1-observed-{H,L}.txt``; in the reference repository those
files are 78-byte placeholders reading "Please download the data from
https://www.gw-openscience.org/events/GW150914/." -- the strain is NOT
vendored, and this environment has no network egress.  To exercise the
pipeline end-to-end at the exact reference configuration (fs=4096 Hz,
Xi=0.3, GH order 3, init g^{-1}([0.1, 2, 0.5, 0.02, 40, 1])), this runner
synthesizes a physically faithful GW150914-like inspiral:

- Newtonian chirp IF  f(t) = (5/256)^{3/8} / pi * (G Mc / c^3)^{-5/8}
  * (tc - t)^{-3/8}  with chirp mass Mc = 30 Msun (GW150914's ~28-32),
  swept until the ~300 Hz merger regime;
- amplitude growing as f^{2/3} (quadrupole);
- two detector records (H, L) with an inverted-phase, 7 ms-shifted copy
  (the actual H/L geometry of the event) and independent whitened noise.

With real strain files present, pass them via --data and the synthetic
branch is skipped (same pipeline call as the reference).

Outputs: results/ligo_synthetic.npz (true IF, posterior IF + band,
learnt params, RMSE over the in-band segment) and an optional figure.

``--reference`` runs the REFERENCE package's own pipeline
(``/root/reference/chirpgp``, f64, SciPy L-BFGS-B -- the exact
``gw_freq_estimate.py:26-56`` semantics, no standardization) on the SAME
synthetic records and writes ``ligo_reference.npz`` with its learnt
params + IF track, for a side-by-side parity check against
``ligo_synthetic.npz``.

Usage:
    python experiments/run_ligo.py [--plot results/ligo_synthetic.png]
    python experiments/run_ligo.py --data fig1-observed-H.txt ...
    python experiments/run_ligo.py --reference
"""

# Allow running straight from a source checkout (no pip install).
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import math
import os

import numpy as np

MSUN_SEC = 4.925491e-6          # G Msun / c^3 in seconds
FS = 4096.0


def synth_gw150914(key, mc_msun: float = 30.0, f0: float = 35.0,
                   f_cut: float = 300.0, noise_std: float = 0.55,
                   shift_ms: float = 7.0):
    """Two (ts, ys, true_f) records mimicking the fig1 observed strain."""
    import jax
    import jax.numpy as jnp

    gm = mc_msun * MSUN_SEC
    # Newtonian chirp: f(t) = k * (tc - t)^{-3/8},
    # k = (5/256)^{3/8} / pi * gm^{-5/8}.
    k = (5.0 / 256.0) ** 0.375 / math.pi * gm ** (-0.625)
    # Choose tc so that f(0) = f0, then run until f hits f_cut.
    tc = (k / f0) ** (8.0 / 3.0)
    t_end = tc - (k / f_cut) ** (8.0 / 3.0)
    T = int(t_end * FS)
    ts = jnp.arange(1, T + 1) / FS
    tau = tc - ts
    true_f = k * tau ** (-0.375)
    # phase = 2 pi \int f dt = -2 pi k (8/5) tau^{5/8} + const
    phase = -2.0 * math.pi * k * 1.6 * tau ** 0.625
    amp = (true_f / f0) ** (2.0 / 3.0)
    clean = amp * jnp.sin(phase - phase[0])

    k1, k2 = jax.random.split(jax.random.PRNGKey(0) if key is None else key)
    shift = int(round(shift_ms * 1e-3 * FS))
    ys_h = clean + noise_std * jax.random.normal(k1, (T,))
    # L: inverted and delayed copy of the same waveform + its own noise.
    clean_l = -jnp.roll(clean, shift).at[:shift].set(0.0)
    ys_l = clean_l + noise_std * jax.random.normal(k2, (T,))
    return [(ts, ys_h, true_f, 0), (ts, ys_l, true_f, shift)]


def run_reference_pipeline(records, out_dir):
    """Run the reference package's LIGO pipeline
    (``gw_freq_estimate.py:26-56``: GH-3 sgp_filter MLE via SciPy
    L-BFGS-B, sgp_smoother, order-10 gaussian_expectation of g(V)) on
    the given (name, ts, ys, true_f, shift) records."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from run_reference_regen import _install_shims, REFERENCE_ROOT
    _install_shims()
    sys.path.insert(0, REFERENCE_ROOT)

    import jax.numpy as jnp
    import jaxopt  # the shim
    from chirpgp.models import g, g_inv, build_chirp_model
    from chirpgp.filters_smoothers import sgp_filter, sgp_smoother
    from chirpgp.quadratures import gaussian_expectation, SigmaPoints
    from chirpgp.tools import rmse as ref_rmse

    sgps = SigmaPoints.gauss_hermite(d=4, order=3)
    Xi = 0.3
    init_theta = g_inv(jnp.array([0.1, 2.0, 0.5, 0.02, 40.0, 1.0]))
    results = {}
    for name, ts, ys, true_f, shift in records:
        ts = jnp.asarray(ts, jnp.float64)
        ys = jnp.asarray(ys, jnp.float64)
        dt = float(ts[1] - ts[0])

        def obj_func(theta):
            _, _, m_and_cov, m0, P0, H = build_chirp_model(g(theta))
            return sgp_filter(m_and_cov, sgps, H, Xi, m0, P0, dt,
                              ys)[-1][-1]

        solver = jaxopt.ScipyMinimize(method="L-BFGS-B", jit=True,
                                      fun=obj_func)
        opt_vals, opt_state = solver.run(init_theta)
        params = g(opt_vals)
        _, _, m_and_cov, m0, P0, H = build_chirp_model(params)
        mfs, Pfs, _ = sgp_filter(m_and_cov, sgps, H, Xi, m0, P0, dt, ys)
        mss, Pss = sgp_smoother(m_and_cov, sgps, mfs, Pfs, dt)
        if_mean = gaussian_expectation(
            ms=mss[:, 2], chol_Ps=jnp.sqrt(Pss[:, 2, 2]), func=g,
            force_shape=True)[:, 0]
        print(f"[ref {name}] converged={opt_state.success} "
              f"params={np.round(np.asarray(params), 4)}")
        results[f"{name}_if_mean"] = np.asarray(if_mean)
        results[f"{name}_params"] = np.asarray(params)
        results[f"{name}_ts"] = np.asarray(ts)
        if true_f is not None:
            lo = max(len(np.asarray(ts)) // 4, shift + 50)
            tf_aligned = np.roll(np.asarray(true_f), shift)
            err = float(ref_rmse(jnp.asarray(tf_aligned[lo:]),
                                 if_mean[lo:]))
            print(f"[ref {name}] in-band IF RMSE {err:.2f} Hz")
            results[f"{name}_rmse_hz"] = err
    path = os.path.join(out_dir, "ligo_reference.npz")
    np.savez(path, **results)
    print(f"saved {path}")

    # Side-by-side if the repo run exists.
    repo_path = os.path.join(out_dir, "ligo_synthetic.npz")
    if os.path.exists(repo_path):
        repo = np.load(repo_path)
        for name, *_ in records:
            k = f"{name}_if_mean"
            if k in repo:
                a, b = repo[k], results[k]
                lo = len(a) // 4
                d = float(np.sqrt(np.mean((a[lo:] - b[lo:]) ** 2)))
                print(f"[{name}] repo-vs-reference IF track RMS "
                      f"difference (post burn-in): {d:.3f} Hz")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", action="store_true",
                    help="run the reference package's pipeline on the "
                         "same synthetic records (parity)")
    ap.add_argument("--data", nargs="+", default=None,
                    help="real strain txt files (time, strain); if "
                         "omitted, the synthetic GW150914-like event is "
                         "used")
    ap.add_argument("--out", default="./results")
    ap.add_argument("--plot", default=None)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from chirpgp_tpu.apps import analyze_ligo, load_ligo_strain
    from chirpgp_tpu.utils import rmse

    os.makedirs(args.out, exist_ok=True)

    if args.reference:
        records = [(name, ts, ys, tf, shift)
                   for name, (ts, ys, tf, shift) in zip(
                       ("H_synth", "L_synth"), synth_gw150914(None))]
        run_reference_pipeline(records, args.out)
        return

    results = {}
    records = []
    if args.data:
        for path, (ts, ys) in zip(args.data, load_ligo_strain(args.data)):
            records.append((path, ts, ys, None, 0))
    else:
        for name, (ts, ys, tf, shift) in zip(
                ("H_synth", "L_synth"), synth_gw150914(None)):
            records.append((name, ts, ys, tf, shift))

    for name, ts, ys, true_f, shift in records:
        opt, params, est = analyze_ligo(ts, ys)
        if_mean = np.asarray(est["if_mean"])
        print(f"[{name}] converged={bool(opt.success)} "
              f"iters={int(opt.num_iters)} "
              f"params={np.round(np.asarray(params), 4)}")
        print(f"[{name}] IF range {if_mean.min():.1f}..{if_mean.max():.1f} Hz")
        results[f"{name}_if_mean"] = if_mean
        results[f"{name}_if_lower"] = np.asarray(est["if_lower"])
        results[f"{name}_if_upper"] = np.asarray(est["if_upper"])
        results[f"{name}_params"] = np.asarray(params)
        results[f"{name}_ts"] = np.asarray(ts)
        if true_f is not None:
            # Score only the settled, aligned segment: skip the filter
            # burn-in quarter and (for L) the shifted head.
            lo = max(len(ts) // 4, shift + 50)
            tf_aligned = np.roll(np.asarray(true_f), shift)
            err = float(rmse(jnp.asarray(tf_aligned[lo:]),
                             jnp.asarray(if_mean[lo:])))
            rel = err / float(np.mean(tf_aligned[lo:]))
            print(f"[{name}] in-band IF RMSE {err:.2f} Hz "
                  f"({100 * rel:.1f}% of mean IF)")
            results[f"{name}_true_f"] = tf_aligned
            results[f"{name}_rmse_hz"] = err

    path = os.path.join(args.out, "ligo_synthetic.npz"
                        if not args.data else "ligo_real.npz")
    np.savez(path, **results)
    print(f"saved {path}")

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        names = [r[0] for r in records]
        fig, axes = plt.subplots(len(names), 1,
                                 figsize=(8, 3 * len(names)),
                                 squeeze=False)
        for ax_row, name in zip(axes, names):
            ax = ax_row[0]
            ts = results[f"{name}_ts"]
            ax.plot(ts, results[f"{name}_if_mean"], "k",
                    label="posterior IF")
            ax.fill_between(ts, results[f"{name}_if_lower"],
                            results[f"{name}_if_upper"], alpha=0.2,
                            color="k", label="95% band")
            if f"{name}_true_f" in results:
                ax.plot(ts, results[f"{name}_true_f"], "r--",
                        label="true IF")
            ax.set_ylabel("IF (Hz)")
            ax.set_title(name)
            ax.legend(fontsize=8)
        axes[-1][0].set_xlabel("time (s)")
        fig.tight_layout()
        fig.savefig(args.plot, dpi=130)
        print(f"wrote {args.plot}")


if __name__ == "__main__":
    main()
