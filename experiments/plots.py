"""Paper-figure reproductions (reference ``paper_plots_tables/``):
chirp-SDE sample paths, harmonic-SDE covariance surfaces, conditional
chirp covariances, and IF-estimation overlays.

All figures save to PNG (Agg backend; no display needed).

Usage:
    python experiments/plots.py --which samples cov cond_cov estimation
"""

# Allow running straight from a source checkout (no pip install).
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import math
import os


def plot_chirp_samples(outdir):
    """Sample paths of the chirp SDE prior (ref plot_chirp_samples.py)."""
    import jax
    import jax.numpy as jnp
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from chirpgp_tpu.models import model_chirp, disc_chirp_lcd, g
    from chirpgp_tpu.utils import simulate_sde

    lam, b, ell, sigma, delta = 0.1, 0.3, 1.0, 1.0, 0.1
    _, _, m0, P0, _ = model_chirp(lam, b, ell, sigma, delta)
    trans = disc_chirp_lcd(lam, b, ell, sigma)
    dt, T = 1e-3, 3000
    ts = np.arange(1, T + 1) * dt
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    fig, axes = plt.subplots(2, 1, figsize=(8, 6), sharex=True)
    for k in keys:
        traj = simulate_sde(trans, m0, P0, dt, T, k)
        axes[0].plot(ts, np.asarray(traj[:, 1]), lw=0.8)
        axes[1].plot(ts, np.asarray(g(traj[:, 2])), lw=0.8)
    axes[0].set_ylabel("chirp X2(t)")
    axes[1].set_ylabel("IF g(V(t)) [Hz]")
    axes[1].set_xlabel("t [s]")
    path = os.path.join(outdir, "chirp_samples.png")
    fig.savefig(path, dpi=130)
    plt.close(fig)
    print("wrote", path)


def plot_cov_harmonic(outdir):
    """Closed-form harmonic-SDE covariance surface (ref
    plot_cov_harmonic_sde.py)."""
    import jax.numpy as jnp
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from chirpgp_tpu.models.cov_funcs import vmap_cov_harmonic_sde

    ts = jnp.linspace(0.01, 2.0, 80)
    cov0 = 0.1 * jnp.eye(2)
    surf = vmap_cov_harmonic_sde(ts, ts, cov0, 2.0, 0.3, 0.5)
    fig, ax = plt.subplots(figsize=(6, 5))
    im = ax.imshow(np.asarray(surf[:, :, 1, 1]), origin="lower",
                   extent=[0.01, 2.0, 0.01, 2.0], cmap="RdBu_r")
    fig.colorbar(im, ax=ax, label="Cov[X2(t1), X2(t2)]")
    ax.set_xlabel("t1 [s]")
    ax.set_ylabel("t2 [s]")
    path = os.path.join(outdir, "cov_harmonic_sde.png")
    fig.savefig(path, dpi=130)
    plt.close(fig)
    print("wrote", path)


def plot_cond_cov_chirp(outdir):
    """Monte-Carlo conditional covariance of the chirp SDE given a V path
    (ref plot_cov_chirp_sde_cond_v.py)."""
    import jax
    import jax.numpy as jnp
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from chirpgp_tpu.models.cov_funcs import approx_cond_cov_chirp_sde

    ts = jnp.linspace(0.01, 1.0, 100)
    vs, surf = approx_cond_cov_chirp_sde(ts, 0.2, 0.3, 1.0, 1.0, 0.1,
                                         num_mcs=2000,
                                         key=jax.random.PRNGKey(1))
    fig, axes = plt.subplots(1, 2, figsize=(11, 4))
    axes[0].plot(np.asarray(ts), np.asarray(vs[:, 0]))
    axes[0].set_title("conditioning V path")
    im = axes[1].imshow(np.asarray(surf[:, :, 1, 1]), origin="lower",
                        cmap="RdBu_r")
    fig.colorbar(im, ax=axes[1])
    axes[1].set_title("MC Cov[X2(t1), X2(t2) | V]")
    path = os.path.join(outdir, "cond_cov_chirp_sde.png")
    fig.savefig(path, dpi=130)
    plt.close(fig)
    print("wrote", path)


def plot_estimation(outdir):
    """IF-estimation overlay on the canonical toymodel (ref
    plot_estimation.py), fixed default params for speed."""
    import jax
    import jax.numpy as jnp
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from chirpgp_tpu.apps import IFEstimationConfig, estimate_if
    from chirpgp_tpu.models import g
    from chirpgp_tpu.toymodels import gen_chirp, constant_mag, meow_freq

    dt, T, Xi = 1e-3, 3141, 0.1
    ts = jnp.linspace(dt, dt * T, T)
    freq_func, phase_func = meow_freq(offset=8.0)
    key = jax.random.PRNGKey(555)
    ys = gen_chirp(ts, constant_mag(1.0), phase_func) \
        + math.sqrt(Xi) * jax.random.normal(key, (T,))
    cfg = IFEstimationConfig(dt=dt, Xi=Xi, method="ghfs")
    est = estimate_if(cfg, g(cfg.default_init_theta()), ys)

    fig, ax = plt.subplots(figsize=(8, 4))
    ax.plot(np.asarray(ts), np.asarray(freq_func(ts)), "--",
            label="true IF")
    ax.plot(np.asarray(ts), np.asarray(est["if_mean"]), "k",
            label="posterior mean")
    ax.fill_between(np.asarray(ts), np.asarray(est["if_lower"]),
                    np.asarray(est["if_upper"]), color="k", alpha=0.15,
                    edgecolor="none")
    ax.legend()
    ax.set_xlabel("t [s]")
    ax.set_ylabel("IF [Hz]")
    path = os.path.join(outdir, "estimation.png")
    fig.savefig(path, dpi=130)
    plt.close(fig)
    print("wrote", path)


def plot_estimation_harmonic(outdir):
    """Harmonic-chirp (K=3) IF-estimation overlay (ref
    plot_estimation_harmonic.py): cubature filter/smoother on a
    3-harmonic toymodel chirp, fixed default params."""
    import jax
    import jax.numpy as jnp
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from chirpgp_tpu.apps import IFEstimationConfig, estimate_if
    from chirpgp_tpu.models import g
    from chirpgp_tpu.toymodels import (
        gen_harmonic_chirp, constant_mag, meow_freq)

    dt, T, Xi, K = 1e-3, 3141, 0.1, 3
    ts = jnp.linspace(dt, dt * T, T)
    freq_func, phase_func = meow_freq(offset=8.0)
    key = jax.random.PRNGKey(555)
    mags = [constant_mag(1.0 / (k + 1)) for k in range(K)]
    ys = gen_harmonic_chirp(ts, mags, phase_func) \
        + math.sqrt(Xi) * jax.random.normal(key, (T,))
    cfg = IFEstimationConfig(dt=dt, Xi=Xi, method="ghfs", model="harmonic",
                             num_harmonics=K, quadrature="cubature")
    est = estimate_if(cfg, g(cfg.default_init_theta()), ys)

    fig, ax = plt.subplots(figsize=(8, 4))
    ax.plot(np.asarray(ts), np.asarray(freq_func(ts)), "--",
            label="true fundamental IF")
    ax.plot(np.asarray(ts), np.asarray(est["if_mean"]), "k",
            label="posterior mean")
    ax.fill_between(np.asarray(ts), np.asarray(est["if_lower"]),
                    np.asarray(est["if_upper"]), color="k", alpha=0.15,
                    edgecolor="none")
    ax.legend()
    ax.set_xlabel("t [s]")
    ax.set_ylabel("IF [Hz]")
    path = os.path.join(outdir, "estimation_harmonic.png")
    fig.savefig(path, dpi=130)
    plt.close(fig)
    print("wrote", path)


PLOTS = {
    "samples": plot_chirp_samples,
    "cov": plot_cov_harmonic,
    "cond_cov": plot_cond_cov_chirp,
    "estimation": plot_estimation,
    "estimation_harmonic": plot_estimation_harmonic,
    "crlb": lambda outdir: plot_crlb(outdir),
    "crlb_ghf": lambda outdir: plot_crlb(outdir, method="ghf"),
    "crlb_ekf": lambda outdir: plot_crlb(outdir, method="ekf"),
    "crlb_both": lambda outdir: plot_crlb_both(outdir),
}


def plot_crlb_both(outdir, results_dir="./results"):
    """GHF and EKF filter MSE overlaid against the PCRLB per (lam, b)
    grid point -- the reference's Fig 5 comparison shape
    (``tetralith/run_crlbs.sh:1-8`` runs BOTH ``crlb_ekf.py`` and
    ``crlb_ghf.py`` over the same grid)."""
    import glob
    import re

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    files = sorted(glob.glob(
        os.path.join(results_dir, "crlb_ghf_lam*_b*.npz")))
    if not files:
        print(f"no crlb_ghf_*.npz in {results_dir}")
        return
    lams = sorted({float(re.search(r"lam([\d.]+)_", f).group(1))
                   for f in files})
    bs = sorted({float(re.search(r"_b([\d.]+)\.npz", f).group(1))
                 for f in files})
    fig, axes = plt.subplots(len(lams), len(bs),
                             figsize=(3.2 * len(bs), 2.6 * len(lams)),
                             sharex=True, squeeze=False)
    for i, lam in enumerate(lams):
        for j, b in enumerate(bs):
            ax = axes[i][j]
            any_drawn = False
            for method, color in (("ghf", "k"), ("ekf", "C0")):
                path = os.path.join(
                    results_dir, f"crlb_{method}_lam{lam}_b{b}.npz")
                if not os.path.exists(path):
                    continue
                d = np.load(path)
                T = len(d["mean_err_v"])
                ts = np.arange(1, T + 1) * (
                    float(d["dt"]) if "dt" in d else 0.01)
                ax.semilogy(ts, d["mean_err_v"], color,
                            label=f"{method.upper()} MSE (V)")
                if not any_drawn and "pcrlb_v" in d:
                    ax.semilogy(ts, d["pcrlb_v"], "r--",
                                label="PCRLB (V)")
                any_drawn = True
            if not any_drawn:
                ax.axis("off")
                continue
            ax.set_title(f"$\\lambda$={lam}, b={b}", fontsize=9)
            if i == len(lams) - 1:
                ax.set_xlabel("t (s)")
            if j == 0:
                ax.set_ylabel("MSE")
    axes[0][0].legend(fontsize=7)
    fig.tight_layout()
    out = os.path.join(outdir, "crlb_ghf_ekf.png")
    fig.savefig(out, dpi=130)
    print(f"wrote {out}")


def plot_crlb(outdir, results_dir="./results", method="ekf"):
    """Filter MSE vs time against the PCRLB over the (lam, b) grid
    (paper Fig 5; reference jobs ``tetralith/jobs/crlb_{ekf,ghf}.py`` +
    ``run_crlbs.sh:1-8``).  Reads the ``crlb_{method}_lam*_b*.npz``
    files produced by ``experiments/run_crlb.py``."""
    import glob
    import re

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    files = sorted(glob.glob(
        os.path.join(results_dir, f"crlb_{method}_lam*_b*.npz")))
    if not files:
        print(f"no crlb_{method}_*.npz in {results_dir}; run "
              "experiments/run_crlb.py first")
        return
    lams = sorted({float(re.search(r"lam([\d.]+)_", f).group(1))
                   for f in files})
    bs = sorted({float(re.search(r"_b([\d.]+)\.npz", f).group(1))
                 for f in files})
    fig, axes = plt.subplots(len(lams), len(bs),
                             figsize=(3.2 * len(bs), 2.6 * len(lams)),
                             sharex=True, squeeze=False)
    for i, lam in enumerate(lams):
        for j, b in enumerate(bs):
            ax = axes[i][j]
            path = os.path.join(results_dir,
                                f"crlb_{method}_lam{lam}_b{b}.npz")
            if not os.path.exists(path):
                ax.axis("off")
                continue
            d = np.load(path)
            T = len(d["mean_err_v"])
            ts = (np.arange(1, T + 1) *
                  float(d["dt"]) if "dt" in d else
                  np.arange(1, T + 1) * 0.01)
            ax.semilogy(ts, d["mean_err_v"], "k",
                        label="filter MSE (V)")
            if "pcrlb_v" in d:
                ax.semilogy(ts, d["pcrlb_v"], "r--", label="PCRLB (V)")
            ax.set_title(f"$\\lambda$={lam}, b={b}", fontsize=9)
            if i == len(lams) - 1:
                ax.set_xlabel("t (s)")
            if j == 0:
                ax.set_ylabel("MSE")
    axes[0][0].legend(fontsize=7)
    fig.tight_layout()
    out = os.path.join(outdir, f"crlb_{method}.png")
    fig.savefig(out, dpi=130)
    print(f"wrote {out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", nargs="+", default=list(PLOTS),
                    choices=list(PLOTS))
    ap.add_argument("--out", default="./figures")
    ap.add_argument("--platform", default="cpu",
                    help="jax platform (default cpu; figures are small "
                         "workloads and the env may pin an accelerator)")
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    os.makedirs(args.out, exist_ok=True)
    for name in args.which:
        PLOTS[name](args.out)


if __name__ == "__main__":
    main()
