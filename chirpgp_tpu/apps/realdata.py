"""Real-data IF-estimation pipelines: bat echolocation calls and the
LIGO GW150914 chirp.

Reference behavior contracts:

- Bats (``real_applications/bats/{eptesicus_nilssonii,myotis_myotis}_
  analysis.py``): read wav, crop a window, standardize, run a harmonic
  chirp model with hand-set parameters (no MLE), cubature sigma points,
  ``freq_scale`` for numerical stability, overlay the IF posterior on a
  spectrogram.  Eptesicus: 5 harmonics, freq_scale=1e4, Xi=1e-3, params
  [0.2, 1, 1, 0.5, 5, 1]; Myotis: 4 harmonics, freq_scale=1e4, Xi=1e-4,
  params [0.1, 1, 1, 0.2, 10, 2]; both print filter+smoother wall time.
- LIGO (``real_applications/ligo/gw_freq_estimate.py``): strain txt data,
  Xi=0.3, GH d=4 order 3, MLE from init g^{-1}([0.1, 2, 0.5, 0.02, 40, 1]).

The wav/strain files are not vendored (same as the reference's wav data);
loaders accept explicit paths.
"""

import dataclasses
import time
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from chirpgp_tpu.apps.pipeline import IFEstimationConfig, estimate_if, fit_mle
from chirpgp_tpu.models import g, g_inv

__all__ = ["BatCallConfig", "EPTESICUS", "MYOTIS", "analyze_bat_call",
           "ligo_config", "analyze_ligo", "standardize", "load_wav",
           "load_ligo_strain"]


def standardize(ys: jnp.ndarray) -> jnp.ndarray:
    """Zero-mean unit-variance normalization (reference
    ``myotis_myotis_analysis.py:47``)."""
    return (ys - jnp.mean(ys)) / jnp.std(ys)


def load_wav(path: str, crop: Optional[Tuple[int, int]] = None):
    """Load a mono wav file; returns (fs, ys float array)."""
    from scipy.io import wavfile
    fs, data = wavfile.read(path)
    ys = np.asarray(data, dtype=np.float64)
    if ys.ndim > 1:
        ys = ys[:, 0]
    if crop is not None:
        ys = ys[crop[0]:crop[1]]
    return fs, jnp.asarray(ys)


def load_ligo_strain(paths: Sequence[str]):
    """Load LIGO strain txt files (time, strain columns); returns a list of
    (ts, ys) arrays (reference ``gw_freq_estimate.py:16-24``)."""
    out = []
    for p in paths:
        arr = np.loadtxt(p)
        out.append((jnp.asarray(arr[:, 0]), jnp.asarray(arr[:, 1])))
    return out


@dataclasses.dataclass(frozen=True)
class BatCallConfig:
    """Hand-set (no-MLE) harmonic analysis configuration for one species."""
    num_harmonics: int
    freq_scale: float
    Xi: float
    params: Tuple[float, ...]        # [lam, b, delta, ell, sigma, m0_v]


EPTESICUS = BatCallConfig(num_harmonics=5, freq_scale=1e4, Xi=1e-3,
                          params=(0.2, 1.0, 1.0, 0.5, 5.0, 1.0))
MYOTIS = BatCallConfig(num_harmonics=4, freq_scale=1e4, Xi=1e-4,
                       params=(0.1, 1.0, 1.0, 0.2, 10.0, 2.0))


def analyze_bat_call(ys: jnp.ndarray, fs: float, bat: BatCallConfig,
                     form: str = "cov", time_it: bool = False):
    """Filter+smooth a standardized bat call with fixed hand-set params
    (reference ``myotis_myotis_analysis.py:59-88``).

    Returns the estimate dict (IF posterior in Hz) and, when ``time_it``,
    the post-warm-up filter+smoother wall time in seconds (the reference's
    printed metric, ``myotis_myotis_analysis.py:81-85``).
    """
    dt = 1.0 / fs
    cfg = IFEstimationConfig(
        dt=dt, Xi=bat.Xi, method="ghfs", model="harmonic",
        num_harmonics=bat.num_harmonics, freq_scale=bat.freq_scale,
        quadrature="cubature", form=form)
    params = jnp.asarray(bat.params, dtype=ys.dtype)
    run = jax.jit(lambda y: estimate_if(cfg, params, y))
    if time_it:
        # Warm up at the FULL shape: jit specializes on shapes, so a
        # short-prefix warm-up call would leave the compile inside the
        # timed region (the reference warms with the same call it then
        # times, ``myotis_myotis_analysis.py:79-85``).
        warm = run(ys)
        jax.block_until_ready(warm["if_mean"])
        t0 = time.perf_counter()
        est = run(ys)
        jax.block_until_ready(est["if_mean"])
        return est, time.perf_counter() - t0
    return run(ys), None


def ligo_config(dt: float) -> Tuple[IFEstimationConfig, jnp.ndarray]:
    """LIGO pipeline config + init theta (reference
    ``gw_freq_estimate.py:26-32``)."""
    cfg = IFEstimationConfig(dt=dt, Xi=0.3, method="ghfs", model="chirp",
                             gh_order=3)
    init_theta = g_inv(jnp.array([0.1, 2.0, 0.5, 0.02, 40.0, 1.0]))
    return cfg, init_theta


def analyze_ligo(ts: jnp.ndarray, ys: jnp.ndarray):
    """MLE + IF posterior on one LIGO strain record."""
    dt = float(ts[1] - ts[0])
    cfg, init_theta = ligo_config(dt)
    ys = standardize(ys)
    opt = fit_mle(cfg, ys, init_theta)
    params = g(opt.params)
    est = estimate_if(cfg, params, ys)
    return opt, params, est
