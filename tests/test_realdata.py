"""Real-data pipeline tests on synthetic stand-ins (the wav/strain files
are not vendored, matching the reference's data policy)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt

from chirpgp_tpu.apps import (
    EPTESICUS, MYOTIS, analyze_bat_call, analyze_ligo, standardize)
from chirpgp_tpu.toymodels import gen_harmonic_chirp, constant_mag


def test_standardize():
    ys = jnp.array([1.0, 2.0, 3.0, 4.0])
    z = standardize(ys)
    npt.assert_allclose(float(jnp.mean(z)), 0.0, atol=1e-12)
    npt.assert_allclose(float(jnp.std(z)), 1.0, rtol=1e-12)


def test_bat_pipeline_synthetic_call():
    """A synthetic 4-harmonic downward-sweeping call through the Myotis
    config: finite IF posterior in a plausible range, wall time
    reported."""
    fs = 250_000.0
    T = 2000
    ts = jnp.arange(1, T + 1) / fs
    # IF sweeping 80 kHz -> 40 kHz (linear), 4 harmonics.
    f0, f1 = 80e3, 40e3
    rate = (f1 - f0) / (T / fs)
    phase = lambda t: f0 * t + 0.5 * rate * t ** 2
    ys = gen_harmonic_chirp(ts, [constant_mag(1.0 / (k + 1))
                                 for k in range(4)], phase)
    ys = standardize(ys + 0.01 * jax.random.normal(
        jax.random.PRNGKey(0), (T,)))

    est, wall = analyze_bat_call(ys, fs, MYOTIS, time_it=True)
    assert wall is not None and wall > 0
    if_mean = np.asarray(est["if_mean"])
    assert np.all(np.isfinite(if_mean))
    # Posterior IF should live at ultrasonic scale (freq_scale=1e4).
    mid = if_mean[500:1500]
    assert 10e3 < np.median(mid) < 300e3, np.median(mid)


def test_ligo_pipeline_synthetic_chirp():
    """A synthetic GW-like up-chirp through the LIGO config: the MLE runs
    and the IF posterior is finite and increasing on average."""
    fs = 4096.0
    T = 700
    ts = jnp.arange(1, T + 1) / fs
    f0, rate = 40.0, 500.0      # Hz, Hz/s
    phase = 2 * math.pi * (f0 * ts + 0.5 * rate * ts ** 2)
    ys = jnp.sin(phase) + 0.3 * jax.random.normal(
        jax.random.PRNGKey(1), (T,))

    opt, params, est = analyze_ligo(ts, ys)
    if_mean = np.asarray(est["if_mean"])
    assert np.all(np.isfinite(if_mean))
    # Rising IF: late-window median above early-window median.
    assert np.median(if_mean[-200:]) > np.median(if_mean[:200])
