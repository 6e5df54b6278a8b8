"""Tests for the JAX-native FHC-class harmonic-chirp NLS estimator and
the Butterworth prefilter."""

import math

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt

from chirpgp_tpu.baselines import (
    harmonic_chirp_nls, fhc_pitch_track, butter_lowpass, hilbert_method)
from chirpgp_tpu.toymodels import (
    gen_chirp, gen_harmonic_chirp, constant_mag, affine_freq)

FS = 1000.0


def test_harmonic_chirp_nls_linear_chirp():
    """Recovers (w, alpha) of a clean linear harmonic chirp."""
    N = 400
    n = jnp.arange(N)
    f0, rate = 10.0, 8.0          # Hz, Hz/s
    w_true = 2 * math.pi * f0 / FS
    a_true = 2 * math.pi * rate / FS ** 2
    phase = w_true * n + 0.5 * a_true * n ** 2
    y = jnp.sin(phase) + 0.5 * jnp.sin(2 * phase + 0.2)
    w, a = harmonic_chirp_nls(y, 2, (2 * math.pi * 5 / FS,
                                     2 * math.pi * 20 / FS),
                              (-2 * math.pi * 20 / FS ** 2,
                               2 * math.pi * 20 / FS ** 2))
    npt.assert_allclose(float(w), w_true, rtol=2e-2)
    npt.assert_allclose(float(a), a_true, rtol=0.3, atol=2e-7)


@pytest.mark.slow
def test_fhc_pitch_track_affine_if():
    """Tracks an affine IF on a 2-harmonic chirp."""
    dt, T = 1e-3, 2500
    ts = jnp.linspace(dt, dt * T, T)
    freq, phase = affine_freq(2.0, 8.0)      # 8 -> 13 Hz
    ys = gen_harmonic_chirp(ts, [constant_mag(1.0), constant_mag(0.5)],
                            phase)
    times, f0s = fhc_pitch_track(np.asarray(ys), FS, 2,
                                 window_length=300, window_overlap=250,
                                 f0_bounds_hz=(4.0, 20.0),
                                 max_chirp_rate_hz_s=10.0)
    true_if = 2.0 * times + 8.0
    err = np.abs(f0s - true_if)
    assert np.median(err) < 0.5, np.median(err)


def test_butter_prefilter_improves_hilbert():
    """The reference demos prefilter before Hilbert; check the prefilter
    reduces noisy-IF error on a tone."""
    dt, T = 1e-3, 3000
    ts = jnp.linspace(dt, dt * T, T)
    _, phase = affine_freq(0.0, 12.0)
    key = jax.random.PRNGKey(0)
    ys = gen_chirp(ts, constant_mag(1.0), phase) \
        + 0.3 * jax.random.normal(key, (T,))
    raw = hilbert_method(ts, ys)
    filt = hilbert_method(ts, butter_lowpass(ys, 30.0, FS))
    err_raw = float(jnp.mean(jnp.abs(raw[200:-200] - 12.0)))
    err_filt = float(jnp.mean(jnp.abs(filt[200:-200] - 12.0)))
    assert err_filt < 0.5 * err_raw, (err_filt, err_raw)
