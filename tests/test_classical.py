"""Known-answer tests for the classical baselines (modeled on reference
``test/test_classical_methods.py``), plus checks of the JAX-native FFT
machinery against scipy."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt

from chirpgp_tpu.baselines import (
    hilbert_transform, hilbert_method, mean_power_spectrum, mle_polynomial,
    adaptive_notch_filter, tukey_window)
from chirpgp_tpu.toymodels import (
    gen_chirp, gen_chirp_envelope, constant_mag, affine_freq,
    polynomial_freq)


def test_hilbert_matches_scipy():
    import scipy.signal
    key = jax.random.PRNGKey(0)
    ys = jax.random.normal(key, (512,))
    ours = hilbert_transform(ys)
    theirs = scipy.signal.hilbert(np.asarray(ys))
    npt.assert_allclose(np.asarray(ours), theirs, atol=1e-10)


def test_hilbert_method_pure_tone():
    """Recovers a constant frequency from a clean tone (reference
    ``test_classical_methods.py``)."""
    dt, T = 1e-3, 2000
    ts = jnp.linspace(dt, dt * T, T)
    f0 = 20.0
    freq, phase = affine_freq(0.0, f0)
    ys = gen_chirp(ts, constant_mag(1.0), phase)
    est = hilbert_method(ts, ys)
    mid = est[200:-200]
    npt.assert_allclose(mid, f0, rtol=1e-2)


def test_tukey_matches_scipy():
    import scipy.signal
    ours = tukey_window(256, 0.25)
    theirs = scipy.signal.windows.tukey(256, 0.25)
    npt.assert_allclose(np.asarray(ours), theirs, atol=1e-12)


def test_spectrogram_matches_scipy_firstmoment():
    import scipy.signal
    dt, T = 1e-3, 4000
    ts = jnp.linspace(dt, dt * T, T)
    freq, phase = affine_freq(20.0, 30.0)
    key = jax.random.PRNGKey(1)
    ys = gen_chirp(ts, constant_mag(1.0), phase) \
        + 0.1 * jax.random.normal(key, (T,))
    fs = 1.0 / dt
    new_ts, est = mean_power_spectrum(ts, ys)
    freqs_s, ts_s, Sxx = scipy.signal.spectrogram(np.asarray(ys), float(fs))
    est_s = np.sum(freqs_s[:, None] * Sxx, axis=0) / np.sum(Sxx, axis=0)
    assert est.shape == est_s.shape
    npt.assert_allclose(np.asarray(est), est_s, rtol=1e-3)


def test_spectrogram_tracks_affine_chirp():
    dt, T = 1e-3, 4000
    ts = jnp.linspace(dt, dt * T, T)
    freq, phase = affine_freq(20.0, 30.0)
    ys = gen_chirp(ts, constant_mag(1.0), phase)
    new_ts, est = mean_power_spectrum(ts, ys)
    true_if = freq(new_ts)
    npt.assert_allclose(np.asarray(est), np.asarray(true_if), rtol=0.1)


def test_mle_polynomial_recovers_coeffs():
    """LM polynomial MLE recovers IF coefficients on clean data (reference
    ``test_classical_methods.py``)."""
    dt, T, Xi = 1e-3, 1000, 0.01
    ts = jnp.linspace(dt, dt * T, T)
    true_coeffs = [10.0, 4.0]
    freq, phase = polynomial_freq(true_coeffs)
    ys = gen_chirp(ts, constant_mag(1.0), phase)
    init = jnp.array([1.1, 9.5, 4.3])
    params, obj_vals = mle_polynomial(ts, ys, Xi, init,
                                      method="levenberg_marquardt")
    npt.assert_allclose(params[0], 1.0, rtol=1e-2)
    npt.assert_allclose(params[1:], jnp.asarray(true_coeffs), rtol=1e-2)


def test_anf_tracks_affine_if():
    """ANF tracks an affine IF on the complex envelope (reference
    ``test_classical_methods.py``; demo params ``demos/classical_methods/
    anf.py:35-37``)."""
    dt, T = 1e-3, 3000
    ts = jnp.linspace(dt, dt * T, T)
    freq, phase = affine_freq(10.0, 20.0)
    ys = gen_chirp_envelope(ts, constant_mag(1.0), phase)
    mu = 0.015
    gamma_w = mu ** 2 / 2
    gamma_alpha = mu * gamma_w / 4
    est, _, _ = adaptive_notch_filter(ts, ys, 0.0, 20.0, 0.1 + 0.0j,
                                      mu, gamma_alpha, gamma_w)
    tail = est[1500:]
    true_tail = freq(ts)[1500:]
    npt.assert_allclose(np.asarray(tail), np.asarray(true_tail), rtol=0.05)
