"""Tests for the native C++ fast harmonic-NLS pitch estimator."""

import math

import numpy as np
import numpy.testing as npt
import pytest

from chirpgp_tpu.baselines.fastnls import (
    single_pitch, pitch_track, force_odd, median_smooth)


FS = 1000.0


def _harmonic_signal(N, f0, amps, noise=0.0, seed=0):
    n = np.arange(N)
    rng = np.random.default_rng(seed)
    y = sum(a * np.sin(2 * np.pi * (k + 1) * f0 / FS * n + 0.1 * k)
            for k, a in enumerate(amps))
    return y + noise * rng.standard_normal(N)


def test_pure_tone_recovery():
    N, f0 = 300, 10.0
    y = _harmonic_signal(N, f0, [1.0], noise=0.02)
    sp = single_pitch(N, 3, np.array([2.0 / FS, 30.0 / FS]))
    w = sp.est(y, eps=1e-7, method=1)
    npt.assert_allclose(w * FS / (2 * math.pi), f0, rtol=1e-2)
    assert sp.modelOrder() == 1


@pytest.mark.parametrize("order", [2, 3])
def test_harmonic_recovery_and_order(order):
    N, f0 = 400, 8.0
    amps = [1.0, 0.6, 0.4][:order]
    y = _harmonic_signal(N, f0, amps, noise=0.05)
    sp = single_pitch(N, 5, np.array([2.0 / FS, 30.0 / FS]))
    w = sp.est(y, eps=1e-7, method=1)
    npt.assert_allclose(w * FS / (2 * math.pi), f0, rtol=2e-2)
    assert sp.modelOrder() == order


def test_fast_and_exact_paths_agree():
    N, f0 = 300, 12.0
    y = _harmonic_signal(N, f0, [1.0, 0.5], noise=0.05, seed=1)
    sp = single_pitch(N, 5, np.array([2.0 / FS, 30.0 / FS]))
    w_exact = sp.est(y, eps=1e-7, method=1)
    w_fast = sp.est(y, eps=1e-7, method=0)
    npt.assert_allclose(w_exact, w_fast, rtol=1e-3)


def test_noise_only_gives_order_zero():
    rng = np.random.default_rng(2)
    y = rng.standard_normal(300)
    sp = single_pitch(300, 3, np.array([2.0 / FS, 30.0 / FS]))
    w = sp.est(y, lnBFZeroOrder=5.0, eps=1e-5)
    assert sp.modelOrder() == 0
    assert w == 0.0


def test_pitch_track_constant_tone():
    T, f0 = 2000, 9.0
    y = _harmonic_signal(T, f0, [1.0], noise=0.05, seed=3)
    times, f0s = pitch_track(y, FS, num_harmonics=1, window_length=300,
                             window_overlap=250)
    est = np.median(f0s)
    npt.assert_allclose(est, f0, rtol=2e-2)
    assert times.shape == f0s.shape


def test_median_smooth_and_force_odd():
    assert force_odd(4) == 5 and force_odd(5) == 5
    x = np.array([1.0, 9.0, 1.0, 1.0, 1.0])
    sm = median_smooth(x, 3)
    assert sm[1] == 1.0
