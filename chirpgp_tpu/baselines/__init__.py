"""Baseline IF estimators: classical signal-processing methods (JAX-native)
and the KPT Kalman pitch tracker (see ``chirpgp_tpu.models.kpt``)."""

from chirpgp_tpu.baselines.classical import (
    hilbert_transform, hilbert_method, mean_power_spectrum,
    mle_polynomial, mle_polynomial_batched, adaptive_notch_filter,
    tukey_window, butter_lowpass)
from chirpgp_tpu.baselines.fhc import harmonic_chirp_nls, fhc_pitch_track

__all__ = ["hilbert_transform", "hilbert_method", "mean_power_spectrum",
           "mle_polynomial", "mle_polynomial_batched",
           "adaptive_notch_filter", "tukey_window",
           "butter_lowpass", "harmonic_chirp_nls", "fhc_pitch_track"]
