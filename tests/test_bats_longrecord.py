"""Regression pin for the bats production path (r5).

The reference's only published real-data timing contract is the Myotis
analysis (``real_applications/bats/myotis_myotis_analysis.py:59-88``):
harmonic model, 4 harmonics, d=10 cubature, fixed hand-set params,
freq_scale=1e4, Xi=1e-4.  ``results/longrecord_timing.md`` records the
full synthetic-analog run on TPU (cov form: 3.55 s / 1.7 Hz IF RMS);
this test pins the same configuration's f32 ACCURACY on CPU at a
faithful sweep rate (first half of the same record, onset included --
the filter locks on during the rising envelope edge), so a numerical
regression in the d=10 harmonic cov path cannot land silently.

The sqrt form is intentionally NOT pinned here: it has a documented f32
accuracy cliff on this extreme config (huge hand-set prior V-std x
freq_scale=1e4; correct at f64 -- see longrecord_timing.md findings).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chirpgp_tpu.apps import MYOTIS
from chirpgp_tpu.apps.pipeline import IFEstimationConfig, estimate_if


@pytest.fixture
def f32_mode():
    """The suite runs x64 (conftest); this pin is specifically about
    f32 behavior, so disable x64 for the duration of the test."""
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", False)
    yield
    jax.config.update("jax_enable_x64", old)


@pytest.mark.slow
def test_myotis_analog_cov_f32_tracks_fundamental(f32_mode):
    fs = 250000.0
    dt = 1.0 / fs
    T_full, T_crop = 25334, 12000
    ts = np.arange(T_full) * dt
    dur = T_full * dt
    f0, f1 = 60e3, 25e3
    freq = f0 + (f1 - f0) * ts / dur
    phase = np.cumsum(freq) * dt
    env = np.exp(-0.5 * ((ts - dur / 2) / (dur / 5)) ** 2)
    sig = sum((0.6 ** (k - 1)) * np.sin(2 * np.pi * k * phase)
              for k in range(1, MYOTIS.num_harmonics + 1))
    ys = env * sig + 0.01 * np.random.default_rng(0).standard_normal(T_full)
    ys_c = ys[:T_crop]
    ys_c = (ys_c - ys_c.mean()) / ys_c.std()
    core = env[:T_crop] > 0.5

    cfg = IFEstimationConfig(
        dt=dt, Xi=MYOTIS.Xi, method="ghfs", model="harmonic",
        num_harmonics=MYOTIS.num_harmonics, freq_scale=MYOTIS.freq_scale,
        quadrature="cubature", form="cov")
    params = jnp.asarray(MYOTIS.params, jnp.float32)
    est = jax.jit(lambda y: estimate_if(cfg, params, y))(
        jnp.asarray(ys_c, jnp.float32))
    ifm = np.asarray(est["if_mean"])
    assert np.isfinite(ifm).all()
    rms = float(np.sqrt(np.mean((ifm[core] - freq[:T_crop][core]) ** 2)))
    # Measured 1.7 Hz (CPU f32 and TPU f32 agree); 50 Hz leaves ~30x
    # headroom while still catching any real numerical break (the
    # failure modes observed are in the tens of kHz).
    assert rms < 50.0, f"IF-track RMS {rms:.1f} Hz"
