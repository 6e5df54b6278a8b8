"""Pallas fused filter kernel: interpret-mode equivalence with the
batched XLA kernels (the kernel's Mosaic compile path is exercised on
TPU only; see the module docstring)."""

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt

from chirpgp_tpu.infer.batched import sqrt_sgp_filter_batched
from chirpgp_tpu.models import build_chirp_model, g, g_inv
from chirpgp_tpu.experimental.pallas_filter import ghfs_chirp_filter_pallas
from chirpgp_tpu.quad import gauss_hermite


def test_pallas_filter_matches_batched_interpret():
    params_np = np.asarray(
        g(g_inv(jnp.array([0.1, 0.1, 0.1, 1.0, 1.0, 7.0]))), np.float64)
    pack = build_chirp_model(jnp.asarray(params_np, jnp.float32))
    rule = gauss_hermite(4, 3)
    B, T = 4, 32
    yss = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (B, T),
                                  dtype=jnp.float32)
    mfs_p, lfs_p, nll_p = ghfs_chirp_filter_pallas(
        params_np, 0.1, 1e-3, rule, yss, chunk=8, interpret=True)
    mfs_b, lfs_b, nll_b = sqrt_sgp_filter_batched(
        pack.m_and_cov, rule, pack.H.astype(jnp.float32), jnp.float32(0.1),
        pack.m0.astype(jnp.float32), pack.P0.astype(jnp.float32),
        jnp.float32(1e-3), yss)
    npt.assert_allclose(np.asarray(mfs_p), np.asarray(mfs_b), atol=5e-5)
    npt.assert_allclose(np.asarray(nll_p), np.asarray(nll_b), atol=5e-5)
    Pp = jnp.einsum("tikb,tjkb->tijb", lfs_p, lfs_p)
    Pb = jnp.einsum("tikb,tjkb->tijb", lfs_b, lfs_b)
    npt.assert_allclose(np.asarray(Pp), np.asarray(Pb), atol=1e-4)


def test_pallas_chunking_invariance():
    """Different chunk sizes give identical results (carry persists in
    scratch across grid steps)."""
    params_np = (0.1, 0.1, 0.1, 1.0, 1.0, 7.0)
    rule = gauss_hermite(4, 2)
    B, T = 2, 16
    yss = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (B, T),
                                  dtype=jnp.float32)
    out1 = ghfs_chirp_filter_pallas(params_np, 0.1, 1e-3, rule, yss,
                                    chunk=16, interpret=True)
    out2 = ghfs_chirp_filter_pallas(params_np, 0.1, 1e-3, rule, yss,
                                    chunk=4, interpret=True)
    npt.assert_allclose(np.asarray(out1[0]), np.asarray(out2[0]),
                        atol=1e-6)
    npt.assert_allclose(np.asarray(out1[2]), np.asarray(out2[2]),
                        atol=1e-6)
