"""Tests for the from-scratch NUTS sampler and the bootstrap particle
filter: known-answer targets (Gaussian moments; KF oracle on LGSSMs) and
sharded-chain execution on the CPU mesh."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt

from chirpgp_tpu.infer import kf
from chirpgp_tpu.infer.nuts import nuts_sample, nuts_sample_sharded
from chirpgp_tpu.infer.smc import (
    bootstrap_filter, bootstrap_filter_sharded, systematic_resample,
    effective_sample_size)
from chirpgp_tpu.models import m32_solution, stationary_cov_m32, disc_m32
from chirpgp_tpu.parallel import make_mesh
from chirpgp_tpu.utils import simulate_lgssm


def test_nuts_gaussian_moments():
    """NUTS recovers the moments of a correlated 2-D Gaussian."""
    cov = jnp.array([[1.0, 0.7], [0.7, 2.0]])
    prec = jnp.linalg.inv(cov)

    def logdensity(q):
        return -0.5 * q @ prec @ q

    res = nuts_sample(logdensity, jnp.zeros(2), jax.random.PRNGKey(0),
                      num_samples=4000, num_warmup=800, step_size=0.5,
                      max_tree_depth=6)
    samples = np.asarray(res.samples)
    assert float(jnp.mean(res.accept_prob)) > 0.6
    assert int(res.num_divergent) == 0
    npt.assert_allclose(samples.mean(axis=0), [0.0, 0.0], atol=0.15)
    npt.assert_allclose(np.cov(samples.T), np.asarray(cov), atol=0.35)


def test_nuts_banana_runs_finite():
    """NUTS survives a non-Gaussian (banana) target."""

    def logdensity(q):
        x, y = q[0], q[1]
        return -0.5 * (x ** 2 / 4.0 + (y - x ** 2 / 4.0) ** 2)

    res = nuts_sample(logdensity, jnp.array([0.1, 0.1]),
                      jax.random.PRNGKey(1), num_samples=500,
                      num_warmup=300, max_tree_depth=6)
    assert bool(jnp.all(jnp.isfinite(res.samples)))
    assert float(jnp.mean(res.accept_prob)) > 0.5


def test_nuts_sharded_chains():
    """Sharded multi-chain NUTS runs on the 8-device mesh and every chain
    targets the same distribution."""
    mesh = make_mesh()
    n_chains = 8

    def logdensity(q):
        return -0.5 * jnp.sum(q ** 2)

    inits = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (n_chains, 2))
    keys = jax.random.split(jax.random.PRNGKey(3), n_chains)
    res = nuts_sample_sharded(logdensity, inits, keys, mesh,
                              num_samples=800, num_warmup=300,
                              max_tree_depth=5)
    samples = np.asarray(jax.device_get(res.samples))   # (8, 800, 2)
    assert samples.shape == (n_chains, 800, 2)
    pooled = samples.reshape(-1, 2)
    npt.assert_allclose(pooled.mean(axis=0), [0.0, 0.0], atol=0.12)
    npt.assert_allclose(pooled.std(axis=0), [1.0, 1.0], atol=0.15)
    # One shared adapted step size across all chains.
    eps = np.asarray(jax.device_get(res.step_size))
    npt.assert_allclose(eps, eps[0])


def test_systematic_resample_unbiased():
    log_w = jnp.log(jnp.array([0.1, 0.2, 0.3, 0.4]))
    counts = np.zeros(4)
    for i in range(200):
        idx = systematic_resample(jax.random.PRNGKey(i), log_w)
        counts += np.bincount(np.asarray(idx), minlength=4)
    freqs = counts / counts.sum()
    npt.assert_allclose(freqs, [0.1, 0.2, 0.3, 0.4], atol=0.02)


def test_ess():
    npt.assert_allclose(
        effective_sample_size(jnp.zeros(100)), 100.0, rtol=1e-6)
    concentrated = jnp.log(jnp.array([1.0, 1e-8, 1e-8]))
    assert float(effective_sample_size(concentrated)) < 1.1


def test_bootstrap_filter_matches_kf():
    """SMC log-marginal-likelihood and filtered means agree with the exact
    KF on an LGSSM (within MC error)."""
    ell, sigma, dt, T, Xi = 1.0, 1.0, 0.01, 100, 0.1
    F, Sigma = m32_solution(ell, sigma, dt)
    H = jnp.array([1.0, 0.0])
    m0 = jnp.zeros(2)
    P0 = stationary_cov_m32(ell, sigma)
    key = jax.random.PRNGKey(7)
    xs = simulate_lgssm(F, Sigma, m0, T, key)
    key, sub = jax.random.split(key)
    ys = xs @ H + math.sqrt(Xi) * jax.random.normal(sub, (T,))

    mfs, _, nell = kf(F, Sigma, H, Xi, m0, P0, ys)
    res = bootstrap_filter(disc_m32(ell, sigma), H, Xi, m0, P0, dt, ys,
                           jax.random.PRNGKey(8), num_particles=4000)
    npt.assert_allclose(float(res.log_ml[-1]), -float(nell[-1]),
                        rtol=0.02)
    err = np.abs(np.asarray(res.means[:, 0] - mfs[:, 0]))
    assert err.mean() < 0.05
    assert bool(jnp.all(res.ess > 1.0))


def test_bootstrap_filter_sharded_matches_kf():
    """The particle-sharded SMC (psum weight reductions + exact global
    systematic resampling via all_gather) agrees with the exact KF on an
    LGSSM, on the 8-device CPU mesh."""
    ell, sigma, dt, T, Xi = 1.0, 1.0, 0.01, 100, 0.1
    F, Sigma = m32_solution(ell, sigma, dt)
    H = jnp.array([1.0, 0.0])
    m0 = jnp.zeros(2)
    P0 = stationary_cov_m32(ell, sigma)
    key = jax.random.PRNGKey(7)
    xs = simulate_lgssm(F, Sigma, m0, T, key)
    key, sub = jax.random.split(key)
    ys = xs @ H + math.sqrt(Xi) * jax.random.normal(sub, (T,))

    mfs, _, nell = kf(F, Sigma, H, Xi, m0, P0, ys)
    mesh = make_mesh(axis_name="particles")
    res = bootstrap_filter_sharded(
        disc_m32(ell, sigma), H, Xi, m0, P0, dt, ys,
        jax.random.PRNGKey(8), mesh, num_particles=4000)
    npt.assert_allclose(float(res.log_ml[-1]), -float(nell[-1]),
                        rtol=0.02)
    err = np.abs(np.asarray(res.means[:, 0] - mfs[:, 0]))
    assert err.mean() < 0.05
    assert bool(jnp.all(res.ess > 1.0))
