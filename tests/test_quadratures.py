"""Quadrature tests (modeled on reference ``test/test_quadratures.py``):
weight normalization, polynomial exactness, Gaussian-sine closed form, and
batched-reduction consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from chirpgp_tpu.quad import (
    SigmaPoints, cubature, gauss_hermite, unscented,
    gaussian_expectation, gaussian_expectation_1d)


@pytest.mark.parametrize("rule", [
    cubature(3), gauss_hermite(3, order=4), unscented(3),
    gauss_hermite(1, order=10), cubature(8),
])
def test_weights_normalise(rule):
    npt.assert_allclose(np.sum(np.asarray(rule.w)), 1.0, rtol=1e-12)
    if rule.wc is not None:
        npt.assert_allclose(np.sum(np.asarray(rule.wc)), 1.0, rtol=1e-12)


@pytest.mark.parametrize("rule,exact_degree", [
    (cubature(2), 3), (gauss_hermite(2, order=3), 5), (unscented(2), 3),
])
def test_polynomial_exactness(rule, exact_degree):
    """E[x1^p] under N(0, I) integrated exactly up to the rule's degree."""
    # Gaussian raw moments of standard normal: 0, 1, 0, 3, 0, 15, ...
    exact = {0: 1.0, 1: 0.0, 2: 1.0, 3: 0.0, 4: 3.0, 5: 0.0}
    m = jnp.zeros(2)
    L = jnp.eye(2)
    chi = rule.gen_sigma_points(m, L)
    for p in range(exact_degree + 1):
        approx = jnp.einsum("s,s->", rule.w, chi[:, 0] ** p)
        npt.assert_allclose(approx, exact[p], atol=1e-10)


def test_gaussian_sine_closed_form():
    """E[sin(X)] for X ~ N(m, P) equals sin(m) exp(-P/2)."""
    m, P = 0.7, 0.3
    rule = gauss_hermite(1, order=10)
    chi = rule.gen_sigma_points(jnp.array([m]), jnp.array([[np.sqrt(P)]]))
    approx = jnp.einsum("s,s->", rule.w, jnp.sin(chi[:, 0]))
    npt.assert_allclose(approx, np.sin(m) * np.exp(-P / 2), rtol=1e-8)


def test_mean_and_cov_reduction():
    """Deviation-form weighted moments agree with the raw-moment form."""
    rule = gauss_hermite(3, order=3)
    key = jax.random.PRNGKey(0)
    evals = jax.random.normal(key, (rule.n_points, 3))
    mean, cov = rule.mean_and_cov(evals)
    mean_ref = jnp.einsum("s,sd->d", rule.w, evals)
    raw = jnp.einsum("s,si,sj->ij", rule.w, evals, evals)
    npt.assert_allclose(mean, mean_ref, rtol=1e-12)
    npt.assert_allclose(cov, raw - jnp.outer(mean_ref, mean_ref), atol=1e-10)


def test_batched_sigma_points():
    """gen_sigma_points broadcasts over leading batch axes."""
    rule = cubature(4)
    key = jax.random.PRNGKey(1)
    ms = jax.random.normal(key, (5, 4))
    Ls = jnp.broadcast_to(jnp.eye(4), (5, 4, 4)) * 2.0
    chi = rule.gen_sigma_points(ms, Ls)
    assert chi.shape == (5, rule.n_points, 4)
    for i in range(5):
        single = rule.gen_sigma_points(ms[i], Ls[i])
        npt.assert_allclose(chi[i], single, rtol=1e-12)


def test_gaussian_expectation_matches_reference_contract():
    """gaussian_expectation with force_shape matches the scalar fast path
    and the exact E[g(V)] for softplus under a Gaussian (MC check)."""
    ms = jnp.linspace(-1.0, 3.0, 7)
    stds = jnp.linspace(0.1, 1.0, 7)
    out = gaussian_expectation(ms, stds, force_shape=True)[:, 0]
    out_1d = gaussian_expectation_1d(ms, stds)
    npt.assert_allclose(out, out_1d, rtol=1e-12)

    # Monte-Carlo reference
    key = jax.random.PRNGKey(2)
    zs = jax.random.normal(key, (200000,))
    for i in range(7):
        mc = jnp.mean(jax.nn.softplus(ms[i] + stds[i] * zs))
        npt.assert_allclose(out[i], mc, rtol=5e-3)


def test_unscented_matches_cubature_weights_on_linear():
    """UT with default params integrates linear/quadratic functions
    exactly."""
    rule = unscented(2)
    m = jnp.array([0.5, -0.2])
    L = jnp.linalg.cholesky(jnp.array([[0.4, 0.1], [0.1, 0.3]]))
    chi = rule.gen_sigma_points(m, L)
    mean, cov = rule.mean_and_cov(chi)
    npt.assert_allclose(mean, m, atol=1e-12)
    npt.assert_allclose(cov, L @ L.T, atol=1e-10)
