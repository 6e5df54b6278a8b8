"""Utils and toymodel tests (modeled on reference ``test/test_utils.py`` and
``test/test_toymodels.py``): simulator moments by Monte Carlo, LTI
discretization identities, change-of-variables pdf, RMSE."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt

from chirpgp_tpu.models import m32_solution, stationary_cov_m32, disc_m32
from chirpgp_tpu.toymodels import (
    gen_chirp, gen_harmonic_chirp, affine_freq, polynomial_freq, meow_freq,
    constant_mag, damped_exp_mag, random_ou_mag)
from chirpgp_tpu.utils import (
    lti_sde_to_disc, simulate_lgssm, simulate_sde, rmse, fwd_transformed_pdf,
    chol_partial_const_diag)


def test_lti_sde_to_disc_scalar_ou():
    """Exact OU discretization: F = e^{-a dt}, Sigma = b^2(1-e^{-2adt})/2a."""
    a, b, dt = 1.7, 0.8, 0.05
    A = jnp.array([[-a]])
    B = jnp.array([[b]])
    F, Sigma = lti_sde_to_disc(A, B, dt)
    npt.assert_allclose(F[0, 0], math.exp(-a * dt), rtol=1e-10)
    npt.assert_allclose(Sigma[0, 0],
                        b ** 2 / (2 * a) * (1 - math.exp(-2 * a * dt)),
                        rtol=1e-8)


def test_simulate_lgssm_moments():
    """MC moments of simulated LGSSM trajectories match the closed-form
    marginal moments (reference ``test/test_utils.py:36-57``)."""
    ell, sigma, dt, T, N = 0.7, 1.1, 0.01, 50, 100000
    F, Sigma = m32_solution(ell, sigma, dt)
    P0 = stationary_cov_m32(ell, sigma)
    x0 = jnp.zeros(2)
    keys = jax.random.split(jax.random.PRNGKey(0), N)
    trajs = jax.vmap(lambda k: simulate_lgssm(F, Sigma, x0, T, k))(keys)
    # Marginal covariance recursion from x0 = 0 (deterministic init).
    P = jnp.zeros((2, 2))
    for t in range(T):
        P = F @ P @ F.T + Sigma
    mc_cov = jnp.einsum("ni,nj->ij", trajs[:, -1], trajs[:, -1]) / N
    npt.assert_allclose(mc_cov, P, rtol=2e-2)
    npt.assert_allclose(jnp.mean(trajs[:, -1], axis=0), jnp.zeros(2), atol=2e-2)


def test_simulate_sde_matches_lgssm_on_linear():
    """simulate_sde through a linear Transition reproduces the stationary
    distribution."""
    ell, sigma, dt, T, N = 0.7, 1.1, 0.05, 100, 20000
    trans = disc_m32(ell, sigma)
    P0 = stationary_cov_m32(ell, sigma)
    keys = jax.random.split(jax.random.PRNGKey(1), N)
    trajs = jax.vmap(
        lambda k: simulate_sde(trans, jnp.zeros(2), P0, dt, T, k))(keys)
    mc_cov = jnp.einsum("ni,nj->ij", trajs[:, -1], trajs[:, -1]) / N
    npt.assert_allclose(mc_cov, P0, rtol=7e-2, atol=5e-2)


def test_fwd_transformed_pdf_chi_square():
    """Y = X^2's density via change of variables matches chi-square with 1
    dof on the positive half-line (reference ``test/test_utils.py:59-75``,
    using g(x) = sqrt on Y > 0 with a factor 2 for symmetry)."""
    from scipy.stats import chi2
    pdf_x = lambda x: jnp.exp(-0.5 * x ** 2) / jnp.sqrt(2 * jnp.pi)
    g_inv = lambda y: jnp.sqrt(y)
    pdf_y = fwd_transformed_pdf(pdf_x, g_inv)
    ys = jnp.linspace(0.1, 4.0, 30)
    npt.assert_allclose(2.0 * pdf_y(ys), chi2.pdf(np.asarray(ys), df=1),
                        rtol=1e-6)


def test_chol_partial_const_diag():
    a = jnp.diag(jnp.array([4.0, 9.0]))
    m = jnp.array([[2.0, 0.5], [0.5, 1.0]])
    import jax.scipy.linalg as jsl
    full = jsl.block_diag(a, m)
    L = chol_partial_const_diag(full, 2, lower=True)
    npt.assert_allclose(L @ L.T, full, rtol=1e-10)


def test_rmse():
    x = jnp.zeros((10, 2))
    y = jnp.ones((10, 2)) * jnp.array([3.0, 4.0])
    npt.assert_allclose(rmse(x, y), 7.0, rtol=1e-12)
    npt.assert_allclose(rmse(x, y, reduce_sum=False), jnp.array([3.0, 4.0]))


def test_freq_phase_consistency():
    """Phase functions are antiderivatives of frequency functions."""
    ts = jnp.linspace(0.3, 2.5, 200)
    eps = 1e-5
    for freq, phase in [affine_freq(2.0, 1.0),
                        polynomial_freq([1.0, -0.5, 0.2]),
                        meow_freq(offset=8.0)]:
        dphase = (phase(ts + eps) - phase(ts - eps)) / (2 * eps)
        npt.assert_allclose(dphase, freq(ts), rtol=1e-4, atol=1e-4)


def test_gen_chirp_known_tone():
    """A constant-frequency 'chirp' is a pure sinusoid."""
    ts = jnp.linspace(0.001, 1.0, 1000)
    freq, phase = affine_freq(0.0, 5.0)
    ys = gen_chirp(ts, constant_mag(2.0), phase)
    npt.assert_allclose(ys, 2.0 * jnp.sin(2 * jnp.pi * 5.0 * ts), atol=1e-10)


def test_gen_harmonic_chirp():
    ts = jnp.linspace(0.001, 1.0, 100)
    _, phase = affine_freq(0.0, 3.0)
    ys = gen_harmonic_chirp(ts, [constant_mag(1.0), constant_mag(0.5)], phase)
    expected = jnp.sin(2 * jnp.pi * 3.0 * ts) \
        + 0.5 * jnp.sin(4 * jnp.pi * 3.0 * ts)
    npt.assert_allclose(ys, expected, atol=1e-10)


def test_magnitudes():
    ts = jnp.linspace(0.0, 1.0, 100)
    npt.assert_allclose(constant_mag(1.5)(ts), 1.5 * jnp.ones(100))
    npt.assert_allclose(damped_exp_mag(0.3)(ts), jnp.exp(-0.3 * ts))
    ou = random_ou_mag(1.0, 1.0, jax.random.PRNGKey(9))(ts)
    assert ou.shape == (100,)
    assert bool(jnp.all(jnp.isfinite(ou)))
