"""PCRLB and covariance-function tests (modeled on reference
``test/test_crlb.py`` and ``test/test_cov_funcs.py``)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt

from chirpgp_tpu.infer import kf
from chirpgp_tpu.models import (
    posterior_cramer_rao, m32_solution, stationary_cov_m32)
from chirpgp_tpu.models.cov_funcs import (
    transition_harmonic_sde, marginal_cov_harmonic_sde, cov_harmonic_sde,
    vmap_cov_harmonic_sde, approx_cov_chirp_sde)
from chirpgp_tpu.utils import simulate_lgssm


def test_pcrlb_equals_kf_cov_on_lgssm():
    """On an LGSSM the PCRLB recursion inverse equals the KF covariance
    (reference ``test/test_crlb.py:39-87``; smaller MC budget for CI)."""
    ell, sigma, dt, T, N = 1.0, 1.0, 0.01, 30, 200_000
    F, Sigma = m32_solution(ell, sigma, dt)
    H = jnp.array([1.0, 0.0])
    Xi = 0.1
    P0 = stationary_cov_m32(ell, sigma)
    m0 = jnp.zeros(2)

    keys = jax.random.split(jax.random.PRNGKey(0), N)
    L0 = jnp.linalg.cholesky(P0)
    x0s = jax.vmap(lambda k: m0 + L0 @ jax.random.normal(k, (2,)))(keys)
    traj = jax.vmap(lambda k, x0: simulate_lgssm(F, Sigma, x0, T, k)
                    )(jax.random.split(jax.random.PRNGKey(1), N), x0s)
    xss = jnp.concatenate([x0s[None].transpose(0, 1, 2),
                           traj.transpose(1, 0, 2)], axis=0)  # (T+1, N, d)
    noise = jax.random.normal(jax.random.PRNGKey(2), (T, N))
    yss = jnp.einsum("tnd,d->tn", xss[1:], H) + math.sqrt(Xi) * noise

    Sigma_inv = jnp.linalg.inv(Sigma)
    j0 = jnp.linalg.inv(P0)

    def logpdf_transition(xt, xs):
        r = xt - F @ xs
        return -0.5 * r @ Sigma_inv @ r

    def logpdf_likelihood(y, x):
        return -0.5 * (y - H @ x) ** 2 / Xi

    js = posterior_cramer_rao(xss, yss, j0, logpdf_transition,
                              logpdf_likelihood)

    # KF covariance recursion (information-form bound is exact here).
    _, Pfs, _ = kf(F, Sigma, H, Xi, m0, P0, jnp.zeros(T))
    bound = jnp.linalg.inv(js)
    npt.assert_allclose(bound, Pfs, rtol=1e-8, atol=1e-10)


def test_harmonic_cov_marginal_consistency():
    """Cov[X(t), X(t)] equals the marginal covariance (reference
    ``test/test_cov_funcs.py:13-31``)."""
    lam, b, f = 0.3, 0.7, 2.0
    w = 2 * math.pi * f
    cov0 = 0.1 * jnp.eye(2)
    for t in [0.5, 1.0, 2.0]:
        two_sided = cov_harmonic_sde(t, t, cov0, f, lam, b)
        marginal = marginal_cov_harmonic_sde(t, 0.0, cov0, lam, b, w)
        npt.assert_allclose(two_sided, marginal, rtol=1e-10, atol=1e-12)


def test_harmonic_cov_decay():
    """|Cov[X(t1), X(t2)]| decays as |t1 - t2| grows (damping)."""
    lam, b, f = 0.5, 0.7, 2.0
    cov0 = 0.1 * jnp.eye(2)
    norms = []
    for gap in [0.0, 1.0, 3.0, 6.0]:
        c = cov_harmonic_sde(1.0, 1.0 + gap, cov0, f, lam, b)
        norms.append(float(jnp.linalg.norm(c)))
    assert norms[0] > norms[1] > norms[2] > norms[3]


def test_vmap_cov_grid_shape():
    lam, b, f = 0.3, 0.7, 2.0
    cov0 = 0.1 * jnp.eye(2)
    ts = jnp.linspace(0.1, 1.0, 5)
    grid = vmap_cov_harmonic_sde(ts, ts, cov0, f, lam, b)
    assert grid.shape == (5, 5, 2, 2)


def test_mc_cov_matches_closed_form_stationary_block():
    """MC covariance surface of the chirp SDE: the V-block diagonal stays
    near the stationary Matern variance."""
    lam, b, ell, sigma, delta = 0.2, 0.3, 1.0, 1.0, 0.1
    ts = jnp.linspace(0.01, 0.5, 50)
    surf = approx_cov_chirp_sde(ts, lam, b, ell, sigma, delta,
                                num_mcs=4000, key=jax.random.PRNGKey(5))
    assert surf.shape == (50, 50, 4, 4)
    # The reference normalizes by (T - 1) instead of num_mcs (cov_funcs.py
    # :157): rescale to interpret as a covariance.
    vv = np.asarray(surf[25, 25, 2, 2]) * (50 - 1) / 4000
    npt.assert_allclose(vv, sigma ** 2, rtol=0.15)


def test_psd_chirp_sde_peaks_at_prior_frequency():
    """PSD estimate (reference left it as a TODO stub,
    ``chirpgp/cov_funcs.py:213-215``): with a tight Matern prior the chirp
    oscillates at ~g(0) Hz and the averaged periodogram must peak there."""
    from chirpgp_tpu.models.cov_funcs import psd_chirp_sde

    lam, b, ell, sigma, delta = 0.2, 0.05, 1.0, 0.01, 1e-4
    dt, T = 0.01, 1024
    ts = jnp.linspace(dt, dt * T, T)
    freqs, psd = psd_chirp_sde(ts, lam, b, ell, sigma, delta,
                               num_mcs=256, key=jax.random.PRNGKey(7))
    assert freqs.shape == psd.shape == (T // 2 + 1,)
    assert bool(jnp.all(psd >= 0.0))
    f_peak = float(freqs[jnp.argmax(psd)])
    f_expected = math.log(2.0)  # g(0) = softplus(0)
    assert abs(f_peak - f_expected) < 0.2, (f_peak, f_expected)
