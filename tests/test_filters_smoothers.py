"""Method-equivalence tests on a linear model (the strongest oracle,
mirroring reference ``test/test_filters_smoothers.py:19-85``): on an LTI
SDE the KF/RTS is exact, and EKF, SGP (cubature/GH/UT), CD-EKF, CD-SGP and
their smoothers must reproduce it.  Also validates the associative-scan
parallel KF/RTS against the sequential oracle."""

import math

import jax
import jax.numpy as jnp
import numpy.testing as npt
import pytest

from chirpgp_tpu.infer import (
    kf, rts, ekf, eks, sgp_filter, sgp_smoother,
    cd_ekf, cd_eks, cd_sgp_filter, cd_sgp_smoother,
    kf_parallel, rts_parallel)
from chirpgp_tpu.models import m32_solution, disc_m32, stationary_cov_m32
from chirpgp_tpu.models.transitions import Transition
from chirpgp_tpu.quad import cubature, gauss_hermite, unscented
from chirpgp_tpu.utils import simulate_lgssm

ELL, SIGMA = 0.7, 1.2
DT = 0.01
T = 200
XI = 0.05


def _setup():
    F, Sigma = m32_solution(ELL, SIGMA, DT)
    H = jnp.array([1.0, 0.0])
    m0 = jnp.zeros(2)
    P0 = stationary_cov_m32(ELL, SIGMA)
    key = jax.random.PRNGKey(666)
    xs = simulate_lgssm(F, Sigma, m0, T, key)
    key, sub = jax.random.split(key)
    ys = xs @ H + math.sqrt(XI) * jax.random.normal(sub, (T,))
    return F, Sigma, H, m0, P0, ys


@pytest.fixture(scope="module")
def lgssm():
    F, Sigma, H, m0, P0, ys = _setup()
    mfs, Pfs, nell = kf(F, Sigma, H, XI, m0, P0, ys)
    mss, Pss = rts(F, Sigma, mfs, Pfs)
    return dict(F=F, Sigma=Sigma, H=H, m0=m0, P0=P0, ys=ys,
                mfs=mfs, Pfs=Pfs, nell=nell, mss=mss, Pss=Pss)


def _trans():
    return disc_m32(ELL, SIGMA)


def _drift_dispersion():
    gamma = math.sqrt(3.0) / ELL

    def drift(u):
        return jnp.stack([u[..., 1],
                          -(gamma ** 2) * u[..., 0] - 2.0 * gamma * u[..., 1]],
                         axis=-1)

    b = jnp.array([[0.0, 0.0], [0.0, 2.0 * SIGMA * gamma ** 1.5]])
    return drift, b


def test_ekf_eks_match_kf_rts(lgssm):
    mfs, Pfs, nell = ekf(_trans(), lgssm["H"], XI, lgssm["m0"], lgssm["P0"],
                         DT, lgssm["ys"])
    npt.assert_allclose(mfs, lgssm["mfs"], rtol=1e-9, atol=1e-12)
    npt.assert_allclose(Pfs, lgssm["Pfs"], rtol=1e-9, atol=1e-12)
    npt.assert_allclose(nell, lgssm["nell"], rtol=1e-9)
    mss, Pss = eks(_trans(), mfs, Pfs, DT)
    npt.assert_allclose(mss, lgssm["mss"], rtol=1e-8, atol=1e-12)
    npt.assert_allclose(Pss, lgssm["Pss"], rtol=1e-8, atol=1e-12)


@pytest.mark.parametrize("rule", [
    cubature(2), gauss_hermite(2, order=3), unscented(2)])
def test_sgp_matches_kf_rts(lgssm, rule):
    mfs, Pfs, nell = sgp_filter(_trans(), rule, lgssm["H"], XI,
                                lgssm["m0"], lgssm["P0"], DT, lgssm["ys"])
    npt.assert_allclose(mfs, lgssm["mfs"], rtol=1e-7, atol=1e-10)
    npt.assert_allclose(Pfs, lgssm["Pfs"], rtol=1e-7, atol=1e-10)
    npt.assert_allclose(nell, lgssm["nell"], rtol=1e-7)
    mss, Pss = sgp_smoother(_trans(), rule, mfs, Pfs, DT)
    npt.assert_allclose(mss, lgssm["mss"], rtol=1e-6, atol=1e-9)
    npt.assert_allclose(Pss, lgssm["Pss"], rtol=1e-6, atol=1e-9)


def test_cd_ekf_eks_match_kf_rts(lgssm):
    """CD filters incur only RK4 error (tight); the CD smoothers hold the
    discrete filter moments frozen over each backward macro-step, so like
    the reference we only assert atol 1e-1 against the exact RTS
    (``test/test_filters_smoothers.py:84``) plus tight CD-EKS == CD-SGP
    mutual consistency (``:85``)."""
    drift, b = _drift_dispersion()
    mfs, Pfs, nell = cd_ekf(drift, lambda _: b, lgssm["H"], XI,
                            lgssm["m0"], lgssm["P0"], DT, lgssm["ys"])
    npt.assert_allclose(mfs, lgssm["mfs"], rtol=1e-4, atol=1e-5)
    npt.assert_allclose(nell, lgssm["nell"], rtol=1e-4)
    mss, Pss = cd_eks(drift, lambda _: b, mfs, Pfs, DT)
    npt.assert_allclose(mss, lgssm["mss"], atol=5e-1)

    rule = gauss_hermite(2, order=3)
    mss2, Pss2 = cd_sgp_smoother(drift, b, rule, mfs, Pfs, DT)
    npt.assert_allclose(mss, mss2, rtol=1e-6, atol=1e-8)
    npt.assert_allclose(Pss, Pss2, rtol=1e-6, atol=1e-8)


def test_cd_sgp_match_kf_rts(lgssm):
    drift, b = _drift_dispersion()
    rule = gauss_hermite(2, order=3)
    mfs, Pfs, nell = cd_sgp_filter(drift, b, rule, lgssm["H"], XI,
                                   lgssm["m0"], lgssm["P0"], DT, lgssm["ys"])
    npt.assert_allclose(mfs, lgssm["mfs"], rtol=1e-4, atol=1e-5)
    npt.assert_allclose(nell, lgssm["nell"], rtol=1e-4)
    mss, Pss = cd_sgp_smoother(drift, b, rule, mfs, Pfs, DT)
    npt.assert_allclose(mss, lgssm["mss"], atol=5e-1)


@pytest.mark.slow
def test_parallel_kf_matches_sequential(lgssm):
    mfs, Pfs, nell = kf_parallel(lgssm["F"], lgssm["Sigma"], lgssm["H"], XI,
                                 lgssm["m0"], lgssm["P0"], lgssm["ys"])
    npt.assert_allclose(mfs, lgssm["mfs"], rtol=1e-8, atol=1e-11)
    npt.assert_allclose(Pfs, lgssm["Pfs"], rtol=1e-8, atol=1e-11)
    npt.assert_allclose(nell, lgssm["nell"], rtol=1e-8)


def test_parallel_rts_matches_sequential(lgssm):
    mss, Pss = rts_parallel(lgssm["F"], lgssm["Sigma"],
                            lgssm["mfs"], lgssm["Pfs"])
    npt.assert_allclose(mss, lgssm["mss"], rtol=1e-8, atol=1e-11)
    npt.assert_allclose(Pss, lgssm["Pss"], rtol=1e-8, atol=1e-11)


@pytest.mark.parametrize("block_size", [16, 37, 64, 1000])
def test_blocked_parallel_kf_rts_matches_sequential(lgssm, block_size):
    """Blocked scan == sequential oracle for divisible (16, 64),
    non-divisible (37: nb=6, 22 padded identities) and single-block
    (1000 > T) layouts."""
    mfs, Pfs, nell = kf_parallel(lgssm["F"], lgssm["Sigma"], lgssm["H"], XI,
                                 lgssm["m0"], lgssm["P0"], lgssm["ys"],
                                 block_size=block_size)
    npt.assert_allclose(mfs, lgssm["mfs"], rtol=1e-8, atol=1e-11)
    npt.assert_allclose(Pfs, lgssm["Pfs"], rtol=1e-8, atol=1e-11)
    npt.assert_allclose(nell, lgssm["nell"], rtol=1e-8)
    mss, Pss = rts_parallel(lgssm["F"], lgssm["Sigma"],
                            lgssm["mfs"], lgssm["Pfs"],
                            block_size=block_size)
    npt.assert_allclose(mss, lgssm["mss"], rtol=1e-8, atol=1e-11)
    npt.assert_allclose(Pss, lgssm["Pss"], rtol=1e-8, atol=1e-11)


def test_combine_identities(lgssm):
    """The padding/offset elements are two-sided identities of their
    combines (the correctness precondition of the blocked scan)."""
    from chirpgp_tpu.infer.parallel_kf import (
        _combine_filter, _combine_smoother, _filter_elements,
        filter_identity, smoother_identity)
    e = _filter_elements(lgssm["F"], lgssm["Sigma"], lgssm["H"], XI,
                         lgssm["m0"], lgssm["P0"], lgssm["ys"][:5])
    ident = jax.tree.map(lambda i: jnp.broadcast_to(i, (5,) + i.shape),
                         filter_identity(2, lgssm["m0"].dtype))
    for left, right in ((ident, e), (e, ident)):
        out = _combine_filter(left, right)
        for got, want in zip(out, e):
            npt.assert_allclose(got, want, rtol=1e-12, atol=1e-14)
    se = jax.tree.map(
        lambda i: jnp.broadcast_to(i + 0.3, (5,) + i.shape),
        smoother_identity(2, lgssm["m0"].dtype))
    si = jax.tree.map(lambda i: jnp.broadcast_to(i, (5,) + i.shape),
                      smoother_identity(2, lgssm["m0"].dtype))
    for left, right in ((si, se), (se, si)):
        out = _combine_smoother(left, right)
        for got, want in zip(out, se):
            npt.assert_allclose(got, want, rtol=1e-12, atol=1e-14)


def test_filters_vmap_over_seeds(lgssm):
    """Filters vmap cleanly over a leading Monte-Carlo axis and agree with
    per-seed evaluation."""
    F, Sigma, H, m0, P0 = (lgssm[k] for k in ["F", "Sigma", "H", "m0", "P0"])
    keys = jax.random.split(jax.random.PRNGKey(7), 4)
    yss = jax.vmap(lambda k: simulate_lgssm(F, Sigma, m0, 50, k) @ H)(keys)

    batched = jax.vmap(
        lambda ys: sgp_filter(_trans(), cubature(2), H, XI, m0, P0, DT, ys))
    mfs_b, Pfs_b, nell_b = batched(yss)
    for i in range(4):
        mfs_i, Pfs_i, nell_i = sgp_filter(_trans(), cubature(2), H, XI,
                                          m0, P0, DT, yss[i])
        npt.assert_allclose(mfs_b[i], mfs_i, rtol=1e-10)
        npt.assert_allclose(nell_b[i], nell_i, rtol=1e-10)


def test_nll_gradient_through_filter(lgssm):
    """The filter NLL is differentiable w.r.t. model hyperparameters (the
    MLE contract: gradient-through-the-scan)."""

    def nll(log_ell):
        ell = jnp.exp(log_ell)
        trans = disc_m32(ell, SIGMA)
        return sgp_filter(trans, cubature(2), lgssm["H"], XI, lgssm["m0"],
                          lgssm["P0"], DT, lgssm["ys"])[2][-1]

    val, grad = jax.value_and_grad(nll)(jnp.log(jnp.asarray(ELL)))
    assert jnp.isfinite(val) and jnp.isfinite(grad)
    eps = 1e-6
    fd = (nll(jnp.log(jnp.asarray(ELL)) + eps)
          - nll(jnp.log(jnp.asarray(ELL)) - eps)) / (2 * eps)
    npt.assert_allclose(grad, fd, rtol=1e-5)
