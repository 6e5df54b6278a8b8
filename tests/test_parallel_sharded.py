"""Time-axis-sharded parallel KF/RTS: exact agreement with the
single-device associative scans on the 8-virtual-device mesh."""

import math

import pytest
import jax
import jax.numpy as jnp
import numpy.testing as npt

from chirpgp_tpu.infer import kf, rts, kf_parallel, rts_parallel
from chirpgp_tpu.infer.parallel_sharded import (
    kf_parallel_time_sharded, rts_parallel_time_sharded)
from chirpgp_tpu.models import m32_solution, stationary_cov_m32
from chirpgp_tpu.parallel import make_mesh
from chirpgp_tpu.utils import simulate_lgssm

ELL, SIGMA, DT, XI = 0.7, 1.2, 0.01, 0.05
T = 240   # divisible by 8


def _data():
    F, Sigma = m32_solution(ELL, SIGMA, DT)
    H = jnp.array([1.0, 0.0])
    m0 = jnp.zeros(2)
    P0 = stationary_cov_m32(ELL, SIGMA)
    key = jax.random.PRNGKey(21)
    xs = simulate_lgssm(F, Sigma, m0, T, key)
    key, sub = jax.random.split(key)
    ys = xs @ H + math.sqrt(XI) * jax.random.normal(sub, (T,))
    return F, Sigma, H, m0, P0, ys


def test_time_sharded_filter_matches():
    F, Sigma, H, m0, P0, ys = _data()
    mesh = make_mesh(axis_name="time")
    mfs_s, Pfs_s, nll_s = kf_parallel_time_sharded(F, Sigma, H, XI, m0, P0,
                                                   ys, mesh)
    mfs, Pfs, nll = kf(F, Sigma, H, XI, m0, P0, ys)
    npt.assert_allclose(jax.device_get(mfs_s), mfs, rtol=1e-8, atol=1e-10)
    npt.assert_allclose(jax.device_get(Pfs_s), Pfs, rtol=1e-8, atol=1e-10)
    npt.assert_allclose(jax.device_get(nll_s), nll, rtol=1e-8)


def test_time_sharded_smoother_matches():
    F, Sigma, H, m0, P0, ys = _data()
    mesh = make_mesh(axis_name="time")
    mfs, Pfs, _ = kf(F, Sigma, H, XI, m0, P0, ys)
    mss, Pss = rts(F, Sigma, mfs, Pfs)
    mss_s, Pss_s = rts_parallel_time_sharded(F, Sigma, mfs, Pfs, mesh)
    npt.assert_allclose(jax.device_get(mss_s), mss, rtol=1e-7, atol=1e-9)
    npt.assert_allclose(jax.device_get(Pss_s), Pss, rtol=1e-7, atol=1e-9)


def test_time_sharded_blocked_local_scan_matches():
    """Sharded scan with blocked per-shard local scans == sequential
    oracle (T=240 over 8 shards -> 30 local elements, block_size=8
    leaves a non-divisible 6-element tail block per shard)."""
    F, Sigma, H, m0, P0, ys = _data()
    mesh = make_mesh(axis_name="time")
    mfs_s, Pfs_s, nll_s = kf_parallel_time_sharded(
        F, Sigma, H, XI, m0, P0, ys, mesh, block_size=8)
    mfs, Pfs, nll = kf(F, Sigma, H, XI, m0, P0, ys)
    npt.assert_allclose(jax.device_get(mfs_s), mfs, rtol=1e-8, atol=1e-10)
    npt.assert_allclose(jax.device_get(Pfs_s), Pfs, rtol=1e-8, atol=1e-10)
    npt.assert_allclose(jax.device_get(nll_s), nll, rtol=1e-8)
    mss, Pss = rts(F, Sigma, mfs, Pfs)
    mss_s, Pss_s = rts_parallel_time_sharded(F, Sigma, mfs, Pfs, mesh,
                                             block_size=8)
    npt.assert_allclose(jax.device_get(mss_s), mss, rtol=1e-7, atol=1e-9)
    npt.assert_allclose(jax.device_get(Pss_s), Pss, rtol=1e-7, atol=1e-9)


@pytest.mark.slow
def test_time_sharded_matches_unsharded_parallel():
    """Sharded and unsharded associative scans agree bit-tightly."""
    F, Sigma, H, m0, P0, ys = _data()
    mesh = make_mesh(axis_name="time")
    out_s = kf_parallel_time_sharded(F, Sigma, H, XI, m0, P0, ys, mesh)
    out_u = kf_parallel(F, Sigma, H, XI, m0, P0, ys)
    for a, b in zip(out_s, out_u):
        npt.assert_allclose(jax.device_get(a), jax.device_get(b),
                            rtol=1e-10, atol=1e-12)
