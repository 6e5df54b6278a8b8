"""Sharded Monte-Carlo sweep tests on the 8-virtual-device CPU mesh:
shard-count invariance (sharded result == single-device vmap result) and
psum-reduced means (SURVEY.md 4 'gaps to close')."""

import math

import jax
import jax.numpy as jnp
import numpy.testing as npt

from chirpgp_tpu.infer import sgp_filter
from chirpgp_tpu.models import m32_solution, stationary_cov_m32, disc_m32
from chirpgp_tpu.parallel import (
    make_mesh, sharded_seed_sweep, sharded_mean, pad_to_multiple)
from chirpgp_tpu.quad import cubature
from chirpgp_tpu.utils import simulate_lgssm

ELL, SIGMA, DT, XI, T = 0.7, 1.2, 0.01, 0.05, 60


def _per_seed(key):
    F, Sigma = m32_solution(ELL, SIGMA, DT)
    H = jnp.array([1.0, 0.0])
    m0 = jnp.zeros(2)
    P0 = stationary_cov_m32(ELL, SIGMA)
    key, sub = jax.random.split(key)
    xs = simulate_lgssm(F, Sigma, m0, T, key)
    ys = xs @ H + math.sqrt(XI) * jax.random.normal(sub, (T,))
    mfs, Pfs, nell = sgp_filter(disc_m32(ELL, SIGMA), cubature(2), H, XI,
                                m0, P0, DT, ys)
    return dict(err=jnp.mean((mfs[:, 0] - xs[:, 0]) ** 2), nll=nell[-1])


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_shard_invariance():
    """Sharded sweep == plain vmap, bit-for-bit within tolerance."""
    mesh = make_mesh()
    keys = jax.random.split(jax.random.PRNGKey(0), 16)
    sharded = sharded_seed_sweep(_per_seed, keys, mesh)
    local = jax.vmap(_per_seed)(keys)
    npt.assert_allclose(jax.device_get(sharded["err"]), local["err"],
                        rtol=1e-12)
    npt.assert_allclose(jax.device_get(sharded["nll"]), local["nll"],
                        rtol=1e-12)


def test_sharded_mean_matches_vmap_mean():
    mesh = make_mesh()
    keys = jax.random.split(jax.random.PRNGKey(1), 24)
    reduced = sharded_mean(_per_seed, keys, mesh)
    local = jax.vmap(_per_seed)(keys)
    npt.assert_allclose(float(reduced["err"]),
                        float(jnp.mean(local["err"])), rtol=1e-10)
    npt.assert_allclose(float(reduced["nll"]),
                        float(jnp.mean(local["nll"])), rtol=1e-10)


def test_pad_to_multiple():
    x = jnp.arange(10)
    padded, n = pad_to_multiple(x, 8)
    assert padded.shape[0] == 16 and n == 10
    y = jnp.arange(16)
    padded2, n2 = pad_to_multiple(y, 8)
    assert padded2.shape[0] == 16 and n2 == 16
