"""Coverage for transition wrappers, channels-first fallbacks, chunked
L-BFGS equivalence, and timing utilities."""

import jax
import jax.numpy as jnp
import numpy.testing as npt

from chirpgp_tpu.infer.batched import sqrt_sgp_filter_batched
from chirpgp_tpu.models import disc_m32, m32_solution, stationary_cov_m32
from chirpgp_tpu.models.transitions import Transition, as_transition
from chirpgp_tpu.quad import cubature
from chirpgp_tpu.utils import time_jitted, wall_timer


ELL, SIGMA, DT = 0.8, 1.1, 0.02


def test_as_transition_wraps_plain_callable():
    F, Sigma = m32_solution(ELL, SIGMA, DT)

    def m_and_cov(u, dt):
        return F @ u, Sigma

    trans = as_transition(m_and_cov)
    assert isinstance(trans, Transition)
    u = jnp.array([0.3, -0.2])
    m, c = trans(u, DT)
    npt.assert_allclose(m, F @ u, rtol=1e-12)
    npt.assert_allclose(c, Sigma, rtol=1e-12)
    # Batched fallback via vmap.
    batch = jnp.stack([u, 2 * u, 3 * u])
    npt.assert_allclose(trans.mean(batch, DT), batch @ F.T, rtol=1e-10)


def test_mean_channels_first_fallback_matches_cf():
    """The transpose fallback equals the native channels-first evaluator."""
    trans = disc_m32(ELL, SIGMA)
    u_cf = jax.random.normal(jax.random.PRNGKey(0), (5, 2, 7))
    native = trans.mean_channels_first(u_cf, DT)
    fallback = Transition(mean=trans.mean, cov=trans.cov,
                          const_cov=True).mean_channels_first(u_cf, DT)
    npt.assert_allclose(native, fallback, rtol=1e-10)


def test_batched_filter_with_fallback_transition():
    """The batched kernels work for transitions without mean_cf (via the
    transpose fallback)."""
    import math
    F, Sigma = m32_solution(ELL, SIGMA, DT)
    H = jnp.array([1.0, 0.0])
    m0 = jnp.zeros(2)
    P0 = stationary_cov_m32(ELL, SIGMA)
    yss = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (3, 40))

    native = disc_m32(ELL, SIGMA)
    fallback = Transition(mean=native.mean, cov=native.cov, const_cov=True)
    out_n = sqrt_sgp_filter_batched(native, cubature(2), H, 0.05, m0, P0,
                                    DT, yss)
    out_f = sqrt_sgp_filter_batched(fallback, cubature(2), H, 0.05, m0, P0,
                                    DT, yss)
    npt.assert_allclose(out_n[0], out_f[0], rtol=1e-8, atol=1e-10)
    npt.assert_allclose(out_n[2], out_f[2], rtol=1e-8)


def test_lbfgs_chunked_equals_monolithic():
    from chirpgp_tpu.fit.mle import lbfgs_minimize

    def rosen(x):
        return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2
                       + (1.0 - x[:-1]) ** 2)

    x0 = jnp.array([-1.2, 1.0, 0.8])
    mono = lbfgs_minimize(rosen, x0, max_iters=100)
    chunked = lbfgs_minimize(rosen, x0, max_iters=100, chunk_iters=7)
    assert bool(mono.success) and bool(chunked.success)
    npt.assert_allclose(chunked.params, mono.params, atol=1e-5)
    npt.assert_allclose(float(chunked.fun_val), float(mono.fun_val),
                        atol=1e-8)


def test_timing_utils():
    f = jax.jit(lambda x: jnp.sum(x * x))
    res = time_jitted(f, jnp.arange(128.0), repeats=3)
    assert res.best > 0 and len(res.times) == 3
    assert "ms" in str(res)
    lines = []
    with wall_timer("block", printer=lines.append):
        _ = f(jnp.arange(8.0))
    assert lines and "block" in lines[0]
