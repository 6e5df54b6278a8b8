"""Nonlinear-LSQ optimizers: the jittable while_loop GN/LM and their
batched (vmapped) use (reference oracle: ``test/test_gauss_newton.py``
recovers quadratic regression parameters)."""

import jax
import jax.numpy as jnp
import numpy.testing as npt

from chirpgp_tpu.fit.gauss_newton import (
    gauss_newton, levenberg_marquardt, gauss_newton_while,
    levenberg_marquardt_while)


def _quadratic_problem(key=jax.random.PRNGKey(666)):
    ts = jnp.linspace(0.0, 1.0, 100)
    true = jnp.array([1.0, 2.0, 3.0])

    def f(params):
        return params[0] + params[1] * ts + params[2] * ts ** 2

    ys = f(true) + 0.01 * jax.random.normal(key, (100,))
    return f, ys, true


def test_gauss_newton_while_recovers_quadratic():
    f, ys, true = _quadratic_problem()
    res = gauss_newton_while(f, jnp.array([0.5, 1.5, 2.5]), ys, 1.0)
    npt.assert_allclose(res.params, true, rtol=2e-2)
    assert bool(res.converged)
    # trace entry 0 is the init objective; the minimum is at the end
    assert float(res.obj_trace[0]) > float(res.obj_val)


def test_levenberg_marquardt_while_recovers_quadratic():
    f, ys, true = _quadratic_problem()
    res = levenberg_marquardt_while(f, jnp.array([0.0, 0.0, 0.0]), ys,
                                    1.0)
    npt.assert_allclose(res.params, true, rtol=2e-2)
    assert bool(res.converged)


def test_host_wrappers_match_while_results():
    f, ys, true = _quadratic_problem()
    p_gn, trace_gn = gauss_newton(f, jnp.array([0.5, 1.5, 2.5]), ys, 1.0)
    npt.assert_allclose(p_gn, true, rtol=2e-2)
    assert trace_gn.ndim == 1 and bool(jnp.all(jnp.isfinite(trace_gn)))
    p_lm, trace_lm = levenberg_marquardt(f, jnp.zeros(3), ys, 1.0)
    npt.assert_allclose(p_lm, true, rtol=2e-2)
    # LM trajectory is monotone nonincreasing (reject steps keep obj)
    assert bool(jnp.all(jnp.diff(trace_lm) <= 1e-9))


def test_lm_while_vmaps_over_batch():
    """The whole LM optimization vmaps over a Monte-Carlo batch axis."""
    f, _, true = _quadratic_problem()
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    yss = jnp.stack([f(true) + 0.01 * jax.random.normal(k, (100,))
                     for k in keys])
    inits = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0]), (4, 3))

    res = jax.jit(jax.vmap(
        lambda p0, ys: levenberg_marquardt_while(f, p0, ys, 1.0)))(
            inits, yss)
    assert res.params.shape == (4, 3)
    npt.assert_allclose(res.params,
                        jnp.broadcast_to(true, (4, 3)), rtol=5e-2)
    assert bool(jnp.all(res.converged))


def test_mle_polynomial_batched_recovers_coeffs():
    from chirpgp_tpu.baselines import mle_polynomial_batched
    from chirpgp_tpu.toymodels import gen_chirp, polynomial_freq, \
        constant_mag

    dt, T, Xi = 1e-3, 1000, 0.01
    ts = jnp.linspace(dt, dt * T, T)
    true_coeffs = [10.0, 4.0]
    _, phase = polynomial_freq(true_coeffs)
    ys = gen_chirp(ts, constant_mag(1.0), phase)
    yss = jnp.stack([ys, ys])
    inits = jnp.broadcast_to(jnp.array([1.1, 9.5, 4.3]), (2, 3))
    res = mle_polynomial_batched(ts, yss, Xi, inits)
    npt.assert_allclose(res.params[:, 0], 1.0, rtol=1e-2)
    npt.assert_allclose(res.params[:, 1:],
                        jnp.broadcast_to(jnp.asarray(true_coeffs), (2, 2)),
                        rtol=1e-2)
