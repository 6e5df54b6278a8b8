"""Filter-error Monte-Carlo and posterior Cramer--Rao bound jobs.

Reference: ``tetralith/jobs/crlb_ekf.py`` / ``crlb_ghf.py`` (paper Fig 5):
simulate N trajectories of the chirp SDE at fixed parameters, filter every
measurement sequence, and reduce per-time-step squared errors on the chirp
and V components.  The reference runs N=1e6 on a 20-core/130GB Slurm node;
here the MC axis is vmapped per device and sharded over the mesh, with the
error reduction done by ``psum`` (SURVEY.md 3.4) so N scales with the mesh.
"""

import math
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from chirpgp_tpu.infer import ekf, sgp_filter
from chirpgp_tpu.models import model_chirp, disc_chirp_lcd
from chirpgp_tpu.quad import SigmaPoints, gauss_hermite
from chirpgp_tpu.utils import simulate_sde

__all__ = ["filter_error_mc"]


def filter_error_mc(lam: float, b: float, delta: float, ell: float,
                    sigma: float, Xi: float, num_mcs: int,
                    method: str = "ghf", dt: float = 0.01, T: int = 500,
                    gh_order: int = 3, key=None, mesh=None) -> Dict[str, np.ndarray]:
    """Per-time-step mean/std of squared filter errors over ``num_mcs``
    simulated trajectories (reference ``crlb_ekf.py:28-97``; defaults
    dt=0.01, T=500 as in ``crlb_ekf.py:27-28``).

    Returns host arrays ``mean_err_x2``/``std_err_x2`` (chirp component)
    and ``mean_err_v``/``std_err_v`` (frequency state).
    """
    if key is None:
        key = jax.random.PRNGKey(2022)
    _, _, m0, P0, H = model_chirp(lam, b, ell, sigma, delta)
    trans = disc_chirp_lcd(lam, b, ell, sigma)
    sgps = gauss_hermite(d=4, order=gh_order)

    def per_seed(k):
        k_traj, k_noise = jax.random.split(k)
        traj = simulate_sde(trans, m0, P0, dt, T, k_traj)
        ys = traj @ H + math.sqrt(Xi) * jax.random.normal(k_noise, (T,))
        if method == "ghf":
            mfs, _, _ = sgp_filter(trans, sgps, H, Xi, m0, P0, dt, ys)
        elif method == "ekf":
            mfs, _, _ = ekf(trans, H, Xi, m0, P0, dt, ys)
        else:
            raise ValueError(f"Unknown method {method!r}")
        err_x2 = (mfs[:, 1] - traj[:, 1]) ** 2
        err_v = (mfs[:, 2] - traj[:, 2]) ** 2
        return dict(err_x2=err_x2, err_v=err_v,
                    err_x2_sq=err_x2 ** 2, err_v_sq=err_v ** 2)

    keys = jax.random.split(key, num_mcs)
    if mesh is not None:
        from chirpgp_tpu.parallel import sharded_mean
        means = sharded_mean(per_seed, keys, mesh)
    else:
        out = jax.jit(jax.vmap(per_seed))(keys)
        means = jax.tree_util.tree_map(lambda x: jnp.mean(x, axis=0), out)
    means = jax.device_get(means)
    var_x2 = np.maximum(means["err_x2_sq"] - means["err_x2"] ** 2, 0.0)
    var_v = np.maximum(means["err_v_sq"] - means["err_v"] ** 2, 0.0)
    return dict(mean_err_x2=np.asarray(means["err_x2"]),
                std_err_x2=np.sqrt(var_x2),
                mean_err_v=np.asarray(means["err_v"]),
                std_err_v=np.sqrt(var_v))
