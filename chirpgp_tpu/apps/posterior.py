"""Bayesian hyperparameter posteriors over the filter-marginal likelihood.

The BASELINE.json scale-out additions: NUTS chains and SMC marginal-
likelihood estimates over the chirp model's hyperparameters, built on the
same ``IFEstimationConfig`` pipelines as point MLE.
"""

from typing import Optional

import jax
import jax.numpy as jnp

from chirpgp_tpu.apps.pipeline import IFEstimationConfig, make_nll_fn
from chirpgp_tpu.infer.nuts import nuts_sample, nuts_sample_sharded, NUTSResult
from chirpgp_tpu.infer.smc import bootstrap_filter
from chirpgp_tpu.models import g

__all__ = ["make_logposterior", "sample_hyperposterior",
           "sample_hyperposterior_sharded", "smc_nll"]


def make_logposterior(cfg: IFEstimationConfig, ys: jnp.ndarray,
                      prior_scale: float = 10.0):
    """Unnormalized log posterior over unconstrained theta:
    ``-filter_nll(g(theta)) + log N(theta; 0, prior_scale^2 I)``.

    The weak Gaussian prior on the softplus-reparametrized parameters
    regularizes the directions the likelihood leaves flat (the reference's
    L-BFGS runs diverge exactly there and get recorded as NaN)."""
    nll = make_nll_fn(cfg, ys)

    def logpost(theta):
        return -nll(theta) - 0.5 * jnp.sum((theta / prior_scale) ** 2)

    return logpost


def sample_hyperposterior(cfg: IFEstimationConfig, ys: jnp.ndarray, key,
                          init_theta: Optional[jnp.ndarray] = None,
                          num_samples: int = 500, num_warmup: int = 300,
                          **nuts_kwargs) -> NUTSResult:
    """Single-chain NUTS over the hyperparameter posterior."""
    if init_theta is None:
        init_theta = cfg.default_init_theta()
    logpost = make_logposterior(cfg, ys)
    return nuts_sample(logpost, init_theta, key, num_samples=num_samples,
                       num_warmup=num_warmup, **nuts_kwargs)


def sample_hyperposterior_sharded(cfg: IFEstimationConfig, ys: jnp.ndarray,
                                  key, mesh, num_chains: int,
                                  init_theta: Optional[jnp.ndarray] = None,
                                  num_samples: int = 500,
                                  num_warmup: int = 300,
                                  jitter: float = 0.1,
                                  **nuts_kwargs) -> NUTSResult:
    """Mesh-sharded multi-chain NUTS with cross-chain step adaptation."""
    if init_theta is None:
        init_theta = cfg.default_init_theta()
    logpost = make_logposterior(cfg, ys)
    k_init, k_chains = jax.random.split(key)
    inits = init_theta + jitter * jax.random.normal(
        k_init, (num_chains,) + init_theta.shape, init_theta.dtype)
    keys = jax.random.split(k_chains, num_chains)
    return nuts_sample_sharded(logpost, inits, keys, mesh,
                               num_samples=num_samples,
                               num_warmup=num_warmup, **nuts_kwargs)


def smc_nll(cfg: IFEstimationConfig, params, ys: jnp.ndarray, key,
            num_particles: int = 1024):
    """Particle (SMC) estimate of the negative log marginal likelihood at
    fixed constrained params -- an unbiased cross-check of the Gaussian
    filters' NLL."""
    pack = cfg.build(params)
    res = bootstrap_filter(pack.m_and_cov, pack.H, cfg.Xi, pack.m0,
                           pack.P0, cfg.dt, ys, key,
                           num_particles=num_particles)
    return -res.log_ml[-1], res
