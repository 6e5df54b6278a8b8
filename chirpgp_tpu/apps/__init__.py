"""End-to-end applications: toymodel pipelines, real-data analyses."""

from chirpgp_tpu.apps.pipeline import (
    IFEstimationConfig, make_nll_fn, fit_mle, estimate_if,
    estimate_if_batched, run_pipeline)
from chirpgp_tpu.apps.sweeps import (
    generate_rnd_keys, toymodel_measurements, mc_mle_sweep,
    print_rmse_table, MAGNITUDES)
from chirpgp_tpu.apps.crlb import filter_error_mc
from chirpgp_tpu.apps.kpt import (
    KPT_INIT_PARAMS, kpt_filter, kpt_smooth, kpt_mle, kpt_if_estimate)
from chirpgp_tpu.apps.realdata import (
    BatCallConfig, EPTESICUS, MYOTIS, analyze_bat_call, ligo_config,
    analyze_ligo, standardize, load_wav, load_ligo_strain)
from chirpgp_tpu.apps.posterior import (
    make_logposterior, sample_hyperposterior, sample_hyperposterior_sharded,
    smc_nll)

__all__ = [
    "IFEstimationConfig", "make_nll_fn", "fit_mle", "estimate_if",
    "estimate_if_batched", "run_pipeline",
    "generate_rnd_keys", "toymodel_measurements", "mc_mle_sweep",
    "print_rmse_table", "MAGNITUDES",
    "filter_error_mc",
    "KPT_INIT_PARAMS", "kpt_filter", "kpt_smooth", "kpt_mle",
    "kpt_if_estimate",
    "BatCallConfig", "EPTESICUS", "MYOTIS", "analyze_bat_call",
    "ligo_config", "analyze_ligo", "standardize", "load_wav",
    "load_ligo_strain",
    "make_logposterior", "sample_hyperposterior",
    "sample_hyperposterior_sharded", "smc_nll",
]
