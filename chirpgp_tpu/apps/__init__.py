"""End-to-end applications: toymodel pipelines, real-data analyses."""

from chirpgp_tpu.apps.pipeline import (
    IFEstimationConfig, make_nll_fn, fit_mle, estimate_if, run_pipeline)

__all__ = ["IFEstimationConfig", "make_nll_fn", "fit_mle", "estimate_if",
           "run_pipeline"]
