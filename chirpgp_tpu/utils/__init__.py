"""Shared numerical utilities: LTI discretization, simulators, metrics."""

from chirpgp_tpu.utils.lti import lti_sde_to_disc
from chirpgp_tpu.utils.sim import (
    simulate_lgssm, simulate_sde, simulate_sde_init,
    simulate_function_parametrised_sde)
from chirpgp_tpu.utils.metrics import (
    rmse, fwd_transformed_pdf, chol_partial_const_diag)
from chirpgp_tpu.utils.numerics import phi1, ou_variance, psd_cholesky
from chirpgp_tpu.utils.timing import (
    TimingResult, time_jitted, wall_timer, profile_trace)

__all__ = [
    "lti_sde_to_disc",
    "simulate_lgssm", "simulate_sde", "simulate_sde_init",
    "simulate_function_parametrised_sde",
    "rmse", "fwd_transformed_pdf", "chol_partial_const_diag",
    "phi1", "ou_variance", "psd_cholesky",
    "TimingResult", "time_jitted", "wall_timer", "profile_trace",
]
