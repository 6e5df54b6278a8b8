"""Shared numerical utilities: LTI discretization, simulators, metrics."""

from chirpgp_tpu.utils.lti import lti_sde_to_disc
from chirpgp_tpu.utils.sim import (
    simulate_lgssm, simulate_sde, simulate_sde_init,
    simulate_function_parametrised_sde)
from chirpgp_tpu.utils.metrics import (
    rmse, fwd_transformed_pdf, chol_partial_const_diag)

__all__ = [
    "lti_sde_to_disc",
    "simulate_lgssm", "simulate_sde", "simulate_sde_init",
    "simulate_function_parametrised_sde",
    "rmse", "fwd_transformed_pdf", "chol_partial_const_diag",
]
