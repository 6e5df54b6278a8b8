"""Test configuration: run on CPU with 8 virtual XLA devices (to exercise
mesh/sharding code without a TPU pod) and float64 enabled (to compare
against exact linear-Gaussian oracles, mirroring the reference's CI setup:
``.github/workflows/unittest.yml`` runs pytest on ``jax[cpu]``)."""

import os

# Must be set before the first jax backend initialization.  Note: this
# environment pre-registers an experimental TPU platform plugin via
# sitecustomize and exports JAX_PLATFORMS=axon, so the env var must be
# overridden through jax.config (which wins over the plugin), not setdefault.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
