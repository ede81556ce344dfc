"""Test harness: force CPU with 8 virtual devices so the data-parallel
mesh/pjit path is exercised without a TPU pod (SURVEY.md §4.3).

Note: the 'axon' TPU plugin on this machine ignores the JAX_PLATFORMS
env var, so the platform must be forced via jax.config before any
backend is initialised.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert len(jax.devices()) == 8, jax.devices()
