"""Test harness: force CPU with 8 virtual devices so the data-parallel
mesh/pjit path is exercised without a TPU pod (SURVEY.md §4.3).

Note: the 'axon' TPU plugin on this machine ignores the JAX_PLATFORMS
env var, so the platform must be forced via jax.config before any
backend is initialised.

``VQVAE_TESTS_TPU=1`` skips the CPU forcing so the TPU-gated tests
(in-kernel PRNG sampling, the Pallas decode CLI, the 3k-step quality
run) execute on the real chip:
``VQVAE_TESTS_TPU=1 pytest tests/test_quality.py tests/test_kernels.py
-k sampling`` — expect first-compile minutes; don't run the full CPU
suite this way (interpret-mode kernels are pathological to compile on
real TPU).
"""

import os

if os.environ.get("VQVAE_TESTS_TPU") == "1":
    # no matmul-precision override here: the TPU lane must run the
    # PRODUCT's numerics (forcing "highest" changes every training
    # trajectory — measured: the 6k quality run lands at band corr
    # 0.61 under "highest" vs 1.000 at default precision)
    pass
else:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    assert len(jax.devices()) == 8, jax.devices()
