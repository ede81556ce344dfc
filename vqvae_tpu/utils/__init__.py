from vqvae_tpu.utils.profiling import profile_trace, StepTimer  # noqa: F401
