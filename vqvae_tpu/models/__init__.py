from vqvae_tpu.models.vqvae import (  # noqa: F401
    init_model,
    init_vq_state,
    forward,
)
