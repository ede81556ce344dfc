from vqvae_tpu.audio.mu_law import mu_law_decode, mu_law_encode  # noqa: F401
from vqvae_tpu.audio.framing import frame_batch  # noqa: F401
