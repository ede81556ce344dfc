from vqvae_tpu.infer.fastgen import (  # noqa: F401
    decode_from_codes,
    generate_ids,
    synthesize,
    teacher_forced_scan_logits,
)
from vqvae_tpu.infer.enc_streaming import (  # noqa: F401
    StreamingEncoder,
)
from vqvae_tpu.infer.parallel import (  # noqa: F401
    decode_from_codes_sharded,
)
