from vqvae_tpu.ops.conv import (  # noqa: F401
    causal_conv_apply,
    conv1d_init,
    dense_init,
    strided_conv_apply,
    upsample_apply,
    upsample_init,
)
