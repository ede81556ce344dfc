"""Sequence-parallel causal conv: halo exchange over 8 shards must be
numerically identical to the unsharded op."""

import jax
import jax.numpy as jnp
import numpy as np

from vqvae_tpu.ops.conv import causal_conv_apply, conv1d_init
from vqvae_tpu.parallel.mesh import make_mesh
from vqvae_tpu.parallel.sharded_conv import (
    sharded_causal_conv, time_sharding,
)


def test_sharded_causal_conv_matches_unsharded():
    mesh = make_mesh()  # 8 devices on 'data'
    B, T, C = 2, 1024, 16
    params = conv1d_init(jax.random.PRNGKey(0), C, C, 2)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, C))
    for dilation in (1, 4, 64, 128):  # up to T/n = 128
        ref = causal_conv_apply(params, x, dilation)
        xs = jax.device_put(x, time_sharding(mesh))
        got = sharded_causal_conv(params, xs, dilation, mesh)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)


def test_sharded_conv_output_stays_sharded():
    mesh = make_mesh()
    params = conv1d_init(jax.random.PRNGKey(0), 8, 8, 2)
    x = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (1, 512, 8)),
        time_sharding(mesh))
    y = sharded_causal_conv(params, x, 16, mesh)
    assert y.sharding.spec == time_sharding(mesh).spec


def test_sharded_conv_jit_composes():
    """Halo conv composes under jit with other sharded ops (a 2-layer
    stack), still matching the unsharded stack."""
    mesh = make_mesh()
    p1 = conv1d_init(jax.random.PRNGKey(0), 8, 8, 2)
    p2 = conv1d_init(jax.random.PRNGKey(1), 8, 8, 2)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 512, 8))

    def stack_ref(x):
        h = jax.nn.relu(causal_conv_apply(p1, x, 2))
        return causal_conv_apply(p2, h, 32)

    @jax.jit
    def stack_sharded(xs):
        h = jax.nn.relu(sharded_causal_conv(p1, xs, 2, mesh))
        return sharded_causal_conv(p2, h, 32, mesh)

    xs = jax.device_put(x, time_sharding(mesh))
    np.testing.assert_allclose(np.asarray(stack_sharded(xs)),
                               np.asarray(stack_ref(x)),
                               rtol=1e-5, atol=1e-6)


def test_sp_decoder_matches_unsharded():
    """The WHOLE teacher-forced decoder stack under time sharding ==
    apply_decoder on the gathered sequence (per-layer halo exchange,
    1-frame halo for the input conv, pointwise everything else)."""
    import jax.numpy as jnp
    from vqvae_tpu.configs import get_config
    from vqvae_tpu.models import init_model
    from vqvae_tpu.models.wavenet import apply_decoder, upsample_cond
    from vqvae_tpu.parallel.mesh import make_mesh
    from vqvae_tpu.parallel.sp_decoder import apply_decoder_sp

    cfg = get_config("tiny").model   # max dilation 512
    params = init_model(jax.random.PRNGKey(0), cfg)
    B, T = 2, 4096
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, cfg.mu)
    e = jax.random.normal(jax.random.PRNGKey(2),
                          (B, T // cfg.hop, cfg.d))
    cond = upsample_cond(params["decoder"], cfg, e)
    spk = jnp.arange(B) % cfg.n_speakers

    ref = apply_decoder(params["decoder"], cfg, ids, cond, spk)
    for n in (2, 4):  # 4096/4 = 1024 >= max dil 512
        mesh = make_mesh(data=n, model=1,
                         devices=jax.devices()[:n])
        got = apply_decoder_sp(params, cfg, ids, cond, spk, mesh)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"SP mismatch at n={n}")


def test_sp_decoder_rejects_oversized_dilation():
    import jax.numpy as jnp
    import pytest
    from vqvae_tpu.configs import get_config
    from vqvae_tpu.models import init_model
    from vqvae_tpu.parallel.mesh import make_mesh
    from vqvae_tpu.parallel.sp_decoder import apply_decoder_sp

    cfg = get_config("tiny").model
    params = init_model(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(data=8, model=1)
    ids = jnp.zeros((1, 1024), jnp.int32)   # 1024/8 = 128 < 512
    cond = jnp.zeros((1, 1024, cfg.d))
    with pytest.raises(AssertionError):
        apply_decoder_sp(params, cfg, ids, cond,
                         jnp.zeros((1,), jnp.int32), mesh)
