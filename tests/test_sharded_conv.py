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
