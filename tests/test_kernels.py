"""Pallas kernels shadowed by their lax reference implementations
(SURVEY.md §7 stage 6: 'each kernel shadowed by its lax reference')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae_tpu.configs import get_config
from vqvae_tpu.kernels.vq_pallas import vq_argmin_pallas
from vqvae_tpu.models.vq import nearest_code, quantize


def test_vq_pallas_matches_lax():
    key = jax.random.PRNGKey(0)
    for N, K, d in ((100, 128, 16), (512, 512, 64), (1921, 512, 64)):
        kz, kc = jax.random.split(jax.random.fold_in(key, N))
        z = jax.random.normal(kz, (N, d))
        cb = jax.random.normal(kc, (K, d))
        ref = nearest_code(z, cb, impl="lax")
        got = vq_argmin_pallas(z, cb)
        # ties are possible in principle but measure-zero with random
        # floats; require exact agreement
        assert jnp.array_equal(ref, got), \
            f"mismatch at N={N}: {int(jnp.sum(ref != got))} rows"


def test_vq_pallas_through_quantize():
    cfg = get_config("tiny").model
    z = jax.random.normal(jax.random.PRNGKey(1), (4, 7, cfg.d))
    cb = jax.random.normal(jax.random.PRNGKey(2), (cfg.K, cfg.d))
    e_lax, _, i_lax = quantize({"codebook": cb}, z, impl="lax")
    e_pal, _, i_pal = quantize({"codebook": cb}, z, impl="pallas")
    assert jnp.array_equal(i_lax, i_pal)
    assert jnp.allclose(e_lax, e_pal)


def test_vq_pallas_grad_structure():
    """STE is preserved when the pallas kernel picks the indices."""
    cfg = get_config("tiny").model
    z = jax.random.normal(jax.random.PRNGKey(3), (8, cfg.d))
    cb = jax.random.normal(jax.random.PRNGKey(4), (cfg.K, cfg.d))

    def loss(z, cb):
        e_st, _, _ = quantize({"codebook": cb}, z, impl="pallas")
        return jnp.sum(e_st ** 2)

    gz, gcb = jax.grad(loss, argnums=(0, 1))(z, cb)
    _, _, idx = quantize({"codebook": cb}, z, impl="pallas")
    np.testing.assert_allclose(np.asarray(gz), np.asarray(2 * cb[idx]),
                               rtol=1e-5)
    assert jnp.allclose(gcb, 0.0)
