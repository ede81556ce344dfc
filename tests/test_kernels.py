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


# ---- fused AR decode kernel (interpret mode on CPU) ----

from vqvae_tpu.kernels.decode_pallas import (  # noqa: E402
    generate_ids_pallas, teacher_logits_pallas,
)
from vqvae_tpu.models import init_model  # noqa: E402
from vqvae_tpu.models.wavenet import (  # noqa: E402
    apply_decoder, global_cond, make_gen_params, upsample_cond,
)
from vqvae_tpu.infer.fastgen import generate_ids  # noqa: E402


def _decode_setup(T=300, B=2, seed=0):
    cfg = get_config("tiny").model
    params = init_model(jax.random.PRNGKey(seed), cfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed + 1))
    ids = jax.random.randint(k1, (B, T), 0, cfg.mu)
    Tl = (T + cfg.hop - 1) // cfg.hop
    e = jax.random.normal(k2, (B, Tl, cfg.d))
    cond = upsample_cond(params["decoder"], cfg, e)[:, :T]
    spk = jnp.arange(B) % cfg.n_speakers
    gp = make_gen_params(params["decoder"], cfg)
    gcond = global_cond(params["decoder"], cfg, spk)
    return cfg, params, ids, cond, spk, gp, gcond


def test_decode_pallas_teacher_parity():
    """Kernel teacher-forced logits == apply_decoder (§4.2a oracle);
    T=300 exercises the CHUNK padding path."""
    cfg, params, ids, cond, spk, gp, gcond = _decode_setup()
    ref = apply_decoder(params["decoder"], cfg, ids, cond, spk)
    got = teacher_logits_pallas(gp, cfg, ids, cond, gcond)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_decode_pallas_greedy_matches_lax():
    """Greedy self-feeding generation: pallas kernel ids == lax scan
    ids exactly (same argmax chain)."""
    cfg, params, ids, cond, spk, gp, gcond = _decode_setup()
    g_lax = generate_ids(params, cfg, cond, spk,
                         jax.random.PRNGKey(0), greedy=True)
    g_pal = generate_ids(params, cfg, cond, spk,
                         jax.random.PRNGKey(0), greedy=True,
                         impl="pallas")
    assert jnp.array_equal(g_lax, g_pal)


@pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="pltpu.prng_* unsupported in CPU interpret mode; sampling "
           "validated on real TPU (ids full-range, seed-sensitive)")
def test_decode_pallas_sampling_valid():
    cfg, params, ids, cond, spk, gp, gcond = _decode_setup(T=256)
    out = generate_ids_pallas(gp, cfg, cond, gcond, jnp.int32(3),
                              jnp.float32(1.0))
    assert out.shape == ids.shape
    assert int(out.min()) >= 0 and int(out.max()) < cfg.mu
    out2 = generate_ids_pallas(gp, cfg, cond, gcond, jnp.int32(4),
                               jnp.float32(1.0))
    assert not jnp.array_equal(out, out2)  # seed changes the stream
