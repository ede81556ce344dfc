"""Model-core unit tests (SURVEY.md §4.1): VQ argmin vs brute force, STE
gradient topology, loss values on tiny fixtures, decoder causality."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae_tpu.audio.framing import Batch
from vqvae_tpu.configs import get_config
from vqvae_tpu.models import forward, init_model
from vqvae_tpu.models.encoder import apply_encoder
from vqvae_tpu.models.vq import (
    ema_update, init_vq, init_vq_state, nearest_code, quantize, vq_losses,
)
from vqvae_tpu.models.wavenet import (
    apply_decoder, global_cond, upsample_cond,
)

CFG = get_config("tiny").model


def _rng(i=0):
    return jax.random.PRNGKey(i)


def test_vq_argmin_matches_brute_force():
    key = _rng(1)
    z = jax.random.normal(key, (7, 11, CFG.d))
    cb = jax.random.normal(_rng(2), (CFG.K, CFG.d))
    idx = nearest_code(z, cb)
    # brute force over full pairwise distances
    d2 = jnp.sum((z[..., None, :] - cb) ** 2, axis=-1)
    assert jnp.array_equal(idx, jnp.argmin(d2, axis=-1))


def test_vq_straight_through_gradients():
    """STE: dL/dz equals the cotangent applied at e_st; codebook gets no
    gradient through the quantisation path (SURVEY.md §3.3)."""
    params = init_vq(_rng(3), CFG)
    z = jax.random.normal(_rng(4), (5, CFG.d))

    def loss_through_est(z, cb):
        e_st, _, _ = quantize({"codebook": cb}, z)
        return jnp.sum(jnp.sin(e_st))

    gz, gcb = jax.grad(loss_through_est, argnums=(0, 1))(
        z, params["codebook"])
    _, _, idx = quantize(params, z)
    e = params["codebook"][idx]
    # the decoder-side cotangent (cos(e)) lands on z verbatim
    assert jnp.allclose(gz, jnp.cos(e), atol=1e-6)
    assert jnp.allclose(gcb, 0.0)


def test_vq_losses_tiny_fixture():
    z = jnp.array([[1.0, 0.0], [0.0, 2.0]])
    e = jnp.array([[0.0, 0.0], [0.0, 1.0]])
    loss2, loss3 = vq_losses(z, e)
    assert np.isclose(float(loss2), (1.0 + 1.0) / 4)
    assert float(loss2) == float(loss3)
    # gradient routing: loss2 hits only e, loss3 only z
    g = jax.grad(lambda zz, ee: vq_losses(zz, ee)[0], argnums=(0, 1))(z, e)
    assert jnp.allclose(g[0], 0.0) and not jnp.allclose(g[1], 0.0)
    g = jax.grad(lambda zz, ee: vq_losses(zz, ee)[1], argnums=(0, 1))(z, e)
    assert not jnp.allclose(g[0], 0.0) and jnp.allclose(g[1], 0.0)


def test_encoder_shapes():
    cfg = CFG
    params = init_model(_rng(5), cfg)
    wav = jax.random.uniform(_rng(6), (2, 1024), minval=-1, maxval=1)
    z = apply_encoder(params["encoder"], cfg, wav)
    assert z.shape == (2, 1024 // cfg.hop, cfg.d)
    assert z.dtype == jnp.float32


def test_decoder_shapes_and_finite():
    cfg = CFG
    params = init_model(_rng(7), cfg)
    B, T = 2, 256
    ids = jax.random.randint(_rng(8), (B, T), 0, cfg.mu)
    e = jax.random.normal(_rng(9), (B, T // cfg.hop, cfg.d))
    cond = upsample_cond(params["decoder"], cfg, e)
    assert cond.shape == (B, T, cfg.d)
    spk = jnp.array([0, 1])
    logits = apply_decoder(params["decoder"], cfg, ids, cond, spk)
    assert logits.shape == (B, T, cfg.mu)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_decoder_causality():
    """logits[t] must not depend on inputs at t' > t."""
    cfg = CFG
    params = init_model(_rng(10), cfg)
    B, T, t0 = 1, 128, 64
    ids = jax.random.randint(_rng(11), (B, T), 0, cfg.mu)
    cond = jnp.zeros((B, T, cfg.d))
    spk = jnp.zeros((B,), jnp.int32)
    base = apply_decoder(params["decoder"], cfg, ids, cond, spk)
    ids2 = ids.at[0, t0].set((ids[0, t0] + 128) % cfg.mu)
    pert = apply_decoder(params["decoder"], cfg, ids2, cond, spk)
    # unchanged strictly before t0, changed at t0 (kernel-2 conv sees x[t])
    assert jnp.allclose(base[:, :t0], pert[:, :t0], atol=1e-6)
    assert not jnp.allclose(base[:, t0], pert[:, t0], atol=1e-6)


def test_speaker_conditioning_changes_output():
    cfg = CFG
    params = init_model(_rng(12), cfg)
    ids = jax.random.randint(_rng(13), (1, 64), 0, cfg.mu)
    cond = jnp.zeros((1, 64, cfg.d))
    l0 = apply_decoder(params["decoder"], cfg, ids, cond,
                       jnp.array([0]))
    l1 = apply_decoder(params["decoder"], cfg, ids, cond,
                       jnp.array([1]))
    assert not jnp.allclose(l0, l1)


def test_forward_losses_and_grads():
    cfg = get_config("tiny")
    params = init_model(_rng(14), cfg.model)
    B, T = 2, cfg.data.length
    wav = jax.random.uniform(_rng(15), (B, T + 1), minval=-1, maxval=1)
    from vqvae_tpu.audio import frame_batch
    batch = frame_batch(wav, jnp.array([0, 1]), cfg.model.mu)

    def loss_fn(p):
        loss, (metrics, _) = forward(p, cfg.model, batch)
        return loss, metrics

    (loss, metrics), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    # untrained 256-way CE should start near ln(256)
    assert abs(float(metrics["loss1"]) - np.log(256)) < 1.0
    assert float(metrics["loss2"]) >= 0 and float(metrics["loss3"]) >= 0
    # every parameter leaf receives a finite gradient; codebook grad comes
    # only from loss2 (nonzero), encoder grad flows through the STE
    flat = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in flat)
    assert float(jnp.sum(jnp.abs(grads["vq"]["codebook"]))) > 0
    enc_norm = sum(float(jnp.sum(jnp.abs(g))) for g in
                   jax.tree_util.tree_leaves(grads["encoder"]))
    assert enc_norm > 0


def test_ema_update_moves_codebook_toward_assignments():
    cfg = CFG
    params = init_vq(_rng(16), cfg)
    state = init_vq_state(params)
    z = jnp.tile(params["codebook"][3] + 0.1, (64, 1))
    idx = nearest_code(z, params["codebook"])
    new_params, new_state = ema_update(params, state, z, idx, cfg)
    moved = new_params["codebook"][3] - params["codebook"][3]
    # row 3 moves toward the assigned cluster mean
    assert float(jnp.dot(moved, (z[0] - params["codebook"][3]))) > 0
    assert new_state.count[3] > state.count[3]


def test_code_perplexity():
    from vqvae_tpu.models.vq import code_perplexity
    # uniform usage over 4 codes -> perplexity 4
    idx = jnp.array([0, 1, 2, 3] * 8)
    assert abs(float(code_perplexity(idx, 8)) - 4.0) < 1e-4
    # collapsed usage -> perplexity 1
    idx = jnp.zeros((32,), jnp.int32)
    assert abs(float(code_perplexity(idx, 8)) - 1.0) < 1e-4


def test_restart_dead_codes():
    from vqvae_tpu.models.vq import restart_dead_codes
    import dataclasses
    cfg = dataclasses.replace(CFG, ema=True, code_restart_threshold=0.5)
    params = init_vq(_rng(20), cfg)
    state = init_vq_state(params)
    # mark half the codes dead, half alive
    count = jnp.where(jnp.arange(cfg.K) < cfg.K // 2, 0.0, 10.0)
    state = state._replace(count=count)
    z = jax.random.normal(_rng(21), (100, cfg.d)) + 5.0  # recognisable
    new_params, new_state = restart_dead_codes(
        params, state, z, _rng(22), cfg)
    cb = new_params["codebook"]
    # dead rows re-seeded near the z cluster (mean ~5), alive untouched
    assert float(jnp.mean(cb[: cfg.K // 2])) > 3.0
    assert jnp.allclose(cb[cfg.K // 2:], params["codebook"][cfg.K // 2:])
    assert float(new_state.count[0]) == 0.5


def test_remat_matches_no_remat():
    """remat=True recomputes but must not change values or break grads."""
    import dataclasses
    cfg_a = CFG
    cfg_b = dataclasses.replace(CFG, remat=True)
    params = init_model(_rng(30), cfg_a)
    ids = jax.random.randint(_rng(31), (2, 128), 0, cfg_a.mu)
    cond = jax.random.normal(_rng(32), (2, 128, cfg_a.d))
    spk = jnp.array([0, 1])
    la = apply_decoder(params["decoder"], cfg_a, ids, cond, spk)
    lb = apply_decoder(params["decoder"], cfg_b, ids, cond, spk)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               rtol=1e-6, atol=1e-6)

    def loss(p):
        return jnp.mean(apply_decoder(p, cfg_b, ids, cond, spk) ** 2)

    g = jax.grad(loss)(params["decoder"])
    assert all(bool(jnp.all(jnp.isfinite(x)))
               for x in jax.tree_util.tree_leaves(g))
