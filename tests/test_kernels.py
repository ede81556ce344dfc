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


# ---- fused gated-residual TRAINING kernel (interpret mode on CPU) ----


@pytest.mark.parametrize("kernel", ["pallas", "pallas_sg"])
def test_train_stack_pallas_matches_xla_fwd_and_grads(kernel):
    """decoder_kernel='pallas' (chunked fused stack + recomputing
    custom-vjp) / 'pallas_sg' (gates saved to HBM, no u-recompute) ==
    the lax layer loop: identical loss and near-identical gradients
    for EVERY parameter leaf."""
    import dataclasses
    from vqvae_tpu.audio.framing import frame_batch
    from vqvae_tpu.models import forward

    cfg_x = get_config("tiny").model     # L=10 -> one chunk
    cfg_p = dataclasses.replace(cfg_x, decoder_kernel=kernel)
    params = init_model(jax.random.PRNGKey(0), cfg_x)
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.uniform(-0.9, 0.9, (2, 1025)), jnp.float32)
    batch = frame_batch(wav, jnp.asarray([0, 1]), cfg_x.mu)

    def loss_fn(cfg):
        return lambda p: forward(p, cfg, batch)[0]

    l_x, g_x = jax.value_and_grad(loss_fn(cfg_x))(params)
    l_p, g_p = jax.value_and_grad(loss_fn(cfg_p))(params)
    np.testing.assert_allclose(float(l_x), float(l_p), rtol=1e-6)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_x)[0],
            jax.tree_util.tree_flatten_with_path(g_p)[0]):
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-4 * scale + 1e-8,
            rtol=1e-3, err_msg=f"grad mismatch at {path}")


@pytest.mark.parametrize("kernel", ["pallas", "pallas_sg"])
def test_train_stack_pallas_multi_chunk(kernel):
    """A >MAX_CHUNK_LAYERS stack splits into chained chunk kernels and
    still matches the lax loop (exercises the inter-chunk h/skip/grad
    hand-off)."""
    import dataclasses
    cfg_x = get_config("tiny").model
    cfg_x = dataclasses.replace(cfg_x, n_loop=2, n_layer=8)  # L=16 -> 2
    cfg_p = dataclasses.replace(cfg_x, decoder_kernel=kernel)
    params = init_model(jax.random.PRNGKey(5), cfg_x)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 256), 0,
                             cfg_x.mu)
    Tl = 256 // cfg_x.hop
    e = jax.random.normal(jax.random.PRNGKey(2), (2, Tl, cfg_x.d))
    cond = upsample_cond(params["decoder"], cfg_x, e)
    spk = jnp.asarray([0, 1])

    def out_sum(cfg):
        def f(p):
            lg = apply_decoder(p["decoder"], cfg, ids, cond, spk)
            return jnp.sum(lg * jnp.cos(lg * 0.1))
        return f

    v_x, g_x = jax.value_and_grad(out_sum(cfg_x))(params)
    v_p, g_p = jax.value_and_grad(out_sum(cfg_p))(params)
    np.testing.assert_allclose(float(v_x), float(v_p), rtol=1e-5)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_x)[0],
            jax.tree_util.tree_flatten_with_path(g_p)[0]):
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-4 * scale + 1e-8,
            rtol=1e-3, err_msg=f"grad mismatch at {path}")


@pytest.mark.parametrize("kernel", ["pallas", "pallas_sg"])
def test_train_stack_pallas_embed_in_kernel(kernel):
    """embed_in_kernel=True: the first chunk computes the input
    embedding in-kernel (fused_stack_chunk_embed — ids + the [2,mu,R]
    table in, h/dh never in HBM) and still matches the lax loop:
    identical loss and near-identical gradients for every leaf,
    INCLUDING the embedding table/bias (the custom-vjp's one-hot
    contraction)."""
    import dataclasses
    from vqvae_tpu.audio.framing import frame_batch
    from vqvae_tpu.models import forward

    cfg_x = get_config("tiny").model     # L=10 -> one (embed) chunk
    cfg_p = dataclasses.replace(cfg_x, decoder_kernel=kernel,
                                embed_in_kernel=True)
    params = init_model(jax.random.PRNGKey(0), cfg_x)
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.uniform(-0.9, 0.9, (2, 1025)), jnp.float32)
    batch = frame_batch(wav, jnp.asarray([0, 1]), cfg_x.mu)

    def loss_fn(cfg):
        return lambda p: forward(p, cfg, batch)[0]

    l_x, g_x = jax.value_and_grad(loss_fn(cfg_x))(params)
    l_p, g_p = jax.value_and_grad(loss_fn(cfg_p))(params)
    np.testing.assert_allclose(float(l_x), float(l_p), rtol=1e-6)
    emb_leaves = 0
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_x)[0],
            jax.tree_util.tree_flatten_with_path(g_p)[0]):
        if "emb" in str(path):
            emb_leaves += 1
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-4 * scale + 1e-8,
            rtol=1e-3, err_msg=f"grad mismatch at {path}")
    assert emb_leaves >= 2   # the table AND bias grads were compared


def test_train_stack_pallas_embed_multi_chunk():
    """embed_in_kernel with a >MAX_CHUNK_LAYERS stack: the FIRST chunk
    is the embed kernel, the rest chain through fused_stack_chunk_acc
    — the embed chunk's h output must hand off exactly."""
    import dataclasses
    cfg_x = get_config("tiny").model
    cfg_x = dataclasses.replace(cfg_x, n_loop=2, n_layer=8)  # L=16 -> 2
    cfg_p = dataclasses.replace(cfg_x, decoder_kernel="pallas_sg",
                                embed_in_kernel=True)
    params = init_model(jax.random.PRNGKey(5), cfg_x)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 256), 0,
                             cfg_x.mu)
    Tl = 256 // cfg_x.hop
    e = jax.random.normal(jax.random.PRNGKey(2), (2, Tl, cfg_x.d))
    cond = upsample_cond(params["decoder"], cfg_x, e)
    spk = jnp.asarray([0, 1])

    def out_sum(cfg):
        def f(p):
            lg = apply_decoder(p["decoder"], cfg, ids, cond, spk)
            return jnp.sum(lg * jnp.cos(lg * 0.1))
        return f

    v_x, g_x = jax.value_and_grad(out_sum(cfg_x))(params)
    v_p, g_p = jax.value_and_grad(out_sum(cfg_p))(params)
    np.testing.assert_allclose(float(v_x), float(v_p), rtol=1e-5)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_x)[0],
            jax.tree_util.tree_flatten_with_path(g_p)[0]):
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-4 * scale + 1e-8,
            rtol=1e-3, err_msg=f"grad mismatch at {path}")


# ---- fused head + softmax-CE TRAINING kernel (interpret on CPU) ----


def _head_ce_setup(T=1024, B=2, seed=0):
    from vqvae_tpu.audio.framing import frame_batch
    cfg = get_config("tiny").model
    params = init_model(jax.random.PRNGKey(seed), cfg)
    rng = np.random.default_rng(seed)
    wav = jnp.asarray(rng.uniform(-0.9, 0.9, (B, T + 1)), jnp.float32)
    batch = frame_batch(wav, jnp.asarray(np.arange(B) % 4), cfg.mu)
    return cfg, params, batch


@pytest.mark.parametrize("tile", [None, 768])
def test_head_ce_pallas_matches_xla(tile, monkeypatch):
    """head_kernel='pallas' (fused head+CE, kernels/head_ce_pallas.py)
    == the XLA `_head`+logsumexp chain: same loss1 and near-identical
    gradients for every leaf, to bf16 tolerance (the kernel multiplies
    w2 in bf16; the XLA head in f32).  tile=768 forces the row-padding
    path (N=2048 pads to 2304)."""
    import dataclasses
    from vqvae_tpu.kernels import head_ce_pallas as hk
    from vqvae_tpu.models import forward

    if tile is not None:
        monkeypatch.setattr(hk, "TILE", tile)
    cfg_x, params, batch = _head_ce_setup()
    cfg_h = dataclasses.replace(cfg_x, head_kernel="pallas")

    def loss_fn(cfg):
        return lambda p: forward(p, cfg, batch)[0]

    l_x, g_x = jax.value_and_grad(loss_fn(cfg_x))(params)
    l_h, g_h = jax.value_and_grad(loss_fn(cfg_h))(params)
    np.testing.assert_allclose(float(l_x), float(l_h), rtol=1e-2)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_x)[0],
            jax.tree_util.tree_flatten_with_path(g_h)[0]):
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        np.testing.assert_allclose(
            np.asarray(b, np.float32), np.asarray(a, np.float32),
            atol=2e-2 * scale, rtol=5e-2,
            err_msg=f"grad mismatch at {path}")


def test_head_ce_pallas_composes_with_decoder_kernel():
    """head_kernel='pallas' stacks on decoder_kernel='pallas' (the
    shipping combination): full train-forward loss matches pure XLA."""
    import dataclasses
    from vqvae_tpu.models import forward

    cfg_x, params, batch = _head_ce_setup(seed=3)
    cfg_hp = dataclasses.replace(cfg_x, head_kernel="pallas",
                                 decoder_kernel="pallas")
    l_x = forward(params, cfg_x, batch)[0]
    l_hp = forward(params, cfg_hp, batch)[0]
    np.testing.assert_allclose(float(l_x), float(l_hp), rtol=1e-2)


def test_train_stack_pallas_windowed_bwd_matches_xla():
    """bwd_time_windows=2 (time-windowed recompute backward: sum(dils)
    halo recompute + dh spill carry, grid right-to-left) produces the
    same loss and gradients as the lax loop AND as the full-T backward
    — every param leaf, at the tiny config's full dilation spread
    (max dil 512, Tc=512)."""
    import dataclasses
    from vqvae_tpu.audio.framing import frame_batch
    from vqvae_tpu.models import forward

    cfg_x = get_config("tiny").model
    cfg_w = dataclasses.replace(cfg_x, decoder_kernel="pallas",
                                bwd_time_windows=2)
    cfg_f = dataclasses.replace(cfg_x, decoder_kernel="pallas")
    params = init_model(jax.random.PRNGKey(0), cfg_x)
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.uniform(-0.9, 0.9, (2, 1025)), jnp.float32)
    batch = frame_batch(wav, jnp.asarray([0, 1]), cfg_x.mu)

    def loss_fn(cfg):
        return lambda p: forward(p, cfg, batch)[0]

    l_x, g_x = jax.value_and_grad(loss_fn(cfg_x))(params)
    l_w, g_w = jax.value_and_grad(loss_fn(cfg_w))(params)
    l_f, g_f = jax.value_and_grad(loss_fn(cfg_f))(params)
    np.testing.assert_allclose(float(l_x), float(l_w), rtol=1e-6)
    for (path, a), (_, b), (_, c) in zip(
            jax.tree_util.tree_flatten_with_path(g_x)[0],
            jax.tree_util.tree_flatten_with_path(g_w)[0],
            jax.tree_util.tree_flatten_with_path(g_f)[0]):
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-4 * scale + 1e-8,
            rtol=1e-3, err_msg=f"grad mismatch vs lax at {path}")
        # windowed and full-T backwards do the same math in a
        # different schedule — they agree much tighter
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(c), atol=1e-5 * scale + 1e-8,
            rtol=1e-4, err_msg=f"windowed != full-T at {path}")


def test_train_stack_pallas_windowed_bwd_many_windows():
    """4 time windows on a small-dilation stack (max dil 32, Tc=64):
    the spill carry crosses three window boundaries per layer,
    including dil == window edge cases, and still matches the lax
    loop."""
    import dataclasses
    cfg_x = dataclasses.replace(get_config("tiny").model,
                                n_loop=1, n_layer=6)  # dils 1..32
    cfg_w = dataclasses.replace(cfg_x, decoder_kernel="pallas",
                                bwd_time_windows=4)
    params = init_model(jax.random.PRNGKey(7), cfg_x)
    ids = jax.random.randint(jax.random.PRNGKey(1), (3, 256), 0,
                             cfg_x.mu)
    Tl = 256 // cfg_x.hop
    e = jax.random.normal(jax.random.PRNGKey(2), (3, Tl, cfg_x.d))
    cond = upsample_cond(params["decoder"], cfg_x, e)
    spk = jnp.asarray([0, 1, 2])

    def out_sum(cfg):
        def f(p):
            lg = apply_decoder(p["decoder"], cfg, ids, cond, spk)
            return jnp.sum(lg * jnp.cos(lg * 0.1))
        return f

    v_x, g_x = jax.value_and_grad(out_sum(cfg_x))(params)
    v_w, g_w = jax.value_and_grad(out_sum(cfg_w))(params)
    np.testing.assert_allclose(float(v_x), float(v_w), rtol=1e-5)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_x)[0],
            jax.tree_util.tree_flatten_with_path(g_w)[0]):
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-4 * scale + 1e-8,
            rtol=1e-3, err_msg=f"grad mismatch at {path}")


@pytest.mark.parametrize("kernel,windows", [("pallas", 0),
                                            ("pallas_sg", 0),
                                            ("pallas", 2)])
def test_train_stack_pallas_remat(kernel, windows):
    """cfg.remat wraps the chunk kernels in jax.checkpoint without
    changing values — including the time-windowed backward."""
    import dataclasses
    from vqvae_tpu.audio.framing import frame_batch
    from vqvae_tpu.models import forward
    cfg_p = dataclasses.replace(get_config("tiny").model,
                                decoder_kernel=kernel,
                                bwd_time_windows=windows)
    cfg_r = dataclasses.replace(cfg_p, remat=True)
    params = init_model(jax.random.PRNGKey(0), cfg_p)
    rng = np.random.default_rng(1)
    wav = jnp.asarray(rng.uniform(-0.9, 0.9, (2, 1025)), jnp.float32)
    batch = frame_batch(wav, jnp.asarray([0, 1]), cfg_p.mu)
    l_p, g_p = jax.value_and_grad(
        lambda p: forward(p, cfg_p, batch)[0])(params)
    l_r, g_r = jax.value_and_grad(
        lambda p: forward(p, cfg_r, batch)[0])(params)
    np.testing.assert_allclose(float(l_p), float(l_r), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_p),
                    jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6)


# ---- fused strided-conv ENCODER kernel (interpret mode on CPU) ----


def test_encoder_pallas_matches_xla_fwd_and_grads():
    """encoder_kernel='pallas' (whole stack in one fused kernel) ==
    the XLA layer loop: same z_e and near-identical gradients for every
    encoder leaf (incl. the conv-weight pack/unpack adjoint)."""
    import dataclasses
    from vqvae_tpu.models.encoder import apply_encoder, init_encoder

    cfg_x = get_config("tiny").model      # 6 layers, Ce=32, d=16
    cfg_p = dataclasses.replace(cfg_x, encoder_kernel="pallas")
    params = {"encoder": init_encoder(jax.random.PRNGKey(3), cfg_x)}
    wav = jax.random.uniform(jax.random.PRNGKey(1), (4, 1024),
                             minval=-0.9, maxval=0.9)

    def out(cfg):
        def f(p):
            z = apply_encoder(p["encoder"], cfg, wav)
            return jnp.sum(z * jnp.cos(z * 0.3)), z
        return f

    (v_x, z_x), g_x = jax.value_and_grad(out(cfg_x), has_aux=True)(params)
    (v_p, z_p), g_p = jax.value_and_grad(out(cfg_p), has_aux=True)(params)
    assert z_p.shape == z_x.shape and z_p.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(z_p), np.asarray(z_x),
                               rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(float(v_p), float(v_x), rtol=1e-3)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_x)[0],
            jax.tree_util.tree_flatten_with_path(g_p)[0]):
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-3 * scale + 1e-8,
            rtol=2e-2, err_msg=f"grad mismatch at {path}")


def test_encoder_pallas_in_full_forward():
    """The fused encoder composes with the full VQ-VAE forward/backward
    (loss finite, grads flow to every encoder leaf)."""
    import dataclasses
    from vqvae_tpu.audio.framing import frame_batch
    from vqvae_tpu.models import forward

    cfg = dataclasses.replace(get_config("tiny").model,
                              encoder_kernel="pallas")
    params = init_model(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.uniform(-0.9, 0.9, (2, 1025)), jnp.float32)
    batch = frame_batch(wav, jnp.asarray([0, 1]), cfg.mu)
    loss, grads = jax.value_and_grad(
        lambda p: forward(p, cfg, batch)[0])(params)
    assert np.isfinite(float(loss))
    for leaf in jax.tree_util.tree_leaves(grads["encoder"]):
        assert np.isfinite(np.asarray(leaf)).all()
        assert float(jnp.max(jnp.abs(leaf))) > 0
