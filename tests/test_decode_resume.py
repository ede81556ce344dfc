"""Resumable fused decode kernel == one-shot kernel, bit-exact.

The serving daemon decodes through ``generate_ids_pallas_resume``
(fixed-size cond pushes, ring-buffer state carried between calls);
its contract is that ANY CHUNK-aligned split of the cond stream
reproduces the one-shot ``generate_ids_pallas`` ids exactly —
including the final ragged slice, which is zero-padded to CHUNK and
trimmed exactly as the one-shot kernel pads internally.

CPU runs the greedy chain (in-kernel PRNG is TPU-only); the sampled
chain is pinned by the TPU-gated test below plus bench.py's serving
witness.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae_tpu.configs import get_config
from vqvae_tpu.kernels.decode_pallas import (
    CHUNK,
    DecodeState,
    generate_ids_pallas,
    generate_ids_pallas_resume,
    init_decode_state,
)
from vqvae_tpu.models import init_model
from vqvae_tpu.models.wavenet import (
    global_cond,
    make_gen_params,
    upsample_cond,
)


def _setup(T, B=2, seed=0):
    cfg = get_config("tiny").model
    params = init_model(jax.random.PRNGKey(seed), cfg)
    k = jax.random.PRNGKey(seed + 1)
    Tl = (T + cfg.hop - 1) // cfg.hop
    e = jax.random.normal(k, (B, Tl, cfg.d))
    cond = upsample_cond(params["decoder"], cfg, e)[:, :T]
    spk = jnp.arange(B) % cfg.n_speakers
    gp = make_gen_params(params["decoder"], cfg)
    gcond = global_cond(params["decoder"], cfg, spk)
    return cfg, cond, gp, gcond


def _resume_ids(gp, cfg, cond, gcond, seed, greedy, pushes):
    """Drive the resumable kernel over ``pushes`` slice widths (the
    last may be ragged: it is zero-padded to CHUNK and trimmed)."""
    B, T, d = cond.shape
    assert sum(pushes) == T
    state = init_decode_state(cfg, B, gp.wff.dtype)
    out, off = [], 0
    for w in pushes:
        sl = cond[:, off:off + w]
        pad = (-w) % CHUNK
        if pad:
            sl = jnp.pad(sl, ((0, 0), (0, pad), (0, 0)))
        ids, state = generate_ids_pallas_resume(
            gp, cfg, sl, gcond, jnp.int32(seed), jnp.float32(1.0),
            state, greedy=greedy)
        out.append(ids[:, :w])
        off += w
    return jnp.concatenate(out, axis=1)


@pytest.mark.parametrize("pushes", [
    (256, 256),            # aligned halves
    (128, 384),            # uneven aligned
    (512,),                # single resumed call == one-shot directly
])
def test_resume_greedy_matches_oneshot_aligned(pushes):
    cfg, cond, gp, gcond = _setup(T=512)
    ref = generate_ids_pallas(gp, cfg, cond, gcond, jnp.int32(0),
                              jnp.float32(1.0), greedy=True)
    got = _resume_ids(gp, cfg, cond, gcond, 0, True, pushes)
    assert jnp.array_equal(ref, got)


def test_resume_greedy_ragged_tail():
    """T=300: one-shot pads to 384 internally; the resumable path
    pushes 256 aligned then a 44-sample padded tail — identical ids."""
    cfg, cond, gp, gcond = _setup(T=300)
    ref = generate_ids_pallas(gp, cfg, cond, gcond, jnp.int32(0),
                              jnp.float32(1.0), greedy=True)
    got = _resume_ids(gp, cfg, cond, gcond, 0, True, (256, 44))
    assert jnp.array_equal(ref, got)


def test_resume_rejects_unaligned_push():
    cfg, cond, gp, gcond = _setup(T=CHUNK)
    state = init_decode_state(cfg, 2, gp.wff.dtype)
    with pytest.raises(ValueError, match="multiple of"):
        generate_ids_pallas_resume(
            gp, cfg, cond[:, :CHUNK - 1], gcond, jnp.int32(0),
            jnp.float32(1.0), state, greedy=True)


def test_init_state_shapes():
    cfg = get_config("tiny").model
    st = init_decode_state(cfg, 3)
    assert isinstance(st, DecodeState)
    assert st.bufs.shape == (sum(cfg.dilations), 3,
                             cfg.residual_channels)
    assert st.xoh.shape == (3, cfg.mu)
    # xoh starts as the one-hot of digital silence
    assert int(jnp.argmax(st.xoh[0])) == cfg.mu // 2
    assert int(st.t0) == 0


@pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="pltpu.prng_* unsupported in CPU interpret mode; sampled "
           "resume parity runs on real TPU (VQVAE_TESTS_TPU=1)")
def test_resume_sampled_matches_oneshot_tpu():
    """Sampled chain: the resumed PRNG stream (seeded by absolute
    chunk number) draws the exact noise the one-shot kernel draws."""
    cfg, cond, gp, gcond = _setup(T=512)
    ref = generate_ids_pallas(gp, cfg, cond, gcond, jnp.int32(7),
                              jnp.float32(1.0))
    got = _resume_ids(gp, cfg, cond, gcond, 7, False, (256, 128, 128))
    assert jnp.array_equal(ref, got)
    got2 = _resume_ids(gp, cfg, cond, gcond, 8, False, (256, 256))
    assert not jnp.array_equal(ref, got2)  # seed still matters
