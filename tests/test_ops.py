"""Op-rewrite equivalence tests: every TPU-motivated reformulation in
ops/ must match its straightforward lax reference (the shadow-impl rule,
SURVEY.md §7 stage 6)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from vqvae_tpu.ops.conv import upsample_apply, upsample_init
from vqvae_tpu.ops.embed import take_rows


def test_upsample_matmul_matches_conv_transpose():
    """The packed-matmul upsampler == lax.conv_transpose SAME."""
    for hop, Tl, d in ((64, 12, 16), (16, 7, 8)):
        p = upsample_init(jax.random.PRNGKey(0), d, d, hop, 2,
                          jnp.float32)
        z = jax.random.normal(jax.random.PRNGKey(1), (2, Tl, d))
        got = upsample_apply(p, z, hop)
        ref = lax.conv_transpose(
            z, p["w"], strides=(hop,), padding="SAME",
            dimension_numbers=("NHC", "HIO", "NHC")) + p["b"]
        assert got.shape == ref.shape == (2, Tl * hop, d)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def _upsample_overlap_add(params, z, hop):
    """The round-1..4 einsum+overlap-add formulation, kept inline as the
    shadow reference for the packed-matmul rewrite (round 5): the
    zero-padded tap blocks of the packed weights contribute exact zeros
    to each f32 accumulation, so values must match BITWISE."""
    w = params["w"]
    K, cin, cout = w.shape
    B, Tl, _ = z.shape
    wf = w[::-1]
    a = jnp.einsum("btd,kde->btke", z, wf,
                   preferred_element_type=jnp.float32).astype(z.dtype)
    p0 = a[:, :, :hop].reshape(B, Tl * hop, cout)
    p1 = a[:, :, hop:].reshape(B, Tl * hop, cout)
    y = (jnp.pad(p0, ((0, 0), (0, hop), (0, 0)))
         + jnp.pad(p1, ((0, 0), (hop, 0), (0, 0))))
    y = y[:, hop // 2: hop // 2 + Tl * hop]
    return y + params["b"].astype(y.dtype)


def test_upsample_packed_matmul_bitwise_matches_overlap_add():
    """The two-packed-matmul upsampler (round 5, the profile's 5.4 ms
    'upsampler einsum' line) is BIT-IDENTICAL to the overlap-add
    formulation it replaced — fwd values exact, grads allclose (grad
    contraction orders differ between the two graphs)."""
    for hop, Tl, d in ((64, 12, 16), (16, 7, 8), (8, 5, 4)):
        p = upsample_init(jax.random.PRNGKey(2), d, d, hop, 2,
                          jnp.float32)
        z = jax.random.normal(jax.random.PRNGKey(3), (2, Tl, d))
        np.testing.assert_array_equal(
            np.asarray(upsample_apply(p, z, hop)),
            np.asarray(_upsample_overlap_add(p, z, hop)))

        def loss_new(pp):
            return jnp.sum(jnp.sin(upsample_apply(pp, z, hop)))

        def loss_old(pp):
            return jnp.sum(jnp.sin(_upsample_overlap_add(pp, z, hop)))

        g_new = jax.grad(loss_new)(p)
        g_old = jax.grad(loss_old)(p)
        for k in g_new:
            np.testing.assert_allclose(np.asarray(g_new[k]),
                                       np.asarray(g_old[k]),
                                       rtol=2e-5, atol=2e-5)
        gz_new = jax.grad(lambda zz: jnp.sum(
            jnp.sin(upsample_apply(p, zz, hop))))(z)
        gz_old = jax.grad(lambda zz: jnp.sum(
            jnp.sin(_upsample_overlap_add(p, zz, hop))))(z)
        np.testing.assert_allclose(np.asarray(gz_new),
                                   np.asarray(gz_old),
                                   rtol=2e-5, atol=2e-5)


def test_take_rows_matches_gather_fwd_and_grad():
    """take_rows == w[ids] in value; its matmul backward == the scatter
    backward of the plain gather."""
    w = jax.random.normal(jax.random.PRNGKey(0), (16, 8))
    ids = jax.random.randint(jax.random.PRNGKey(1), (3, 5), 0, 16)
    np.testing.assert_array_equal(np.asarray(take_rows(w, ids)),
                                  np.asarray(w[ids]))

    def loss_custom(w):
        return jnp.sum(jnp.sin(take_rows(w, ids)) * 2.0)

    def loss_plain(w):
        return jnp.sum(jnp.sin(w[ids]) * 2.0)

    g_custom = jax.grad(loss_custom)(w)
    g_plain = jax.grad(loss_plain)(w)
    np.testing.assert_allclose(np.asarray(g_custom),
                               np.asarray(g_plain), rtol=1e-6,
                               atol=1e-6)


def test_analytic_flops_matches_xla_cost_analysis():
    """The analytic train-step FLOP count (used for MFU reporting when
    XLA's cost analysis can't see inside Pallas calls) agrees with
    XLA's own count on the pure-XLA path."""
    import dataclasses
    from vqvae_tpu.configs import get_config
    from vqvae_tpu.parallel.mesh import batch_sharding, make_mesh
    from vqvae_tpu.train import create_train_state, make_train_step
    from vqvae_tpu.utils.flops import train_step_flops

    cfg = get_config("tiny")
    cfg = cfg.replace(train=dataclasses.replace(cfg.train,
                                                batch_size=8))
    mesh = make_mesh(devices=jax.devices()[:1])
    jit_for, sh_of = make_train_step(cfg, mesh)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    sh = sh_of(state)
    state = jax.device_put(state, sh)
    bsh = batch_sharding(mesh)
    wav = jax.device_put(np.zeros((8, cfg.data.length + 1),
                                  np.float32), bsh)
    spk = jax.device_put(np.zeros(8, np.int32), bsh)
    cost = jit_for(sh).lower(state, wav, spk).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    xla = float(cost.get("flops", 0.0))
    ana = train_step_flops(cfg, 8)
    assert xla > 0
    # same order and within 25% (the analytic model counts only the
    # dominant contractions; bwd is approximated as 2x fwd)
    assert 0.75 < ana / xla < 1.33, (ana, xla)


def test_manual_ce_matches_optax():
    """The one-hot-contraction CE in models/vqvae.forward equals
    optax's integer-label CE (value and gradient)."""
    import optax
    logits = jax.random.normal(jax.random.PRNGKey(0), (4, 9, 32))
    t = jax.random.randint(jax.random.PRNGKey(1), (4, 9), 0, 32)

    def manual(lg):
        logz = jax.scipy.special.logsumexp(lg, axis=-1)
        picked = jnp.sum(lg * jax.nn.one_hot(t, 32, dtype=lg.dtype),
                         axis=-1)
        return jnp.mean(logz - picked)

    def ref(lg):
        return jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(lg, t))

    np.testing.assert_allclose(float(manual(logits)),
                               float(ref(logits)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(jax.grad(manual)(logits)),
                               np.asarray(jax.grad(ref)(logits)),
                               rtol=1e-5, atol=1e-6)


def test_strided_conv_matmul_matches_lax_conv():
    """The space-to-depth + shifted-matmul strided conv == SAME
    lax.conv_general_dilated, fwd and grads, across kernel/stride
    combinations (incl. odd total padding and k < 2s)."""
    from vqvae_tpu.ops.conv import conv1d_init, strided_conv_apply

    def ref(params, x, s):
        y = lax.conv_general_dilated(
            x, params["w"], window_strides=(s,), padding="SAME",
            dimension_numbers=("NHC", "HIO", "NHC"))
        return y + params["b"]

    for (k, s, C, Co, T) in ((4, 2, 1, 8, 32), (4, 2, 8, 16, 64),
                             (5, 2, 4, 8, 32), (3, 3, 4, 8, 36),
                             (2, 2, 4, 8, 32), (6, 2, 4, 8, 32)):
        p = conv1d_init(jax.random.PRNGKey(k * 7 + s), C, Co, k)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, T, C))
        got = strided_conv_apply(p, x, s)
        want = ref(p, x, s)
        assert got.shape == want.shape == (2, T // s, Co)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
        # gradients through both paths agree
        g1 = jax.grad(lambda q: jnp.sum(
            jnp.sin(strided_conv_apply(q, x, s))))(p)
        g2 = jax.grad(lambda q: jnp.sum(jnp.sin(ref(q, x, s))))(p)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)
    # T % stride != 0 falls back to the lax path and still works
    p = conv1d_init(jax.random.PRNGKey(0), 4, 8, 4)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 33, 4))
    assert strided_conv_apply(p, x, 2).shape == (2, 17, 8)
