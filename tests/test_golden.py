"""Golden-value regression: losses of the tiny model at a fixed seed on
a fixed input. Guards the numerical semantics of the whole forward
(encoder, VQ, losses, decoder) against accidental drift. If a change is
*supposed* to alter these numbers, update them deliberately."""

import jax
import jax.numpy as jnp
import numpy as np

from vqvae_tpu.audio import frame_batch
from vqvae_tpu.configs import get_config
from vqvae_tpu.models import forward, init_model

def test_golden_losses():
    cfg = get_config("tiny")
    params = init_model(jax.random.PRNGKey(0), cfg.model)
    t = jnp.arange(cfg.data.length + 1, dtype=jnp.float32) / cfg.data.sr
    wav = jnp.stack([0.5 * jnp.sin(2 * jnp.pi * 220 * t),
                     0.3 * jnp.sin(2 * jnp.pi * 440 * t)])
    batch = frame_batch(wav, jnp.array([0, 1]), cfg.model.mu)
    _, (metrics, _) = forward(params, cfg.model, batch)
    got = {k: float(v) for k, v in metrics.items()}
    golden = {
        "loss1": 5.825963,
        "loss2": 0.344399,
        "loss3": 0.344399,
    }
    for k, v in golden.items():
        np.testing.assert_allclose(got[k], v, rtol=2e-4,
                                   err_msg=f"golden {k} drifted")
