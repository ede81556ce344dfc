"""Mesh-parallel synthesis (infer/parallel.py): sharding the batch
over the 8-virtual-device mesh must be bit-identical to the
single-device engine — the AR scan is batch-parallel with zero
collectives, so SPMD execution is the same program."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae_tpu.configs import get_config
from vqvae_tpu.infer.fastgen import decode_from_codes
from vqvae_tpu.infer.parallel import decode_from_codes_sharded
from vqvae_tpu.models import init_model
from vqvae_tpu.parallel.mesh import make_mesh


@pytest.mark.parametrize("greedy,impl", [(True, "lax"),
                                         (False, "lowmem")])
def test_sharded_decode_matches_single_device(greedy, impl):
    cfg = get_config("tiny").model
    params = init_model(jax.random.PRNGKey(0), cfg)
    B, Tl = 8, 4
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, cfg.K, (B, Tl)), jnp.int32)
    spk = jnp.asarray(rng.integers(0, cfg.n_speakers, (B,)), jnp.int32)
    key = jax.random.PRNGKey(7)

    ref = decode_from_codes(params, cfg, codes, spk, key,
                            greedy=greedy, impl=impl)
    mesh = make_mesh()          # 8 fake CPU devices
    got = decode_from_codes_sharded(params, cfg, codes, spk, key, mesh,
                                    greedy=greedy, impl=impl)
    assert got.sharding.num_devices == 8            # batch spread out
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
