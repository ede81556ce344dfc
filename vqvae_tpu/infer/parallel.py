"""Mesh-parallel batched synthesis — production serving at pod scale.

AR decoding is embarrassingly batch-parallel: the scan carry (ring
buffers, PRNG key fold-ins, current sample) has no cross-stream
dependency, so sharding the batch axis over the device mesh turns the
single-core engine (14.5M samples/s/core at B=2048, docs/PERF.md)
into N cores x that rate with ZERO collectives — XLA propagates the
batch sharding through the whole scan. This module is the thin
layer that places inputs/params and keeps the per-device batch at the
measured sweet spot.

Reference analogue: none (generate.py is strictly single-GPU,
SURVEY.md §3.2) — this is TPU-first headroom, validated on the
8-virtual-device CPU mesh in tests/test_infer_parallel.py (sharded ==
single-device, bit-exact).
"""

from __future__ import annotations

from typing import Dict

import jax

from vqvae_tpu.configs import ModelConfig
from vqvae_tpu.infer.fastgen import decode_from_codes
from vqvae_tpu.parallel.mesh import batch_sharding, replicated


def decode_from_codes_sharded(params: Dict, cfg: ModelConfig,
                              codes: jax.Array, speaker: jax.Array,
                              key: jax.Array, mesh,
                              temperature: float = 1.0,
                              greedy: bool = False,
                              impl: str = "lowmem") -> jax.Array:
    """``decode_from_codes`` with the batch sharded over ``mesh``'s
    data axes and the model replicated; bit-identical to the
    single-device engine (same program, SPMD execution)."""
    bshard = batch_sharding(mesh)
    rep = replicated(mesh)
    codes = jax.device_put(codes, bshard)
    speaker = jax.device_put(speaker, bshard)
    params = jax.device_put(params, rep)
    key = jax.device_put(key, rep)
    return decode_from_codes(params, cfg, codes, speaker, key,
                             temperature, greedy, impl)
