"""Headline benchmark: batched fast AR synthesis throughput on one TPU
core (BASELINE.md target: >= 50x real-time @ 16 kHz per core, i.e.
>= 800k samples/s/core, batched streams).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/s/core", "vs_baseline": N}
vs_baseline is measured throughput / 800k (the driver target; the
reference itself publishes no numbers — BASELINE.json.published == {}).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_SAMPLES_PER_SEC = 800_000.0  # 50x realtime @ 16 kHz
SECONDS = float(os.environ.get("BENCH_SECONDS", 1.0))
BATCH = int(os.environ.get("BENCH_BATCH", 2048))  # batched streams


def main() -> None:
    from vqvae_tpu.configs import get_config
    from vqvae_tpu.infer.lowmem import decode_from_codes_lowmem
    from vqvae_tpu.models import init_model

    cfg = get_config("vctk-multi").model  # flagship: 30-layer WaveNet
    sr = 16000
    T = int(SECONDS * sr)
    T_lat = T // cfg.hop

    params = init_model(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, cfg.K, (BATCH, T_lat)), jnp.int32)
    speaker = jnp.asarray(rng.integers(0, cfg.n_speakers, (BATCH,)),
                          jnp.int32)
    key = jax.random.PRNGKey(1)

    # compile + warmup; NOTE: on the axon TPU platform
    # block_until_ready() does not reliably block, so every sync below
    # goes through jax.device_get (host copy), which provably does.
    # decode_from_codes_lowmem computes the audio-rate condition
    # chunk-by-chunk inside the scan (docs/PERF.md) — both faster and
    # the enabler for B >= 2048.
    out = decode_from_codes_lowmem(params, cfg, codes, speaker, key)
    jax.device_get(out)

    runs = 3
    t0 = time.perf_counter()
    for i in range(runs):
        out = decode_from_codes_lowmem(params, cfg, codes, speaker,
                                       jax.random.PRNGKey(i))
        jax.device_get(out[:, -1])
    dt = (time.perf_counter() - t0) / runs

    samples_per_sec = BATCH * T / dt
    print(json.dumps({
        "metric": "fast_ar_synthesis_throughput_b" + str(BATCH),
        "value": round(samples_per_sec, 1),
        "unit": "samples/s/core",
        "vs_baseline": round(samples_per_sec / BASELINE_SAMPLES_PER_SEC,
                             3),
    }))


if __name__ == "__main__":
    main()
