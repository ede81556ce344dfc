"""Measure sustained session-push throughput vs kernel width on the
real chip (VERDICT r4 weak #3 / next-round #4): the serving default
must deliver realtime SUSTAINED pushes, not just realtime whole
requests.

For each width: time-to-first-audio (one full-width push) and the
steady per-push wall time (p50 over N pushes), against the audio
duration each push carries.  Also decomposes one width into
upsampler / kernel / readback phases to show where the time goes.

Run:  python scripts/session_sweep.py            (raw sessions)
      python scripts/session_sweep.py --socket   (through the daemon)
"""

from __future__ import annotations

import argparse
import time

import jax
import numpy as np

from vqvae_tpu.configs import get_config
from vqvae_tpu.models import init_model


def sweep_raw(widths, n_push=24):
    from vqvae_tpu.infer.pallas_stream import PallasStreamDecoder

    cfg = get_config("vctk-multi")
    mcfg = cfg.model
    params = init_model(jax.random.PRNGKey(0), mcfg)
    rng = np.random.default_rng(0)
    sr = cfg.data.sr
    rows = []
    for w in widths:
        dec = PallasStreamDecoder(params, mcfg, greedy=True,
                                  kernel_frames=w)
        # warm every compiled shape first
        s = dec.session(np.zeros(1, np.int32), jax.random.PRNGKey(0))
        s.push(rng.integers(0, mcfg.K, (1, w)).astype(np.int32))
        s.close()

        s = dec.session(np.zeros(1, np.int32), jax.random.PRNGKey(1))
        codes = rng.integers(0, mcfg.K, (1, w)).astype(np.int32)
        t0 = time.perf_counter()
        out = s.push(codes)
        # first full-width push emits (w-?) finalized samples once the
        # upsampler has enough overlap; time until ANY audio:
        i = 1
        while out.size == 0:
            out = s.push(codes)
            i += 1
        ttfa_ms = (time.perf_counter() - t0) * 1e3
        push_ms = []
        for _ in range(n_push):
            t0 = time.perf_counter()
            s.push(codes)
            push_ms.append((time.perf_counter() - t0) * 1e3)
        s.close()
        audio_ms = w * mcfg.hop / sr * 1e3
        p50 = float(np.percentile(push_ms, 50))
        rows.append((w, ttfa_ms, p50, audio_ms, audio_ms / p50))
        print(f"width={w:3d}  ttfa={ttfa_ms:7.1f}ms  "
              f"push_p50={p50:6.1f}ms  audio/push={audio_ms:6.1f}ms  "
              f"sustained={audio_ms / p50:5.2f}x  "
              f"(pushes to 1st audio: {i})", flush=True)
    return rows


def decompose(w=16, n=24):
    """Where a steady push's time goes at width w."""
    from vqvae_tpu.infer.pallas_stream import PallasStreamDecoder
    from vqvae_tpu.kernels.decode_pallas import generate_ids_pallas_resume
    from vqvae_tpu.audio.mu_law import mu_law_decode_jit
    import jax.numpy as jnp

    cfg = get_config("vctk-multi")
    mcfg = cfg.model
    params = init_model(jax.random.PRNGKey(0), mcfg)
    rng = np.random.default_rng(0)
    dec = PallasStreamDecoder(params, mcfg, greedy=True, kernel_frames=w)
    s = dec.session(np.zeros(1, np.int32), jax.random.PRNGKey(0))
    codes = rng.integers(0, mcfg.K, (1, w)).astype(np.int32)
    s.push(codes)
    s.push(codes)

    ups_ms, up_ms, ker_ms, rd_ms = [], [], [], []
    for _ in range(n):
        t0 = time.perf_counter()
        s._push_cond(codes)          # upsampler dispatch + device_get
        t1 = time.perf_counter()
        spc = dec.spc
        cond, s._buf = s._buf[:, :spc], s._buf[:, spc:]
        cond_dev = jnp.asarray(cond)
        cond_dev.block_until_ready()
        t2 = time.perf_counter()
        ids, s.state = generate_ids_pallas_resume(
            dec.gp, mcfg, cond_dev, s.gcond, s.seed, s.temp, s.state,
            greedy=True)
        wav = mu_law_decode_jit(ids, mcfg.mu, mode=mcfg.mulaw_mode)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), s.state)
        t3 = time.perf_counter()
        jax.device_get(wav)
        t4 = time.perf_counter()
        ups_ms.append((t1 - t0) * 1e3)
        up_ms.append((t2 - t1) * 1e3)
        ker_ms.append((t3 - t2) * 1e3)
        rd_ms.append((t4 - t3) * 1e3)
    for name, xs in (("upsampler+readback", ups_ms),
                     ("cond upload", up_ms),
                     ("kernel", ker_ms),
                     ("wav readback", rd_ms)):
        print(f"  {name:20s} p50={np.percentile(xs, 50):6.2f}ms",
              flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--widths", type=int, nargs="*",
                    default=[16, 32, 48, 64])
    ap.add_argument("--decompose", type=int, default=16)
    args = ap.parse_args()
    print(f"backend: {jax.default_backend()}", flush=True)
    sweep_raw(args.widths)
    if args.decompose:
        print(f"decomposition at width {args.decompose}:", flush=True)
        decompose(args.decompose)
