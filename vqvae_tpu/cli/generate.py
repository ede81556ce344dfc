"""Generation CLI (reference: ``python generate.py -i in.wav -s p225
-m snapshot`` — SURVEY.md §3.2): wav -> encoder -> VQ codes ->
fast AR decode -> wav, all device-resident.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from vqvae_tpu.audio.wav_io import load_wav, save_wav, trim_silence
from vqvae_tpu.cli.common import add_config_args, load_params, \
    resolve_config
from vqvae_tpu.infer import synthesize


def main() -> None:
    p = argparse.ArgumentParser(
        description="Reconstruct audio through the VQ-VAE codec")
    add_config_args(p)
    p.add_argument("-i", "--input", required=True, help="input wav")
    p.add_argument("-o", "--output", default="out.wav")
    p.add_argument("-m", "--model", required=True,
                   help="training run dir (or its checkpoints/)")
    p.add_argument("-s", "--speaker", type=int, default=0,
                   help="global-condition speaker id")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--gen-impl", default="lax",
                   choices=["lax", "pallas", "lowmem"],
                   help="AR decode engine: lax scan, fused Pallas "
                        "kernel, or chunked-cond low-memory scan")
    p.add_argument("--greedy", action="store_true",
                   help="argmax decoding instead of sampling")
    p.add_argument("--no-trim", action="store_true")
    args = p.parse_args()

    cfg = resolve_config(args)
    params = load_params(args.model, cfg)
    wav = load_wav(args.input, cfg.data.sr)
    if not args.no_trim:
        wav = trim_silence(wav, cfg.data.top_db)
    out, codes = synthesize(
        params, cfg.model, jnp.asarray(wav)[None, :],
        jnp.asarray([args.speaker]), jax.random.PRNGKey(args.seed),
        args.temperature, args.greedy, args.gen_impl)
    save_wav(args.output, np.asarray(out)[0], cfg.data.sr)
    print(f"wrote {args.output}: {out.shape[1]} samples "
          f"({out.shape[1] / cfg.data.sr:.2f}s), "
          f"{len(np.unique(np.asarray(codes)))} distinct codes")


if __name__ == "__main__":
    main()
