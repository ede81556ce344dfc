"""Decode CLI: VQ code ids (.npy) -> wav via the fast AR decoder.
Completes the codec API surface (train / encode / decode / generate)."""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from vqvae_tpu.audio.wav_io import save_wav
from vqvae_tpu.cli.common import add_config_args, load_params, \
    resolve_config
from vqvae_tpu.infer import decode_from_codes


def main() -> None:
    p = argparse.ArgumentParser(description="Decode VQ code ids to wav")
    add_config_args(p)
    p.add_argument("-i", "--input", required=True, help="codes .npy")
    p.add_argument("-o", "--output", default="out.wav")
    p.add_argument("-m", "--model", required=True)
    p.add_argument("-s", "--speaker", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--gen-impl", default="lax",
                   choices=["lax", "pallas", "lowmem"],
                   help="AR decode engine: lax scan, fused Pallas "
                        "kernel, or chunked-cond low-memory scan")
    p.add_argument("--greedy", action="store_true")
    args = p.parse_args()

    cfg = resolve_config(args)
    params = load_params(args.model, cfg)
    codes = jnp.asarray(np.load(args.input), jnp.int32)[None]
    wav = decode_from_codes(params, cfg.model, codes,
                            jnp.asarray([args.speaker]),
                            jax.random.PRNGKey(args.seed),
                            args.temperature, args.greedy,
                            args.gen_impl)
    save_wav(args.output, np.asarray(wav)[0], cfg.data.sr)
    print(f"wrote {args.output}: {wav.shape[1]} samples")


if __name__ == "__main__":
    main()
