"""Encode CLI: wav -> discrete VQ code ids (.npy).  Mirrors the encode
half of the reference's generate pipeline as a standalone entry point
(BASELINE north star: train / encode / decode / generate)."""

from __future__ import annotations

import argparse

import jax.numpy as jnp
import numpy as np

from vqvae_tpu.audio.mu_law import mu_law_decode, mu_law_encode
from vqvae_tpu.audio.wav_io import load_wav, trim_silence
from vqvae_tpu.cli.common import add_config_args, load_params, \
    resolve_config
from vqvae_tpu.infer.fastgen import encode_to_codes


def main() -> None:
    p = argparse.ArgumentParser(description="Encode wav to VQ code ids")
    add_config_args(p)
    p.add_argument("-i", "--input", required=True)
    p.add_argument("-o", "--output", default="codes.npy")
    p.add_argument("-m", "--model", required=True)
    p.add_argument("--no-trim", action="store_true")
    args = p.parse_args()

    cfg = resolve_config(args)
    params = load_params(args.model, cfg)
    wav = load_wav(args.input, cfg.data.sr)
    if not args.no_trim:
        wav = trim_silence(wav, cfg.data.top_db)
    T = len(wav) - (len(wav) % cfg.model.hop)
    # match the training/generation input distribution: the encoder
    # always sees mu-law-quantised audio (framing/synthesize both
    # round-trip through the companding before encoding)
    x = mu_law_decode(
        mu_law_encode(jnp.asarray(wav[:T]), cfg.model.mu,
                      cfg.model.mulaw_mode),
        cfg.model.mu, mode=cfg.model.mulaw_mode)
    codes = encode_to_codes(params, cfg.model, x[None])
    np.save(args.output, np.asarray(codes[0], np.int32))
    print(f"wrote {args.output}: {codes.shape[1]} codes "
          f"({cfg.data.sr / cfg.model.hop:.1f} Hz latent rate, "
          f"K={cfg.model.K})")


if __name__ == "__main__":
    main()
