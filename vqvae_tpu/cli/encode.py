"""Encode CLI: wav -> discrete VQ code ids (.npy).  Mirrors the encode
half of the reference's generate pipeline as a standalone entry point
(BASELINE north star: train / encode / decode / generate).

Several ``-i`` inputs write one .npy per file into a directory; with
``--stack`` (equal-length files) they land in a single ``[B, T_lat]``
array ready for ``vqvae-decode``'s batched/mesh-sharded path. Files
are encoded one by one — each solo pass is exact (batch-padding would
leak zeros into a shorter file's trailing latents through the
encoder's receptive field), and the encoder forward is milliseconds,
so there is no throughput reason to batch here.
"""

from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np

from vqvae_tpu.audio.mu_law import mu_law_round_trip_jit
from vqvae_tpu.audio.wav_io import load_wav, trim_silence
from vqvae_tpu.cli.common import add_config_args, load_params, \
    resolve_config
from vqvae_tpu.infer.fastgen import encode_to_codes


def _encode_one(params, cfg, path: str, no_trim: bool) -> np.ndarray:
    wav = load_wav(path, cfg.data.sr)
    if not no_trim:
        wav = trim_silence(wav, cfg.data.top_db)
    T = len(wav) - (len(wav) % cfg.model.hop)
    if T <= 0:  # not assert: must also fire under python -O
        raise SystemExit(f"{path} is shorter than one latent frame "
                         f"({cfg.model.hop} samples) after trimming")
    # match the training/generation input distribution: the encoder
    # always sees mu-law-quantised audio (framing/synthesize both
    # round-trip through the companding before encoding)
    x = mu_law_round_trip_jit(jnp.asarray(wav[:T]), cfg.model.mu,
                              cfg.model.mulaw_mode)
    codes = encode_to_codes(params, cfg.model, x[None])
    return np.asarray(codes[0], np.int32)


def main() -> None:
    p = argparse.ArgumentParser(description="Encode wav to VQ code ids")
    add_config_args(p)
    p.add_argument("-i", "--input", required=True, nargs="+",
                   help="input wav file(s)")
    p.add_argument("-o", "--output", default=None,
                   help="codes .npy (one input; default codes.npy), "
                        "output directory (several inputs; default "
                        "codes_out/), or a .npy path with --stack")
    p.add_argument("-m", "--model", required=True)
    p.add_argument("--no-trim", action="store_true")
    p.add_argument("--stack", action="store_true",
                   help="several equal-length inputs -> one "
                        "[B, T_lat] .npy (vqvae-decode's batched "
                        "input format)")
    args = p.parse_args()

    cfg = resolve_config(args)
    params = load_params(args.model, cfg)
    all_codes = [_encode_one(params, cfg, path, args.no_trim)
                 for path in args.input]
    rate = f"{cfg.data.sr / cfg.model.hop:.1f} Hz latent rate"

    if len(all_codes) == 1 and not args.stack:
        dest = args.output or "codes.npy"
        np.save(dest, all_codes[0])
        print(f"wrote {dest}: {len(all_codes[0])} codes "
              f"({rate}, K={cfg.model.K})")
        return

    if args.stack:
        lens = {len(c) for c in all_codes}
        if len(lens) != 1:
            p.error(f"--stack needs equal-length inputs, got code "
                    f"lengths {sorted(len(c) for c in all_codes)}")
        dest = args.output or "codes.npy"
        np.save(dest, np.stack(all_codes))
        print(f"wrote {dest}: [{len(all_codes)}, {lens.pop()}] codes "
              f"({rate}, K={cfg.model.K})")
        return

    outdir = args.output or "codes_out"
    os.makedirs(outdir, exist_ok=True)
    # de-duplicate stems across directories (a/x.wav + b/x.wav must
    # not silently overwrite each other) — same rule as vqvae-generate
    names, seen = [], set()
    for i, path in enumerate(args.input):
        stem = os.path.splitext(os.path.basename(path))[0]
        name = f"{stem}.npy" if f"{stem}.npy" not in seen \
            else f"{stem}_{i}.npy"
        seen.add(name)
        names.append(name)
    for name, c in zip(names, all_codes):
        np.save(os.path.join(outdir, name), c)
    print(f"wrote {len(all_codes)} files to {outdir}/ "
          f"({rate}, K={cfg.model.K})")


if __name__ == "__main__":
    main()
