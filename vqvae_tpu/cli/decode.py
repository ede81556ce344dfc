"""Decode CLI: VQ code ids (.npy) -> wav via the fast AR decoder.
Completes the codec API surface (train / encode / decode / generate).

The input may be 1-D ``[T_lat]`` (one stream -> one wav) or 2-D
``[B, T_lat]`` (a batch of streams -> a directory of wavs, decoded in
ONE batched scan). ``--mesh-data N`` shards a batched decode's rows
over N devices (infer/parallel.py — zero collectives, bit-identical
to the single-device engine), turning one chip's measured throughput
into N chips' for serving.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from vqvae_tpu.audio.wav_io import save_wav
from vqvae_tpu.cli.common import add_config_args, load_params, \
    resolve_config
from vqvae_tpu.infer import decode_from_codes, decode_from_codes_sharded


def main() -> None:
    p = argparse.ArgumentParser(description="Decode VQ code ids to wav")
    add_config_args(p)
    p.add_argument("-i", "--input", required=True,
                   help="codes .npy: [T_lat] one stream, or "
                        "[B, T_lat] a batch of streams")
    p.add_argument("-o", "--output", default=None,
                   help="output wav (1-D input; default out.wav) or "
                        "output directory (2-D input; default "
                        "dec_out/)")
    p.add_argument("-m", "--model", required=True)
    p.add_argument("-s", "--speaker", type=int, nargs="+", default=[0],
                   help="speaker id(s): one per row, or a single id "
                        "broadcast to all rows")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--gen-impl", default="lax",
                   choices=["lax", "pallas", "lowmem"],
                   help="AR decode engine: lax scan, fused Pallas "
                        "kernel, or chunked-cond low-memory scan")
    p.add_argument("--greedy", action="store_true")
    p.add_argument("--mesh-data", type=int, default=0,
                   help="shard the batch rows of a 2-D input over N "
                        "devices (0 = single device)")
    args = p.parse_args()

    cfg = resolve_config(args)
    params = load_params(args.model, cfg)
    raw = np.load(args.input)
    if raw.ndim not in (1, 2):  # p.error, not assert: python -O
        p.error(f"codes must be 1-D or 2-D, got {raw.shape}")
    batched = raw.ndim == 2
    codes = jnp.asarray(raw, jnp.int32)
    if not batched:
        codes = codes[None]
    B = codes.shape[0]
    speakers = args.speaker if len(args.speaker) > 1 else args.speaker * B
    if len(speakers) != B:
        p.error(f"got {len(args.speaker)} speaker ids for {B} code rows")
    spk = jnp.asarray(speakers)
    key = jax.random.PRNGKey(args.seed)

    if args.mesh_data:
        if B % args.mesh_data != 0:
            p.error(f"batch {B} must divide over --mesh-data "
                    f"{args.mesh_data}")
        from vqvae_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(args.mesh_data,
                         devices=jax.devices()[:args.mesh_data])
        wav = decode_from_codes_sharded(
            params, cfg.model, codes, spk, key, mesh,
            args.temperature, args.greedy, args.gen_impl)
    else:
        wav = decode_from_codes(params, cfg.model, codes, spk, key,
                                args.temperature, args.greedy,
                                args.gen_impl)
    wav = np.asarray(wav)

    if not batched:
        dest = args.output or "out.wav"
        save_wav(dest, wav[0], cfg.data.sr)
        print(f"wrote {dest}: {wav.shape[1]} samples")
        return

    outdir = args.output or "dec_out"
    os.makedirs(outdir, exist_ok=True)
    stem = os.path.splitext(os.path.basename(args.input))[0]
    for i, row in enumerate(wav):
        save_wav(os.path.join(outdir, f"{stem}_{i:03d}.wav"), row,
                 cfg.data.sr)
    shard = (f" over {args.mesh_data} devices" if args.mesh_data
             else "")
    print(f"wrote {B} files to {outdir}/: {wav.shape[1]} samples each "
          f"in one batch-{B} decode{shard}")


if __name__ == "__main__":
    main()
