"""Generation CLI (reference: ``python generate.py -i in.wav -s p225
-m snapshot`` — SURVEY.md §3.2): wav -> encoder -> VQ codes ->
fast AR decode -> wav, all device-resident.

TPU extension over the reference: several input files run as ONE
batched decode (pad to the longest, trim per-file on output) — the
batched scan is where the throughput lives (docs/PERF.md headline
table), so reconstructing a directory costs barely more than one file.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from vqvae_tpu.audio.wav_io import load_wav, save_wav, trim_silence
from vqvae_tpu.cli.common import add_config_args, load_params, \
    resolve_config
from vqvae_tpu.infer import synthesize


def batch_waveforms(wavs, hop):
    """Pad a ragged list of waveforms into one ``[B, T_pad]`` batch.

    Each file's usable length is rounded down to a hop multiple (whole
    latent frames); T_pad is the longest such length. Returns
    (batch, lengths). Each output is sliced back to its own length;
    for a shorter file the zero-padding can still reach the last few
    kept latent frames through the encoder's receptive field, so its
    final ~RF samples may differ slightly from a solo decode — run
    files separately if bit-exact per-file output matters.
    """
    lengths = [len(w) - len(w) % hop for w in wavs]
    for i, n in enumerate(lengths):
        if n <= 0:  # not assert: must also fire under python -O
            raise SystemExit(f"input {i} is shorter than one latent "
                             f"frame ({hop} samples) after trimming")
    t_pad = max(lengths)
    batch = np.zeros((len(wavs), t_pad), np.float32)
    for i, (w, n) in enumerate(zip(wavs, lengths)):
        batch[i, :n] = w[:n]
    return batch, lengths


def _output_names(paths):
    """<stem>_gen.wav per input, de-duplicated across directories."""
    names, seen = [], set()
    for i, path in enumerate(paths):
        stem = os.path.splitext(os.path.basename(path))[0]
        name = f"{stem}_gen.wav"
        if name in seen:
            name = f"{stem}_{i}_gen.wav"
        seen.add(name)
        names.append(name)
    return names


def main() -> None:
    p = argparse.ArgumentParser(
        description="Reconstruct audio through the VQ-VAE codec")
    add_config_args(p)
    p.add_argument("-i", "--input", required=True, nargs="+",
                   help="input wav file(s); several files run as one "
                        "batched decode")
    p.add_argument("-o", "--output", default=None,
                   help="output wav (one input; default out.wav) or "
                        "output directory (several inputs; default "
                        "gen_out/)")
    p.add_argument("-m", "--model", required=True,
                   help="training run dir (or its checkpoints/)")
    p.add_argument("-s", "--speaker", type=int, nargs="+", default=[0],
                   help="global-condition speaker id(s): one per "
                        "input, or a single id broadcast to all")
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
    wavs = []
    for path in args.input:
        w = load_wav(path, cfg.data.sr)
        if not args.no_trim:
            w = trim_silence(w, cfg.data.top_db)
        wavs.append(w)
    speakers = (args.speaker if len(args.speaker) > 1
                else args.speaker * len(wavs))
    if len(speakers) != len(wavs):
        p.error(f"got {len(args.speaker)} speaker ids for "
                f"{len(wavs)} inputs")
    batch, lengths = batch_waveforms(wavs, cfg.model.hop)

    out, codes = synthesize(
        params, cfg.model, jnp.asarray(batch), jnp.asarray(speakers),
        jax.random.PRNGKey(args.seed), args.temperature, args.greedy,
        args.gen_impl)
    out, codes = np.asarray(out), np.asarray(codes)

    if len(wavs) == 1:
        dest = args.output or "out.wav"
        save_wav(dest, out[0, :lengths[0]], cfg.data.sr)
        print(f"wrote {dest}: {lengths[0]} samples "
              f"({lengths[0] / cfg.data.sr:.2f}s), "
              f"{len(np.unique(codes))} distinct codes")
        return

    outdir = args.output or "gen_out"
    os.makedirs(outdir, exist_ok=True)
    for name, row, n in zip(_output_names(args.input), out, lengths):
        save_wav(os.path.join(outdir, name), row[:n], cfg.data.sr)
    total = sum(lengths)
    print(f"wrote {len(wavs)} files to {outdir}/: {total} samples "
          f"({total / cfg.data.sr:.2f}s) in one batch-{len(wavs)} "
          f"decode, {len(np.unique(codes))} distinct codes")


if __name__ == "__main__":
    main()
