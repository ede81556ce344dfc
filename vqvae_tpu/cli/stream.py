"""Streaming-serving CLI: decode VQ codes to wav chunk-by-chunk with
constant device memory, reporting per-chunk latency and the realtime
factor — the serving-shaped front end for ``infer/streaming.py``
(reference analogue: none — generate.py is one-shot; SURVEY.md §5.7
long-audio row names O(1)-state streaming as the mechanism this
framework keeps TPU-resident).

Input is either code ids (.npy, like vqvae-decode) or a wav (encoded
first, like vqvae-generate). With ``--encode-chunk N`` a wav input is
stream-ENCODED too — audio pushes N samples at a time through
``infer/enc_streaming.StreamingEncoder`` and code frames feed the
decoder as they finalize: the full-duplex live-codec path, end to end
in constant memory. Output audio is bit-identical to the one-shot
engines for the same seed — greedy AND sampled (the per-step
``fold_in(key, t)`` sampling contract plus the streaming encoder's
exactness contract, tests/test_streaming.py,
tests/test_enc_streaming.py).
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from vqvae_tpu.audio.wav_io import load_wav, save_wav
from vqvae_tpu.cli.common import add_config_args, load_params, \
    resolve_config
from vqvae_tpu.infer.streaming import StreamingSynthesizer


def main() -> None:
    p = argparse.ArgumentParser(
        description="Streaming decode: codes/wav -> wav in chunks, "
                    "constant device memory")
    add_config_args(p)
    p.add_argument("-i", "--input", required=True,
                   help="codes .npy (int ids) or input .wav")
    p.add_argument("-o", "--output", default="out.wav")
    p.add_argument("-m", "--model", required=True)
    p.add_argument("-s", "--speaker", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--greedy", action="store_true")
    p.add_argument("--chunk-frames", type=int, default=16,
                   help="code frames per push (chunk latency = "
                        "frames*hop samples)")
    p.add_argument("--encode-chunk", type=int, default=0,
                   help="wav input only: stream-encode the audio too, "
                        "this many samples per push (live full-duplex "
                        "codec); 0 = one-shot encode")
    args = p.parse_args()

    cfg = resolve_config(args)
    params = load_params(args.model, cfg)
    m = cfg.model

    wav = codes = None
    if args.input.endswith(".npy"):
        if args.encode_chunk:
            p.error("--encode-chunk needs a wav input")
        codes = jnp.asarray(np.load(args.input), jnp.int32)[None]
        n_frames = codes.shape[1]
    else:
        wav = load_wav(args.input, cfg.data.sr)
        if args.encode_chunk:
            n_frames = len(wav) // m.hop   # what the stream will emit
        else:
            from vqvae_tpu.audio.mu_law import mu_law_round_trip_jit
            from vqvae_tpu.infer.fastgen import encode_to_codes
            T = len(wav) - (len(wav) % m.hop)
            x = mu_law_round_trip_jit(jnp.asarray(wav[:T])[None],
                                      m.mu, m.mulaw_mode)
            codes = encode_to_codes(params, m, x)
            n_frames = codes.shape[1]

    sr = cfg.data.sr
    if n_frames == 0:
        raise SystemExit("input contains no code frames (wav shorter "
                         "than one hop, or empty codes file)")
    C = max(1, args.chunk_frames)
    lens = [C] * (n_frames // C)
    if n_frames % C:
        lens.append(n_frames % C)   # ragged tail keeps bit-exactness
                                    # (tail cond depends on stream end)

    def make_syn():
        return StreamingSynthesizer(params, m,
                                    jnp.asarray([args.speaker]),
                                    jax.random.PRNGKey(args.seed),
                                    args.temperature, args.greedy)

    # prime the jit cache on a throwaway synthesizer — every distinct
    # chunk shape the real run will see (first chunk, steady chunks,
    # ragged tail, flush; _stream_chunk's cache is module-level) — so
    # the reported per-chunk latencies are SERVING latencies, not
    # compiles
    t0 = time.perf_counter()
    warm = make_syn()
    dummy = jnp.zeros((1, C), jnp.int32)
    jax.block_until_ready(warm.push(dummy[:, :lens[0]]))
    for L in sorted(set(lens[1:])):
        jax.block_until_ready(warm.push(dummy[:, :L]))
    jax.block_until_ready(warm.flush())
    print(f"warmup: {time.perf_counter() - t0:.1f}s (jit compile)",
          flush=True)

    syn = make_syn()
    pieces = []

    def push_timed(chunk_codes, i):
        t0 = time.perf_counter()
        piece = np.asarray(jax.device_get(syn.push(chunk_codes)))[0]
        dt = time.perf_counter() - t0
        pieces.append(piece)
        rt = len(piece) / sr / dt if dt > 0 else float("inf")
        print(f"chunk {i}: {len(piece)} samples in {dt * 1e3:.1f} ms "
              f"({rt:.1f}x realtime)", flush=True)

    if args.encode_chunk:
        # live full-duplex: audio in, audio out, both streaming; the
        # emitted codes are bit-exact vs one-shot encode, so the output
        # wav stays identical to the codes-file path at equal seed
        from vqvae_tpu.infer.enc_streaming import StreamingEncoder
        enc = StreamingEncoder(params, m)
        print(f"live encode: {args.encode_chunk} samples/push, "
              f"encoder lookahead {enc.lookahead} samples", flush=True)
        buf = np.zeros((1, 0), np.int32)
        idx = 0

        def drain(final=False):
            nonlocal buf, idx
            while idx < len(lens) and (buf.shape[1] >= lens[idx]
                                       or final):
                L = lens[idx]
                push_timed(jnp.asarray(buf[:, :L]), idx)
                buf = buf[:, L:]
                idx += 1

        for a in range(0, len(wav), args.encode_chunk):
            got = enc.push(wav[None, a:a + args.encode_chunk])
            if got.shape[1]:
                buf = np.concatenate([buf, got], axis=1)
                drain()
        got = enc.flush()
        if got.shape[1]:
            buf = np.concatenate([buf, got], axis=1)
        drain(final=True)
        assert idx == len(lens) and buf.shape[1] == 0, (idx, buf.shape)
    else:
        lo = 0
        for i, L in enumerate(lens):
            push_timed(codes[:, lo:lo + L], i)
            lo += L
    pieces.append(np.asarray(jax.device_get(syn.flush()))[0])
    out = np.concatenate(pieces)
    save_wav(args.output, out, sr)
    print(f"wrote {args.output}: {len(out)} samples "
          f"({len(out) / sr:.2f} s) from {n_frames} code frames")


if __name__ == "__main__":
    main()
