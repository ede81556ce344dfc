"""Load test for the vqvae-serve daemon: request-latency distribution
through the real socket, warm.

The reference has no serving story at all (its generate.py pays model
load + graph build per run — SURVEY.md §3.2); this harness measures
the thing a codec deployment actually cares about: wall latency per
request against a warm daemon, including protocol + transport
overhead, and the realtime factor (audio seconds produced per wall
second).  Requests go through ``vqvae_tpu.client.CodecClient`` — the
same path an application uses.

Usage (daemon first, then the bench):

    vqvae-serve --preset tiny -m rundir --socket /tmp/codec.sock &
    python scripts/serve_bench.py --socket /tmp/codec.sock \
        --seconds 1.0 --requests 20

Prints one JSON line:
    {"op": "decode", "n": 20, "audio_s": 1.0,
     "p50_ms": ..., "p95_ms": ..., "realtime_x": ..., ...}

``--op`` picks decode (code ids in, audio out — the expensive AR
path), encode (audio in, ids out), or reconstruct (both).  Latencies
are end-to-end per request on one connection, after one untimed
warm-rinse request.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from vqvae_tpu.client import CodecClient


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--socket", help="daemon UNIX socket path")
    p.add_argument("--tcp", metavar="HOST:PORT",
                   help="daemon TCP address instead of --socket")
    p.add_argument("--op", default="decode",
                   choices=["decode", "encode", "reconstruct"])
    p.add_argument("--seconds", type=float, default=1.0,
                   help="audio length per request")
    p.add_argument("--requests", type=int, default=20)
    p.add_argument("--greedy", action="store_true",
                   help="greedy decode (default: sampled)")
    args = p.parse_args()
    if bool(args.socket) == bool(args.tcp):
        p.error("exactly one of --socket or --tcp is required")

    c = CodecClient(socket_path=args.socket, tcp=args.tcp)
    info = c.ping()
    sr, hop, K = info["sr"], info["hop"], info["K"]
    T = int(args.seconds * sr)
    rng = np.random.default_rng(0)

    def fire(i: int) -> None:
        if args.op == "decode":
            c.decode(rng.integers(0, K, T // hop), seed=i,
                     greedy=args.greedy)
            return
        t = np.arange(T) / sr
        wav = (0.5 * np.sin(2 * np.pi * (200 + 10 * i) * t)
               ).astype(np.float32)
        if args.op == "encode":
            c.encode(wav)
        else:
            c.reconstruct(wav, seed=i, greedy=args.greedy)

    fire(-1)  # warm rinse (excluded from the stats)
    lat = []
    for i in range(args.requests):
        t0 = time.perf_counter()
        fire(i)
        lat.append(time.perf_counter() - t0)
    # daemon-side accounting for the same window: its percentiles are
    # measured around the device lock, so client-minus-daemon p50 is
    # the transport + protocol overhead.  A daemon built before the
    # stats op answers with an error — the latencies above are already
    # collected, so degrade to empty rather than crash.
    from vqvae_tpu.client import ServerError
    try:
        daemon = c.stats().get("ops", {}).get(args.op, {})
    except ServerError:
        daemon = {}
    c.close()

    lat_ms = np.sort(np.asarray(lat) * 1e3)
    audio_s = (T // hop) * hop / sr
    print(json.dumps({
        "op": args.op,
        "n": args.requests,
        "audio_s": round(audio_s, 4),
        "p50_ms": round(float(np.percentile(lat_ms, 50)), 2),
        "p95_ms": round(float(np.percentile(lat_ms, 95)), 2),
        "mean_ms": round(float(lat_ms.mean()), 2),
        # audio seconds produced per wall second at p50
        "realtime_x": round(
            audio_s / (float(np.percentile(lat_ms, 50)) / 1e3), 2),
        "preset": info.get("preset"),
        "chunk": info.get("chunk"),
        "greedy": bool(args.greedy),
        "daemon_ms": daemon.get("ms"),
        "daemon_errors": daemon.get("errors"),
    }))


if __name__ == "__main__":
    main()
