"""Per-phase decomposition of the training step from a profiler trace
(VERDICT r3 weak #3: the MFU story needs a measured split, not an
attribution).

Captures a jax.profiler trace of N steps of the flagship train step
(reusing scripts/train_roofline.py), converts the xplane with xprof's
hlo_stats tool, and buckets every HLO op's SELF time into semantic
phases via the op's source location (JAX records the file:line of the
originating Python op in HLO metadata):

  bwd_kernel / fwd_kernel   the Pallas chunk custom-calls
  head_ce                   skip head matmuls + softmax CE (fwd+bwd)
  upsampler                 einsum latent upsampling (fwd+bwd)
  input_embed               decoder input embedding (gathers, one-hot
                            matmul backward, causal shift)
  encoder                   folded-matmul strided conv stack
  kernel_glue               chunk skip-sum combines around the kernels
  vq / adam_ema / framing   the rest, each tiny

Usage:
  python scripts/train_step_profile.py [--batch 64]
      [--decoder-kernel pallas_sg] [--steps 10] [--out /tmp/prof_b64]
  python scripts/train_step_profile.py --hlo-stats /tmp/hlo_stats.json

Prints one JSON line plus a markdown table (the docs/PERF.md
"Measured decomposition" table comes from this script).
"""

from __future__ import annotations

import argparse
import glob
import json
import re

# source-path fragment -> phase; first match wins, most specific first
PHASE_BY_SOURCE = [
    ("kernels/wavenet_train_pallas.py", "kernel_glue"),
    ("models/wavenet.py:16", "head_ce"),        # _head matmuls
    ("models/vqvae.py:9", "head_ce"),           # CE logsumexp/one-hot
    ("models/vqvae.py:10", "head_ce"),
    ("ops/conv.py:20", "upsampler"),            # packed-matmul upsample
    ("ops/conv.py:21", "upsampler"),            # (weight pack, neighbour
    ("ops/conv.py:22", "upsampler"),            # concat, two dots,
    ("ops/conv.py:23", "upsampler"),            # reshape + bias)
    ("ops/conv.py:64", "input_embed"),          # causal shift_right
    ("ops/embed.py", "input_embed"),
    ("models/wavenet.py:11", "input_embed"),    # take_rows + bias
    ("models/wavenet.py:10", "input_embed"),    # speaker embed path
    ("ops/conv.py", "encoder"),                 # folded strided convs
    ("models/encoder.py", "encoder"),
    ("models/vq.py", "vq"),
    ("train/step.py", "adam_ema"),
    ("audio/framing.py", "framing"),
    ("audio/mu_law.py", "framing"),
]


def phase_of(row: dict) -> str:
    tf_op = row.get("tf_op_name") or ""
    if "pallas_call" in tf_op:
        return "bwd_kernel" if "transpose" in tf_op else "fwd_kernel"
    src = row.get("source_info") or ""
    m = re.search(r"title='([^'\s]+?):(\d+)", src)
    if m:
        loc = f"{m.group(1)}:{m.group(2)}"
        for frag, phase in PHASE_BY_SOURCE:
            if frag in loc:
                return phase
    return "other"


def decompose(hlo_stats_path: str, steps: int) -> dict:
    d = json.load(open(hlo_stats_path))
    cols = [c["id"] for c in d["cols"]]
    rows = [dict(zip(cols, [c["v"] for c in r["c"]])) for r in d["rows"]]
    tot = sum(r["total_self_time"] for r in rows)
    agg: dict = {}
    for r in rows:
        agg[phase_of(r)] = agg.get(phase_of(r), 0.0) \
            + r["total_self_time"]
    out = {k: {"ms_per_step": round(v / steps / 1e3, 2),
               "pct": round(v / tot * 100, 1)}
           for k, v in sorted(agg.items(), key=lambda kv: -kv[1])}
    kernels = sum(v for k, v in agg.items()
                  if k in ("fwd_kernel", "bwd_kernel"))
    return {"device_busy_ms_per_step": round(tot / steps / 1e3, 2),
            "kernel_share_pct": round(kernels / tot * 100, 1),
            "phases": out}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--decoder-kernel", default="pallas_sg")
    ap.add_argument("--head-kernel", default=None)
    ap.add_argument("--embed-in-kernel", action="store_true")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--out", default="/tmp/train_step_profile")
    ap.add_argument("--hlo-stats",
                    help="skip capture; aggregate an existing "
                         "hlo_stats.json")
    args = ap.parse_args()

    stats_path = args.hlo_stats
    if stats_path is None:
        import subprocess
        import sys
        cmd = [sys.executable, "scripts/train_roofline.py",
               "--batches", str(args.batch),
               "--decoder-kernel", args.decoder_kernel,
               "--steps", str(args.steps),
               "--profile-batch", str(args.batch), "--out", args.out]
        if args.head_kernel:
            cmd += ["--head-kernel", args.head_kernel]
        if args.embed_in_kernel:
            cmd += ["--embed-in-kernel"]
        subprocess.run(cmd, check=True)
        xplane = sorted(glob.glob(
            args.out + "/plugins/profile/*/*.xplane.pb"))[-1]
        from xprof.convert import raw_to_tool_data
        data, _ = raw_to_tool_data.xspace_to_tool_data(
            [xplane], "hlo_stats", {})
        stats_path = args.out + "/hlo_stats.json"
        with open(stats_path, "w") as f:
            f.write(data.decode() if isinstance(data, bytes) else data)

    rec = decompose(stats_path, args.steps)
    print(json.dumps(rec))
    print("\n| phase | ms/step | % of device time |")
    print("|---|---|---|")
    for k, v in rec["phases"].items():
        print(f"| {k} | {v['ms_per_step']} | {v['pct']} |")


if __name__ == "__main__":
    main()
