"""Training CLI (reference: ``python train.py -g 0 1 -r snap`` —
SURVEY.md §2.1 Training CLI row).

The reference's ``-g/--gpu`` device list becomes mesh axis sizes — the
framework shards over every visible TPU chip by default.
"""

from __future__ import annotations

import argparse
import dataclasses

from vqvae_tpu.cli.common import add_config_args, make_dataset, \
    resolve_config
from vqvae_tpu.train import train


def main() -> None:
    # multi-host pods: wire this process into the global mesh before
    # any jax.devices() call (no-op single-host — parallel/distributed)
    from vqvae_tpu.parallel.distributed import initialize_from_env
    initialize_from_env()
    p = argparse.ArgumentParser(description="Train a VQ-VAE (TPU-native)")
    add_config_args(p)
    p.add_argument("--dataset", default="vctk", choices=["vctk", "sine"])
    p.add_argument("--root", default=None, help="VCTK root directory")
    p.add_argument("-r", "--resume", action="store_true",
                   help="resume from the latest checkpoint in --out")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--out", default=None, help="output directory")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--mesh-model", type=int, default=None,
                   help="'model' (tensor-parallel) mesh axis size")
    p.add_argument("--mesh-slices", type=int, default=None,
                   help="multi-slice pods: outer (DCN) mesh axis size")
    p.add_argument("--mesh-seq", type=int, default=None,
                   help="sequence-parallel mesh axis size: decoder "
                        "activations time-sharded with halo exchange "
                        "(needs max dilation <= length/mesh_seq)")
    p.add_argument("--impl", default="lax", choices=["lax", "pallas"],
                   help="VQ kernel implementation")
    p.add_argument("--decoder-kernel", default=None,
                   choices=["xla", "pallas", "pallas_sg"],
                   help="training-path gated-residual stack: XLA layer "
                        "loop or fused Pallas chunk kernels")
    p.add_argument("--bwd-windows", type=int, default=None,
                   help="pallas decoder kernel: time-window the "
                        "recompute backward into N chunks (restores "
                        "the G=2 batch group; see kernels/)")
    p.add_argument("--loader", default=None,
                   choices=["threads", "grain"],
                   help="host input pipeline (identical stream; "
                        "grain adds worker processes)")
    p.add_argument("--eval-every", type=int, default=None,
                   help="validation evaluation interval (steps)")
    p.add_argument("--tensorboard", action="store_true",
                   help="also write TensorBoard scalars to <out>/tb")
    p.add_argument("--profile", type=int, default=None, metavar="N",
                   help="jax.profiler-trace N steps to <out>/profile")
    args = p.parse_args()

    cfg = resolve_config(args)
    tr = {}
    if args.steps is not None:
        tr["num_steps"] = args.steps
    if args.batch_size is not None:
        tr["batch_size"] = args.batch_size
    if args.out is not None:
        tr["out_dir"] = args.out
    if args.mesh_model is not None:
        tr["mesh_model"] = args.mesh_model
    if args.mesh_slices is not None:
        tr["mesh_slices"] = args.mesh_slices
    if args.mesh_seq is not None:
        tr["mesh_seq"] = args.mesh_seq
    if args.loader is not None:
        tr["loader"] = args.loader
    if args.eval_every is not None:
        tr["eval_every"] = args.eval_every
    if args.tensorboard:
        tr["tensorboard"] = True
    if args.profile is not None:
        tr["profile_steps"] = args.profile
    if tr:
        cfg = cfg.replace(train=dataclasses.replace(cfg.train, **tr))
    if args.decoder_kernel is not None:
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, decoder_kernel=args.decoder_kernel))
    if args.bwd_windows is not None:
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, bwd_time_windows=args.bwd_windows))

    dataset, valid = make_dataset(cfg, args.dataset, args.root)
    train(cfg, dataset, out_dir=cfg.train.out_dir, resume=args.resume,
          impl=args.impl, valid_dataset=valid)


if __name__ == "__main__":
    main()
