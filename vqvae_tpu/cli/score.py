"""Scoring CLI: deterministic evaluation of a trained model over a
dataset split (the reference's Evaluator extension as a standalone
command — SURVEY.md §2.1 Training CLI row; train-time eval shares the
same Evaluator, train/evaluator.py).

Scores are a reproducible function of (checkpoint, split): fixed
utterance list, one center crop each, fixed batching. Runs the same
jitted eval step as training, so it shards over whatever mesh is
requested — including the sequence-parallel decoder via ``--mesh-seq``.
"""

from __future__ import annotations

import argparse
import dataclasses
import json

from vqvae_tpu.cli.common import add_config_args, load_params, \
    make_dataset, resolve_config


def main() -> None:
    p = argparse.ArgumentParser(
        description="Score a trained VQ-VAE over a dataset split "
                    "(deterministic val_loss1/2/3)")
    add_config_args(p)
    p.add_argument("-m", "--model", required=True,
                   help="training run dir (or weights .npz)")
    p.add_argument("--dataset", default="vctk", choices=["vctk", "sine"])
    p.add_argument("--root", default=None, help="VCTK root directory")
    p.add_argument("--split", default="valid",
                   choices=["valid", "train"])
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--eval-batches", type=int, default=None,
                   help="cap the eval set (batches); default = config "
                        "(0 = the whole split)")
    p.add_argument("--mesh-model", type=int, default=None)
    p.add_argument("--mesh-seq", type=int, default=None,
                   help="sequence-parallel decoder over N time shards")
    p.add_argument("--json", action="store_true",
                   help="print one JSON line instead of a table")
    args = p.parse_args()

    cfg = resolve_config(args)
    tr = {}
    if args.batch_size is not None:
        tr["batch_size"] = args.batch_size
    if args.eval_batches is not None:
        tr["eval_batches"] = args.eval_batches
    if args.mesh_model is not None:
        tr["mesh_model"] = args.mesh_model
    if args.mesh_seq is not None:
        tr["mesh_seq"] = args.mesh_seq
    if tr:
        cfg = cfg.replace(train=dataclasses.replace(cfg.train, **tr))

    params = load_params(args.model, cfg)
    train_ds, valid_ds = make_dataset(cfg, args.dataset, args.root)
    ds = valid_ds if args.split == "valid" else train_ds
    if ds is None:
        p.error(f"no '{args.split}' split in this dataset")

    import jax

    from vqvae_tpu.parallel.mesh import make_mesh, param_shardings
    from vqvae_tpu.train.evaluator import Evaluator

    mesh = make_mesh(cfg.train.mesh_data, cfg.train.mesh_model,
                     cfg.train.mesh_slices, cfg.train.mesh_seq)
    # place params on the mesh (channel/codebook-sharded if model>1,
    # replicated otherwise) — load_params leaves them on one device
    params = jax.device_put(params, param_shardings(mesh, params))
    evaluator = Evaluator(ds, cfg, mesh)
    metrics = evaluator(params)
    n_windows = evaluator.n_windows
    rec = {"split": args.split, "windows": n_windows,
           **{k: round(float(v), 6) for k, v in metrics.items()}}
    if args.json:
        print(json.dumps(rec))
    else:
        print(f"{args.split} split: {n_windows} windows "
              f"(length {cfg.data.length})")
        for k, v in rec.items():
            if k.startswith("val_"):
                print(f"  {k:24s} {v:.6f}")


if __name__ == "__main__":
    main()
