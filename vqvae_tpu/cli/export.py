"""Export CLI: training checkpoint -> weights-only .npz
(reference: the ``snapshot_object(model)`` weights-only snapshot next
to the full-Trainer snapshot — SURVEY.md §5.4). The .npz is the
deployment artifact: every decode-side CLI accepts ``-m weights.npz``
in place of a run directory (cli/common.py::load_params), so serving
hosts need neither orbax nor the optimizer state.
"""

from __future__ import annotations

import argparse
import os

from vqvae_tpu.cli.common import add_config_args, load_params, \
    resolve_config


def main() -> None:
    p = argparse.ArgumentParser(
        description="Export a weights-only .npz from a training run")
    add_config_args(p)
    p.add_argument("-m", "--model", required=True,
                   help="training run dir (or its checkpoints/)")
    p.add_argument("-o", "--output", default="weights.npz")
    args = p.parse_args()

    cfg = resolve_config(args)
    params = load_params(args.model, cfg)
    from vqvae_tpu.train.checkpoint import export_weights
    export_weights(args.output, params)
    import jax
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"wrote {args.output}: {n:,} params "
          f"({os.path.getsize(args.output) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
