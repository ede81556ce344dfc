"""Shared CLI plumbing: config resolution and checkpoint loading
(reference: the argparse + ``load_npz`` preamble shared by ``train.py``
and ``generate.py`` — SURVEY.md §2.1)."""

from __future__ import annotations

import argparse
import os

import jax

from vqvae_tpu.configs import Config, get_config
from vqvae_tpu.train.checkpoint import latest_step, restore_checkpoint
from vqvae_tpu.train.state import create_train_state


def add_config_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--preset", default=None,
                   help="config preset (tiny/vctk-single/vctk-multi/"
                        "fastgen/stretch); when omitted, decode-side "
                        "CLIs reload the config recorded by the "
                        "training run (-m dir/config.json)")
    p.add_argument("--mulaw-mode", default=None,
                   choices=["round", "chainer"],
                   help="mu-law binning: 'round' (TPU-native default) "
                        "or 'chainer' (the reference's digitize-style "
                        "bins, for bit-comparable loss curves)")
    p.add_argument("--set", action="append", default=[],
                   metavar="SECTION.FIELD=VALUE", dest="set_overrides",
                   help="typed override of any config field, e.g. "
                        "--set train.codebook_lr_mult=20 "
                        "--set model.ema=true (repeatable; applied "
                        "after --preset/config.json resolution)")


def _parse_override(cfg: Config, spec: str) -> Config:
    """Apply one ``section.field=value`` override, casting ``value``
    via the dataclass field's declared type."""
    import dataclasses
    try:
        key, raw = spec.split("=", 1)
        section, field = key.split(".", 1)
    except ValueError:
        raise SystemExit(
            f"--set expects SECTION.FIELD=VALUE, got {spec!r}")
    if section not in ("data", "model", "train"):
        raise SystemExit(
            f"--set: unknown section {section!r} (data/model/train)")
    sub = getattr(cfg, section)
    fields = {f.name: f for f in dataclasses.fields(sub)}
    if field not in fields:
        raise SystemExit(
            f"--set: no field {field!r} in {section} config "
            f"(have: {', '.join(sorted(fields))})")
    cur = getattr(sub, field)
    base = type(cur) if cur is not None else str
    if base is bool:
        if raw.lower() not in ("true", "false", "1", "0"):
            raise SystemExit(f"--set: {key} expects a bool, "
                             f"got {raw!r}")
        val = raw.lower() in ("true", "1")
    elif base in (int, float, str):
        try:
            val = base(raw)
        except ValueError:
            raise SystemExit(f"--set: {key} expects {base.__name__}, "
                             f"got {raw!r}")
    else:
        raise SystemExit(
            f"--set: field {key} has unsupported type {base.__name__}")
    return cfg.replace(**{section: dataclasses.replace(
        sub, **{field: val})})


def resolve_config(args) -> Config:
    """--preset if given; else the training run's recorded config.json
    (when the CLI has a -m/--model run dir); else the flagship.
    ``--mulaw-mode`` overrides whichever config was resolved."""
    cfg = None
    if args.preset is not None:
        cfg = get_config(args.preset)
    else:
        model = getattr(args, "model", None)
        if model and os.path.isdir(model):
            from vqvae_tpu.configs import load_config
            cfg = load_config(model)
            if cfg is not None:
                print(f"config: loaded "
                      f"{os.path.join(model, 'config.json')}"
                      f" (preset '{cfg.name}')")
    cfg = cfg or get_config("vctk-multi")
    if getattr(args, "mulaw_mode", None):
        import dataclasses
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, mulaw_mode=args.mulaw_mode))
    for spec in getattr(args, "set_overrides", []) or []:
        cfg = _parse_override(cfg, spec)
    return cfg


def checkpoint_dir(model_path: str) -> str:
    """Accept either a run out_dir or its checkpoints/ subdir."""
    sub = os.path.join(model_path, "checkpoints")
    return sub if os.path.isdir(sub) else model_path


def load_params(model_path: str, cfg: Config):
    """Restore model params from a training run directory, or from a
    weights-only .npz produced by export_weights (the reference's
    ``snapshot_object`` path)."""
    if model_path.endswith(".npz"):
        from vqvae_tpu.train.checkpoint import load_weights_npz
        template = create_train_state(jax.random.PRNGKey(0), cfg).params
        params = load_weights_npz(model_path, template)
        print(f"loaded weights-only snapshot {model_path}")
        return params
    ckpt = checkpoint_dir(model_path)
    step = latest_step(ckpt)
    if step is None:
        raise SystemExit(f"no checkpoint found under {model_path}")
    template = create_train_state(jax.random.PRNGKey(0), cfg)
    state = restore_checkpoint(ckpt, template, step)
    print(f"restored step {step} from {ckpt}")
    return state.params


def make_dataset(cfg: Config, kind: str, root: str | None = None):
    """Returns (train_dataset, valid_dataset-or-None)."""
    if kind == "sine":
        from vqvae_tpu.audio.datasets import SineDataset
        return SineDataset(cfg.data), SineDataset(cfg.data, f0=137.0)
    from vqvae_tpu.audio.datasets import (WavDataset, scan_vctk,
                                          train_valid_split)
    root = root or cfg.data.dataset_root
    paths, ids, spk_dict = scan_vctk(root, cfg.data.speaker)
    (tp, ti), (vp, vi) = train_valid_split(
        paths, ids, cfg.data.valid_fraction, cfg.data.seed)
    print(f"dataset: {len(paths)} files ({len(tp)} train / {len(vp)} "
          f"valid), {len(spk_dict)} speakers")
    valid = WavDataset(vp, vi, cfg.data) if vp else None
    return WavDataset(tp, ti, cfg.data), valid
