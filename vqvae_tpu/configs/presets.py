"""Typed, frozen configuration — the TPU-native replacement for the
reference's ``opt.py`` module of plain globals (SURVEY.md §2.1, §5.6).

Named presets correspond to BASELINE.json ``configs[]``:
  tiny          — configs[0]: K=128, 10-layer WaveNet, CPU-sized
  vctk-single   — configs[1]: single-speaker VCTK (p225), K=512
  vctk-multi    — configs[2]: multi-speaker VCTK with global conditioning
  fastgen       — configs[3]: batched fast autoregressive generation
  stretch       — configs[4]: EMA codebook + 30-layer WaveNet + batch-64
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Audio front-end (reference: ``opt.py`` + ``utils.py::Preprocess``)."""

    sr: int = 16000              # sample rate
    mu: int = 256                # mu-law classes (quantize)
    top_db: float = 20.0         # silence-trim threshold
    length: int = 7680           # training slice (samples); multiple of hop
    dataset_root: str = "VCTK-Corpus"
    n_speakers: int = 109        # VCTK speaker count
    speaker: str | None = None   # restrict to one speaker id (e.g. "p225")
    valid_fraction: float = 0.01
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Model shape (reference: ``opt.py`` globals consumed by ``net.py``)."""

    mu: int = 256                # decoder softmax classes == input framing
    # mu-law binning: "round" (TPU-native, decode is a fixed point of
    # encode) or "chainer" (the reference's digitize-style binning —
    # the turn-key parity switch, see audio/mu_law.py)
    mulaw_mode: str = "round"
    # --- encoder: stack of strided 1-D convs (stride 2, kernel 4) ---
    enc_channels: int = 128
    enc_layers: int = 6          # 2**6 = 64x downsampling
    enc_kernel: int = 4
    enc_stride: int = 2
    # --- vector quantizer ---
    K: int = 512                 # codebook size
    d: int = 64                  # embedding dim (latent channels)
    beta: float = 0.25           # commitment cost
    ema: bool = False            # EMA codebook updates (stretch config)
    ema_decay: float = 0.99
    ema_eps: float = 1e-5
    # dead-code restart (EMA mode): codebook rows whose EMA usage count
    # falls below this are re-seeded from random encoder outputs of the
    # current batch. 0 disables. Not in the reference — standard
    # production mitigation for codebook collapse.
    code_restart_threshold: float = 0.0
    # --- WaveNet decoder ---
    n_loop: int = 3              # dilation-cycle repeats
    n_layer: int = 10            # layers per cycle; dilations 1,2,4,...,2**(n-1)
    residual_channels: int = 64
    skip_channels: int = 256
    filter_size: int = 2         # causal conv taps (reference uses 2)
    # --- conditioning ---
    n_speakers: int = 109        # 0/1 disables global conditioning
    speaker_embed_dim: int = 64
    upsample_kernel_mult: int = 2  # transposed-conv kernel = mult * hop
    # --- numerics ---
    compute_dtype: str = "bfloat16"  # matmul/conv dtype on TPU
    param_dtype: str = "float32"
    # training-path gated-residual stack implementation: "xla" (layer
    # loop of shifted matmuls), "pallas" (fused chunk kernels with a
    # recomputing custom-vjp backward — zero activation HBM), or
    # "pallas_sg" (same kernels, but the forward saves the gate halves
    # to HBM so the backward skips the u-matmul/transcendental
    # recompute — kernels/wavenet_train_pallas.py; tradeoff measured in
    # docs/PERF.md). Numerically pinned against each other in
    # tests/test_kernels.py.
    decoder_kernel: str = "xla"
    # encoder implementation: "xla" (strided convs as folded matmuls,
    # ops/conv.py) or "pallas" (whole stack fused in one kernel —
    # kernels/encoder_pallas.py)
    encoder_kernel: str = "xla"
    # training-path head + softmax-CE: "xla" or "pallas" (one fused
    # kernel over row tiles — the f32 [B,T,mu] logits tensor never
    # touches HBM; kernels/head_ce_pallas.py). bf16-tolerance vs the
    # XLA chain (w2 multiplies in bf16 in-kernel, f32 in XLA); golden
    # trajectories and inference always use the XLA head. Ignored when
    # the decoder runs sequence-parallel (mesh_seq>1): the SP stack
    # computes full logits per time shard and keeps the XLA CE.
    head_kernel: str = "xla"
    # pallas/pallas_sg decoder kernels only: compute the input
    # embedding INSIDE the first chunk kernel (ids + the [2,mu,R]
    # table go in; h and dh never touch HBM — the backward contracts
    # dh against in-VMEM one-hots for the table gradient). Profile
    # target: the XLA embedding fwd+bwd was 3.7 ms / 5% of the B=64
    # step (docs/PERF.md). Parity pinned in tests/test_kernels.py.
    embed_in_kernel: bool = False
    # decoder_kernel="pallas" only: >1 time-windows the recompute
    # backward (sum(dils)-halo grid over T-chunks) so its VMEM scratch
    # shrinks ~n-fold and the batch group returns to G=2; needs
    # length % windows == 0 and length/windows >= max dilation.
    # 0 = single full-T backward program per batch element.
    bwd_time_windows: int = 0
    remat: bool = False          # jax.checkpoint each decoder layer:
    # trades recompute FLOPs for backward activation memory. Measured on
    # v5e flagship: hurts throughput at B<=64 (compute-bound), so off by
    # default; enable for memory-limited configs (long T / wide stacks)

    @property
    def dilations(self) -> Tuple[int, ...]:
        return tuple(2 ** i for i in range(self.n_layer)) * self.n_loop

    @property
    def n_layers_total(self) -> int:
        return self.n_loop * self.n_layer

    @property
    def receptive_field(self) -> int:
        # input conv (kernel 2) + sum over layers of (filter-1)*dilation
        return 2 + (self.filter_size - 1) * sum(self.dilations)

    @property
    def hop(self) -> int:
        """Total encoder downsampling factor (latent hop in samples)."""
        return self.enc_stride ** self.enc_layers

    @property
    def cdtype(self):
        return jnp.dtype(self.compute_dtype)

    @property
    def pdtype(self):
        return jnp.dtype(self.param_dtype)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training engine (reference: ``train.py`` Trainer/Updater wiring)."""

    batch_size: int = 16          # global batch (sharded over the data axis)
    lr: float = 2e-4
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    # non-EMA (gradient) codebook: multiplier on the codebook leaf's
    # Adam update (1.0 = reference behaviour; see train/state.py)
    codebook_lr_mult: float = 1.0
    num_steps: int = 200_000
    log_every: int = 100
    eval_every: int = 0          # 0 disables validation evaluation
    # deterministic eval set size cap, in batches; 0 = the full valid
    # split (one center crop per utterance — train/evaluator.py)
    eval_batches: int = 0
    checkpoint_every: int = 2000
    keep_checkpoints: int = 5
    tensorboard: bool = False    # also mirror metrics to TB scalars
    loader: str = "threads"      # host pipeline: "threads" | "grain"
    profile_steps: int = 0       # trace steps [10, 10+N) to <out>/profile
    out_dir: str = "result"
    seed: int = 0
    # device mesh axis sizes; data axis is padded with -1 = "all remaining"
    mesh_data: int = -1
    mesh_model: int = 1
    mesh_slices: int = 1         # multi-slice pods: outer DCN axis
    # sequence-parallel axis: decoder activations time-sharded with
    # per-layer halo exchange (parallel/sp_decoder.py); requires
    # max(dilations) <= length / mesh_seq
    mesh_seq: int = 1


@dataclasses.dataclass(frozen=True)
class Config:
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    name: str = "default"

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def _tiny() -> Config:
    """BASELINE configs[0]: tiny VQ-VAE (K=128, 10-layer WaveNet), CPU-OK."""
    model = ModelConfig(
        enc_channels=32, K=128, d=16,
        n_loop=1, n_layer=10,
        residual_channels=32, skip_channels=64,
        n_speakers=4, speaker_embed_dim=8,
        compute_dtype="float32",
    )
    data = DataConfig(length=1024, n_speakers=4)
    train = TrainConfig(batch_size=4, num_steps=100, log_every=10,
                        checkpoint_every=50)
    return Config(data=data, model=model, train=train, name="tiny")


def _vctk_single() -> Config:
    """BASELINE configs[1]: single-speaker VCTK (p225), K=512."""
    model = ModelConfig(n_speakers=1, speaker_embed_dim=16,
                        decoder_kernel="pallas")
    data = DataConfig(speaker="p225", n_speakers=1)
    return Config(data=data, model=model,
                  train=TrainConfig(eval_every=1000),
                  name="vctk-single")


def _vctk_multi() -> Config:
    """BASELINE configs[2]: multi-speaker VCTK, global conditioning.

    decoder_kernel='pallas': measured faster than the XLA layer loop at
    the preset batch (B=16: 21.2 vs 24.1 ms/step) and scales linearly
    where XLA collapses (B=32: 41.5 vs 76.4) — docs/PERF.md. First
    compile of the fused kernels is minutes (persistent-cached).
    """
    return Config(model=ModelConfig(decoder_kernel="pallas"),
                  train=TrainConfig(eval_every=1000), name="vctk-multi")


def _fastgen() -> Config:
    """BASELINE configs[3]: batched fast generation (model == vctk-multi)."""
    return Config(name="fastgen")


def _stretch() -> Config:
    """BASELINE configs[4]: EMA codebook + 30-layer WaveNet + batch 64."""
    # pallas decoder kernels: 2.6x over the XLA loop at B=64
    # (84 vs 222 ms/step on one v5e core); the save-gates backward is
    # the measured-best variant at B>=32 (76.4 vs 80.0 ms at B=64 —
    # docs/PERF.md "Save-gates backward"), and the fused head+CE
    # kernel saves another ~4 ms at B=64 (74.2 vs 78.4 ms — PERF.md
    # "Fused head+CE kernel"), so this B=64 preset ships both
    # ...and the in-kernel input embedding buys another 2.3 ms at
    # B=64 (69.8 vs 72.1 ms/step = 917 vs 888 utt/s, on-chip loss rel
    # delta 5e-7 — scripts/embed_kernel_bench.py, PERF.md round 5);
    # with the packed-matmul upsampler (ops/conv.py, PERF.md round 5)
    # the shipped step is 66.3 ms = 966 utt/s at B=64
    model = ModelConfig(ema=True, code_restart_threshold=1e-3,
                        decoder_kernel="pallas_sg",
                        head_kernel="pallas",
                        embed_in_kernel=True)
    train = TrainConfig(batch_size=64, eval_every=1000)
    return Config(model=model, train=train, name="stretch")


PRESETS = {
    "tiny": _tiny,
    "vctk-single": _vctk_single,
    "vctk-multi": _vctk_multi,
    "fastgen": _fastgen,
    "stretch": _stretch,
    "default": Config,
}


def get_config(name: str = "default", **overrides) -> Config:
    cfg = PRESETS[name]()
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
    return cfg


# --- config persistence (run-dir config.json) ---------------------------
# The reference couples every entry point to one opt.py; here the
# training run records its resolved config so the decode-side CLIs can
# reload it and never mismatch presets (SURVEY.md §2.1 opt.py row).


def config_to_json(cfg: Config) -> str:
    return json.dumps(dataclasses.asdict(cfg), indent=2, sort_keys=True)


def _from_dict(cls, d: dict):
    # forward-compatible: ignore keys a newer/older build doesn't know
    fields = {f.name for f in dataclasses.fields(cls)}
    return cls(**{k: v for k, v in d.items() if k in fields})


def config_from_json(text: str) -> Config:
    d = json.loads(text)
    return Config(
        data=_from_dict(DataConfig, d.get("data", {})),
        model=_from_dict(ModelConfig, d.get("model", {})),
        train=_from_dict(TrainConfig, d.get("train", {})),
        name=d.get("name", "default"),
    )


def save_config(cfg: Config, out_dir: str) -> str:
    path = os.path.join(out_dir, "config.json")
    with open(path, "w") as f:
        f.write(config_to_json(cfg))
    return path


def load_config(run_dir: str) -> Config | None:
    """The config recorded by a training run, or None."""
    path = os.path.join(run_dir, "config.json")
    if not os.path.isfile(path):
        return None
    with open(path) as f:
        return config_from_json(f.read())
