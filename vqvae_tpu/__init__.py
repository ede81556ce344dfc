"""vqvae_tpu — a TPU-native VQ-VAE audio codec framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``dhgrs/chainer-VQ-VAE`` (see SURVEY.md): mu-law companded raw-audio
modeling with a strided-conv encoder, vector quantization with a
straight-through estimator, and a WaveNet decoder with fast (O(1)/sample)
autoregressive synthesis — redesigned for TPU:

* the whole train step is one ``jit``/``pjit`` program over a device mesh
  (data-parallel by ``NamedSharding``; gradients synced by XLA collectives),
* autoregressive decoding is a single on-device ``lax.scan`` whose carry is
  the per-layer ring-buffer state (never round-trips to host), with an
  optional fused Pallas kernel for the whole sampling loop,
* the VQ nearest-neighbour lookup is a fused Pallas kernel (distance +
  argmin + gather); the straight-through gradient is plain
  ``stop_gradient`` arithmetic (``e_st = z + sg(e - z)``) in models/vq.py
  — no custom autodiff plumbing needed.

Reference parity map (expected reference files, see SURVEY.md §2.1):
  utils.py :: mu_law      -> vqvae_tpu.audio.mu_law
  utils.py :: Preprocess  -> vqvae_tpu.audio.framing / vqvae_tpu.audio.datasets
  net.py   :: Encoder     -> vqvae_tpu.models.encoder
  net.py   :: VQ          -> vqvae_tpu.models.vq (+ vqvae_tpu.kernels.vq_pallas)
  net.py   :: Decoder     -> vqvae_tpu.models.wavenet
  net.py   :: fast gen    -> vqvae_tpu.infer.fastgen (+ kernels.decode_pallas)
  train.py                -> vqvae_tpu.train + vqvae_tpu.cli.train
  generate.py             -> vqvae_tpu.infer + vqvae_tpu.cli.generate
  opt.py                  -> vqvae_tpu.configs
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: CLI/bench processes are short-lived
# and the AR-decode scan costs tens of seconds to compile; cache
# executables across invocations (set VQVAE_TPU_XLA_CACHE="" to disable).
import os as _os  # noqa: E402

_cache_dir = _os.environ.get(
    "VQVAE_TPU_XLA_CACHE",
    _os.path.join(_os.path.expanduser("~"), ".cache", "vqvae_tpu_xla"))
if _cache_dir:
    try:
        import jax as _jax
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

from vqvae_tpu.configs import (  # noqa: F401
    Config,
    DataConfig,
    ModelConfig,
    TrainConfig,
    get_config,
)
