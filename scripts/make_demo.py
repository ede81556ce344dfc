"""Generate the committed audio-demo artifact (VERDICT r3 missing #3).

The reference's README links generated speech samples; with no VCTK in
this environment the honest stand-in is a synthetic before/after: the
held-out input tone, its mu-law-256 round trip (the model's fidelity
ceiling — the best ANY mu-law codec can reconstruct), and the codec's
actual reconstruction (encode -> VQ -> AR decode, sampled at
temperature 0.8), as wav files plus a log-spectrogram triptych PNG.

Usage (the README's committed artifacts came from this command):

    python scripts/quality_check.py --steps 6000        # train
    python scripts/make_demo.py -m <run_dir> -o docs/demo

or let it train its own tiny model first:

    python scripts/make_demo.py --steps 6000 -o docs/demo

The run dir is any vqvae-train/quality_check output (config.json +
checkpoints/); decoding uses the default lax engine.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from quality_check import (  # noqa: E402
    _decode,
    _encode,
    _held_out_tone,
    band_power,
    harmonic_ratio,
    train_tiny,
)


def _spectrogram(wav: np.ndarray, sr: int, nfft: int = 512):
    """Log-power STFT via numpy (no librosa in this environment)."""
    hop = nfft // 4
    n = 1 + (len(wav) - nfft) // hop
    frames = np.stack([wav[i * hop:i * hop + nfft] for i in range(n)])
    spec = np.abs(np.fft.rfft(frames * np.hanning(nfft), axis=1)) ** 2
    return 10.0 * np.log10(spec.T + 1e-10)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model",
                    help="run dir (config.json + checkpoints); trains "
                         "a fresh tiny model when omitted")
    ap.add_argument("-o", "--out", default="docs/demo")
    ap.add_argument("--steps", type=int, default=6000,
                    help="training steps when -m is omitted")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.model:
        from vqvae_tpu.cli.common import load_params
        from vqvae_tpu.configs import get_config
        from vqvae_tpu.configs.presets import load_config
        cfg = load_config(args.model) or get_config("tiny")
        params = load_params(args.model, cfg)
    else:
        params, cfg, _ = train_tiny(steps=args.steps)

    from vqvae_tpu.audio.mu_law import mu_law_decode, mu_law_encode
    from vqvae_tpu.audio.wav_io import save_wav
    import jax.numpy as jnp

    sr = cfg.data.sr
    tone = _held_out_tone(sr, 110.0)
    codes = _encode(params, cfg, tone)
    recon = _decode(params, cfg, codes, [0], args.seed, 0.8, "lax")[0]
    T = len(recon)
    ceiling = np.asarray(mu_law_decode(
        mu_law_encode(jnp.asarray(tone[:T]), cfg.model.mu),
        cfg.model.mu), np.float32)

    os.makedirs(args.out, exist_ok=True)
    clips = {"input": tone[:T], "mulaw_ceiling": ceiling,
             "reconstruction": recon}
    for name, wav in clips.items():
        save_wav(os.path.join(args.out, f"{name}.wav"),
                 np.asarray(wav, np.float32), sr)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, axes = plt.subplots(1, 3, figsize=(12, 3.2), sharey=True)
    for ax, (name, wav) in zip(axes, clips.items()):
        s = _spectrogram(np.asarray(wav, np.float64), sr)
        ax.imshow(s, origin="lower", aspect="auto", cmap="magma",
                  extent=[0, len(wav) / sr, 0, sr / 2 / 1000],
                  vmin=s.max() - 80, vmax=s.max())
        ax.set_title(name)
        ax.set_xlabel("s")
        ax.set_ylim(0, 2)       # the harmonics live below 2 kHz
    axes[0].set_ylabel("kHz")
    fig.tight_layout()
    png = os.path.join(args.out, "spectrogram_triptych.png")
    fig.savefig(png, dpi=110)

    metrics = {
        "band_spectral_correlation": round(float(np.corrcoef(
            band_power(ceiling, sr), band_power(recon, sr))[0, 1]), 4),
        "harmonic_energy_ratio": round(
            harmonic_ratio(recon, sr, 110.0), 4),
        "harmonic_energy_ratio_ceiling": round(
            harmonic_ratio(ceiling, sr, 110.0), 4),
        "sr": sr, "samples": int(T),
        "files": sorted(os.listdir(args.out)),
    }
    with open(os.path.join(args.out, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
