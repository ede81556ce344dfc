"""Datasets: VCTK file scanning + per-utterance preprocessing, plus a
synthetic sine dataset for tests/CI (no VCTK dependency — SURVEY.md §4.4).

Reference equivalents: ``train.py``'s VCTK file-list + speaker-dict build
and ``utils.py :: Preprocess`` (load -> trim -> random crop to length+1).
Companding/framing happen on device (audio/framing.py); the host side
only decodes, trims, and crops float audio.
"""

from __future__ import annotations

import os
import threading
from typing import List, Sequence, Tuple

import numpy as np

from vqvae_tpu.audio.wav_io import load_wav, trim_silence
from vqvae_tpu.configs import DataConfig


def scan_vctk(root: str, speaker: str | None = None
              ) -> Tuple[List[str], List[int], dict]:
    """Build (paths, speaker_ids, speaker_dict) from a VCTK-style tree:
    ``<root>/wav48/<speaker>/<utt>.wav`` (also accepts ``wav16``/flat dirs).
    Reference: train.py's file-list construction."""
    wav_dirs = [os.path.join(root, d) for d in ("wav48", "wav16", "wav")
                if os.path.isdir(os.path.join(root, d))]
    if not wav_dirs:
        wav_dirs = [root]
    paths, spk_names = [], []
    for wd in wav_dirs:
        for entry in sorted(os.listdir(wd)):
            sub = os.path.join(wd, entry)
            if os.path.isdir(sub):
                if speaker is not None and entry != speaker:
                    continue
                for f in sorted(os.listdir(sub)):
                    if f.endswith(".wav"):
                        paths.append(os.path.join(sub, f))
                        spk_names.append(entry)
            elif entry.endswith(".wav"):
                paths.append(sub)
                spk_names.append("single")
    speakers = sorted(set(spk_names))
    spk_dict = {s: i for i, s in enumerate(speakers)}
    ids = [spk_dict[s] for s in spk_names]
    return paths, ids, spk_dict


class WavDataset:
    """Random-crop utterance dataset over decoded files.

    ``sample(rng)`` -> (float32 [length+1], speaker_id). Decoded audio is
    LRU-cached so one host core can keep the chip fed (SURVEY.md §7 hard
    part 4); VCTK fits comfortably in RAM at 16 kHz float32.
    """

    def __init__(self, paths: Sequence[str], speaker_ids: Sequence[int],
                 cfg: DataConfig, cache_size: int = 4096):
        assert len(paths) == len(speaker_ids) and len(paths) > 0
        self.paths = list(paths)
        self.speaker_ids = list(speaker_ids)
        self.cfg = cfg
        self._cache: dict = {}
        self._cache_size = cache_size
        # BatchLoader workers are threads; evict/insert must not race
        self._cache_lock = threading.Lock()

    def __len__(self) -> int:
        return len(self.paths)

    def _decoded(self, i: int) -> np.ndarray:
        with self._cache_lock:
            wav = self._cache.get(i)
        if wav is None:
            wav = load_wav(self.paths[i], self.cfg.sr)
            wav = trim_silence(wav, self.cfg.top_db)
            with self._cache_lock:
                if len(self._cache) >= self._cache_size:
                    self._cache.pop(next(iter(self._cache)))
                self._cache[i] = wav
        return wav

    def sample(self, rng: np.random.Generator) -> Tuple[np.ndarray, int]:
        i = int(rng.integers(len(self.paths)))
        wav = self._decoded(i)
        need = self.cfg.length + 1
        if len(wav) < need:
            wav = np.pad(wav, (0, need - len(wav)))
        start = int(rng.integers(len(wav) - need + 1))
        return wav[start:start + need].astype(np.float32), \
            self.speaker_ids[i]

    def full(self, i: int) -> Tuple[np.ndarray, int]:
        """Whole (trimmed) utterance — generation/eval path (no crop)."""
        return self._decoded(i), self.speaker_ids[i]


class SineDataset:
    """Synthetic multi-'speaker' sine/harmonic dataset for tests & bench.

    Speaker s gets fundamental f0 * (s+1); deterministic given the rng.
    """

    def __init__(self, cfg: DataConfig, f0: float = 110.0):
        self.cfg = cfg
        self.f0 = f0

    def __len__(self) -> int:
        # nominal epoch for deterministic evaluation (train sampling is
        # IID and never consults len) — a synthetic set has no real
        # "full split", so keep the eval pass bounded and meaningful
        return 256

    def sample(self, rng: np.random.Generator) -> Tuple[np.ndarray, int]:
        need = self.cfg.length + 1
        spk = int(rng.integers(max(1, self.cfg.n_speakers)))
        f = self.f0 * (spk + 1)
        phase = rng.uniform(0, 2 * np.pi)
        t = np.arange(need, dtype=np.float32) / self.cfg.sr
        wav = (0.6 * np.sin(2 * np.pi * f * t + phase)
               + 0.3 * np.sin(4 * np.pi * f * t + 1.7 * phase))
        return wav.astype(np.float32), spk

    def full(self, i: int) -> Tuple[np.ndarray, int]:
        rng = np.random.default_rng(i)
        return self.sample(rng)


def train_valid_split(paths: Sequence[str], speaker_ids: Sequence[int],
                      valid_fraction: float, seed: int = 0):
    """Deterministic train/valid file split (reference: train.py's
    slice of the shuffled file list)."""
    n = len(paths)
    idx = np.random.default_rng(seed).permutation(n)
    n_valid = max(1, int(n * valid_fraction)) if valid_fraction > 0 \
        else 0
    vset = set(idx[:n_valid].tolist())
    tr = [(paths[i], speaker_ids[i]) for i in range(n) if i not in vset]
    va = [(paths[i], speaker_ids[i]) for i in range(n) if i in vset]
    unzip = lambda ps: (list(p[0] for p in ps), list(p[1] for p in ps))
    return unzip(tr), unzip(va)
