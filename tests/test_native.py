"""Native C++ audio library vs the scipy/numpy reference paths."""

import numpy as np
import pytest
from scipy.io import wavfile

from vqvae_tpu.native import bindings as nat

pytestmark = pytest.mark.skipif(
    not nat.available(), reason="no C++ toolchain on this machine")


def _tone(sr=16000, secs=0.3):
    t = np.arange(int(sr * secs)) / sr
    return (0.5 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)


def test_native_decode_int16_mono(tmp_path):
    wav = _tone()
    p = str(tmp_path / "a.wav")
    wavfile.write(p, 16000, (wav * 32767).astype(np.int16))
    out, sr = nat.load_wav(p)
    assert sr == 16000 and out.shape == wav.shape
    assert np.max(np.abs(out - wav)) < 2e-4


def test_native_decode_stereo_downmix(tmp_path):
    wav = _tone()
    stereo = np.stack([wav, 0.5 * wav], 1)
    p = str(tmp_path / "s.wav")
    wavfile.write(p, 16000, (stereo * 32767).astype(np.int16))
    out, sr = nat.load_wav(p)
    assert np.max(np.abs(out - 0.75 * wav)) < 3e-4


def test_native_decode_float32(tmp_path):
    wav = _tone()
    p = str(tmp_path / "f.wav")
    wavfile.write(p, 22050, wav)  # float32 wav
    out, sr = nat.load_wav(p)
    assert sr == 22050
    assert np.max(np.abs(out - wav)) < 1e-6


def test_native_decode_int32(tmp_path):
    wav = _tone()
    p = str(tmp_path / "i32.wav")
    wavfile.write(p, 16000, (wav * 2147483000).astype(np.int32))
    out, _ = nat.load_wav(p)
    assert np.max(np.abs(out - wav)) < 1e-5


def test_native_matches_wav_io_pipeline(tmp_path):
    """wav_io.load_wav (which prefers the native path) == scipy path."""
    from vqvae_tpu.audio import wav_io
    wav = _tone()
    p = str(tmp_path / "w.wav")
    wav_io.save_wav(p, wav, 16000)
    via_pipeline = wav_io.load_wav(p, 16000)
    sr, data = wavfile.read(p)
    direct = data.astype(np.float32) / 32768.0
    assert np.max(np.abs(via_pipeline - direct)) < 1e-6


def test_native_mulaw_matches_jax():
    import jax.numpy as jnp
    from vqvae_tpu.audio.mu_law import mu_law_encode
    x = np.random.default_rng(0).uniform(-1.2, 1.2, 5000) \
        .astype(np.float32)
    ref = np.asarray(mu_law_encode(jnp.asarray(x), 256))
    got = nat.mulaw_encode(x, 256)
    # rounding of exactly-.5 values may differ in <=1e-6 of cases;
    # require exact match (lround vs round-half-even both round the
    # same direction for these inputs in practice)
    mismatch = int((ref != got).sum())
    assert mismatch <= 2, f"{mismatch} mu-law mismatches"


def test_native_mulaw_chainer_mode_matches_jax():
    """The chainer digitize-parity binning in C++ (float32 math)
    matches the jitted f32 path bit-for-bit away from bin edges."""
    import jax.numpy as jnp
    from vqvae_tpu.audio.mu_law import mu_law_encode
    x = np.random.default_rng(1).uniform(-1.2, 1.2, 5000) \
        .astype(np.float32)
    ref = np.asarray(mu_law_encode(jnp.asarray(x), 256, "chainer"))
    got = nat.mulaw_encode(x, 256, mode="chainer")
    mismatch = int((ref != got).sum())
    assert mismatch <= 2, f"{mismatch} chainer-mode mismatches"
    # the two modes genuinely differ (different companding constant)
    assert (nat.mulaw_encode(x, 256) != got).any()


def test_native_bad_file(tmp_path):
    p = str(tmp_path / "bad.wav")
    open(p, "wb").write(b"not a wav file at all, definitely not")
    with pytest.raises(ValueError):
        nat.load_wav(p)


def test_native_decoder_rejects_malformed_files(tmp_path):
    """Production-robustness: malformed inputs come back as clean error
    codes (ValueError via the bindings), never a crash or garbage
    buffer."""
    import struct

    def attempt(name, payload):
        p = str(tmp_path / name)
        with open(p, "wb") as f:
            f.write(payload)
        try:
            nat.load_wav(p)
            return None
        except ValueError as e:
            return str(e)

    # too short / not RIFF / truncated header
    assert attempt("short.wav", b"RIFF") is not None
    assert attempt("garbage.wav", bytes(range(100)) * 2) is not None
    # RIFF/WAVE but no fmt/data chunks
    assert attempt("empty.wav",
                   b"RIFF" + struct.pack("<I", 36) + b"WAVE"
                   + b"\x00" * 64) is not None
    # compressed format tag (2 = ADPCM) -> unsupported, not garbage
    fmt = struct.pack("<HHIIHH", 2, 1, 16000, 16000, 1, 8)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 4) + b"\x00" * 4)
    assert attempt("adpcm.wav",
                   b"RIFF" + struct.pack("<I", len(body)) + body) \
        is not None
    # data chunk longer than the file: decodes the clamped prefix
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 1 << 20) + b"\x00" * 64)
    p = str(tmp_path / "trunc.wav")
    with open(p, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(body)) + body)
    wav, sr = nat.load_wav(p)
    assert sr == 16000 and len(wav) == 32
    assert np.all(np.isfinite(wav))
