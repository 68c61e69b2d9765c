"""Native C++ audio IO: decode/resample parity vs the Python fallback,
format coverage, corrupt-input handling. Skipped when the toolchain can't
build the shared library."""

import numpy as np
import pytest
from scipy.io import wavfile

from ddim_audio_tpu.data import native_io
from ddim_audio_tpu.data.codec import read_audio

pytestmark = pytest.mark.skipif(
    not native_io.available(), reason="native libaudio_io.so unavailable"
)


@pytest.fixture
def tone(tmp_path):
    sr = 22050
    t = np.arange(sr) / sr
    wave = (
        0.5 * np.sin(2 * np.pi * 440 * t)
        + 0.1 * np.random.default_rng(0).standard_normal(len(t))
    ).astype(np.float32)
    return tmp_path, sr, wave


def test_decode_int16_mono(tone):
    d, sr, wave = tone
    wavfile.write(d / "a.wav", sr, (wave * 32767).astype(np.int16))
    out = native_io.load_wav(str(d / "a.wav"), sr)
    assert out.dtype == np.float32 and len(out) == len(wave)
    assert np.abs(out - wave).max() < 1e-3


def test_decode_stereo_mixdown(tone):
    d, sr, wave = tone
    stereo = np.stack([wave, 0.5 * wave], axis=1)
    wavfile.write(d / "s.wav", sr, (stereo * 2147483000).astype(np.int32))
    out = native_io.load_wav(str(d / "s.wav"), sr)
    np.testing.assert_allclose(out, 0.75 * wave, atol=1e-4)


def test_decode_float32(tone):
    d, sr, wave = tone
    wavfile.write(d / "f.wav", sr, wave)
    out = native_io.load_wav(str(d / "f.wav"), sr)
    np.testing.assert_array_equal(out, wave)


def test_resample_matches_python_fallback(tone, monkeypatch):
    d, sr, wave = tone
    wavfile.write(d / "r.wav", sr, (wave * 32767).astype(np.int16))
    native = native_io.load_wav(str(d / "r.wav"), 16000)

    monkeypatch.setattr(native_io, "available", lambda: False)
    fallback = read_audio(str(d / "r.wav"), 16000)
    assert abs(len(native) - len(fallback)) <= 1
    n = min(len(native), len(fallback))
    np.testing.assert_allclose(native[:n], fallback[:n], atol=1e-4)


def test_corrupt_file_raises(tone):
    d, sr, wave = tone
    wavfile.write(d / "ok.wav", sr, (wave * 32767).astype(np.int16))
    raw = (d / "ok.wav").read_bytes()
    (d / "bad.wav").write_bytes(raw[:10])
    with pytest.raises(ValueError):
        native_io.load_wav(str(d / "bad.wav"), sr)


def test_read_audio_uses_native(tone):
    d, sr, wave = tone
    wavfile.write(d / "n.wav", sr, (wave * 32767).astype(np.int16))
    out = read_audio(str(d / "n.wav"), sr)
    assert np.abs(out - wave).max() < 1e-3
