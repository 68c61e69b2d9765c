"""ctypes bindings for the native (C++) audio IO library.

``native/audio_io.cpp`` provides WAV decode → mono mixdown and linear
resampling; the training host feeds the TPU from one CPU core, so the decode
path matters. Falls back transparently to the scipy/numpy implementation in
``codec.read_audio`` when the shared library is absent and cannot be built.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libaudio_io.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    lib.decode_wav_mono.restype = ctypes.c_int
    lib.decode_wav_mono.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_longlong),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.resample_linear.restype = ctypes.c_int
    lib.resample_linear.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_longlong,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_longlong),
    ]
    lib.audio_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def load_wav(path: str, target_samplerate: int) -> np.ndarray | None:
    """Decode + mixdown + resample natively. Returns float32 [-1, 1] mono,
    or None when the native library is unavailable (caller falls back)."""
    lib = _load()
    if lib is None:
        return None
    with open(path, "rb") as f:
        raw = f.read()

    buf = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_longlong()
    sr = ctypes.c_int()
    rc = lib.decode_wav_mono(
        raw, len(raw), ctypes.byref(buf), ctypes.byref(n), ctypes.byref(sr)
    )
    if rc != 0:
        raise ValueError(f"native WAV decode failed (code {rc}): {path}")
    try:
        if sr.value == target_samplerate:
            return np.ctypeslib.as_array(buf, shape=(n.value,)).copy()
        out = ctypes.POINTER(ctypes.c_float)()
        m = ctypes.c_longlong()
        rc = lib.resample_linear(
            buf, n.value, sr.value, target_samplerate,
            ctypes.byref(out), ctypes.byref(m),
        )
        if rc != 0:
            raise ValueError(f"native resample failed (code {rc}): {path}")
        try:
            return np.ctypeslib.as_array(out, shape=(m.value,)).copy()
        finally:
            lib.audio_free(out)
    finally:
        lib.audio_free(buf)
