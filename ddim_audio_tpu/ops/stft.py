"""On-device "pfft" spectrogram codec (XLA FFT).

Rebuild of the reference's empty SST submodule from its call-site contract
(SURVEY.md §2.8; reference datasets/__init__.py:22-30,
runners/diffusion.py:409-420): audio ⇄ a 2-channel complex-STFT tensor
``[2, t_size, f_size]`` ("CTF" axis order) with values ≈ [-1, 1] (the DDPM
sampler clamps x0 there, reference functions/denoising.py:78). The exact SST
internals are unrecoverable (empty submodule), so this is a clean, exactly
invertible codec with the pinned shapes/ranges:

- n_fft = 2·(f_size − 1), hop = n_fft/2 — rfft yields exactly f_size bins,
  so the codec is **exactly** invertible (no dropped Nyquist)
- periodic Hann window at 50% overlap; the clip is treated as periodic (wrap
  padding by one hop), so every sample is covered by exactly two windows and
  the overlap-add inverse is exact and well-conditioned (win² sum ≥ 0.5)
- channels = (Re, Im) / scale, scale = n_fft/4 (amplitude-1 tone ≈ 1.0)

Everything is jnp; wrap in jit for the TPU path. ``data/codec.py`` holds the
numpy twin for host-side dataset/file IO; the two are tested for parity.
"""

from __future__ import annotations

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class STFTConfig:
    f_size: int = 256
    virtual_samplerate: int = 48000
    # HPI flag kept for config-surface parity (configs/audio.yml:7,73); this
    # codec stores the full complex STFT so inversion never needs phase
    # reconstruction — both HPI settings decode identically.
    HPI: bool = False

    @property
    def n_fft(self) -> int:
        return 2 * (self.f_size - 1)

    @property
    def hop(self) -> int:
        return self.f_size - 1

    @property
    def scale(self) -> float:
        return self.n_fft / 4.0


@functools.lru_cache(maxsize=8)
def _hann(n_fft: int) -> np.ndarray:
    # periodic Hann
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft)).astype(
        np.float32
    )


def num_samples(cfg: STFTConfig, t_size: int) -> int:
    """Audio samples consumed/produced for t_size frames."""
    return t_size * cfg.hop


def stft_pfft(wave, cfg: STFTConfig, t_size: int | None = None):
    """wave: [..., N] float in [-1, 1] → pfft [..., 2, T, f_size] ("CTF").

    N must be a multiple of hop; T = N/hop. Frame k is centered at sample
    k·hop, with periodic boundary (frame 0's left half wraps to the clip
    tail)."""
    w = jnp.asarray(wave)
    n_fft, hop = cfg.n_fft, cfg.hop
    n = w.shape[-1]
    if n % hop != 0:
        raise ValueError(f"audio length {n} must be a multiple of hop {hop}")
    t = n // hop
    if t_size is not None and t != t_size:
        raise ValueError(f"expected {t_size} frames, audio gives {t}")
    # wrap-pad one hop on the left: frame k covers original samples
    # [(k-1)·hop, (k+1)·hop) with periodic boundary. n_fft = 2·hop lets the
    # framing be two reshapes (no gather — TPU-friendly).
    wp = jnp.concatenate([w[..., -hop:], w], axis=-1)
    segs = wp.reshape(wp.shape[:-1] + (t + 1, hop))
    frames = jnp.concatenate([segs[..., :t, :], segs[..., 1:, :]], axis=-1)
    frames = frames * jnp.asarray(_hann(n_fft))
    spec = jnp.fft.rfft(frames, axis=-1) / cfg.scale  # exactly f_size bins
    out = jnp.stack([spec.real, spec.imag], axis=-3)  # [..., 2, T, F]
    return out.astype(jnp.float32)


def istft_pfft(pfft, cfg: STFTConfig):
    """pfft [..., 2, T, f_size] → wave [..., T·hop] float32. Exact inverse of
    ``stft_pfft``."""
    p = jnp.asarray(pfft)
    n_fft, hop = cfg.n_fft, cfg.hop
    t = p.shape[-2]
    spec = (p[..., 0, :, :] + 1j * p[..., 1, :, :]) * cfg.scale
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)
    win = jnp.asarray(_hann(n_fft))
    frames = frames * win  # synthesis window

    # overlap-add via reshapes: frame k's left hop lands at [(k-1)·hop, k·hop)
    # (frame 0's left hop wraps to the clip tail), right hop at [k·hop, (k+1)·hop)
    lead = frames.shape[:-2]
    left = frames[..., :hop].reshape(lead + (t * hop,))
    right = frames[..., hop:].reshape(lead + (t * hop,))
    out = jnp.concatenate(
        [right[..., : (t - 1) * hop] + left[..., hop:],
         right[..., (t - 1) * hop :] + left[..., :hop]],
        axis=-1,
    )
    wl, wr = win[:hop], win[hop:]
    den = jnp.tile(wl * wl + wr * wr, t)
    return out / den
