"""Post-hoc 2-D spectrogram denoising (UPU rebuild).

The reference applies ``UPU.signal.denoise.denoise_2d`` to each sampled
spectrogram when ``sampling.denoise: True`` (reference
runners/diffusion.py:21,400-401; configs/audio.yml:72). The UPU submodule is
empty (SURVEY.md §2.9), so this rebuilds the capability as a local adaptive
Wiener filter (the scipy.signal.wiener formulation) over the (T, F) plane:

    m   = local mean (k×k box)
    v   = local variance
    σ²  = mean(v)                    (noise power estimate)
    out = m + max(v-σ², 0) / max(v, σ²) · (x - m)

Pure jnp, shape-preserving over [..., T, F]; jit-compatible.

``group_norm_1d`` is included for component parity with UPU's ``GroupNorm1D``
(imported by the reference model but never used, models/diffusion.py:9).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _box_filter_2d(x, k: int):
    """Mean filter over the last two axes with edge padding."""
    pad = k // 2
    lead = [(0, 0)] * (x.ndim - 2)
    xp = jnp.pad(x, lead + [(pad, pad), (pad, pad)], mode="edge")
    c = jnp.cumsum(jnp.cumsum(xp, axis=-1), axis=-2)
    c = jnp.pad(c, lead + [(1, 0), (1, 0)])
    t, f = x.shape[-2], x.shape[-1]
    s = (
        c[..., k : k + t, k : k + f]
        - c[..., :t, k : k + f]
        - c[..., k : k + t, :f]
        + c[..., :t, :f]
    )
    return s / (k * k)


def denoise_2d(x, kernel_size: int = 5):
    """x [..., T, F] → denoised x (adaptive Wiener over the T-F plane)."""
    x = jnp.asarray(x)
    m = _box_filter_2d(x, kernel_size)
    v = _box_filter_2d(jnp.square(x), kernel_size) - jnp.square(m)
    v = jnp.maximum(v, 0.0)
    sigma2 = jnp.mean(v, axis=(-2, -1), keepdims=True)
    # floor the denominator: v = sigma2 = 0 on constant regions (0/0 → NaN)
    gain = jnp.maximum(v - sigma2, 0.0) / jnp.maximum(jnp.maximum(v, sigma2), 1e-20)
    return m + gain * (x - m)


def group_norm_1d(x, gamma, beta, *, num_groups: int = 8, eps: float = 1e-6):
    """GroupNorm over [B, L, C] (channel-last 1-D sequences)."""
    b, l, c = x.shape
    xg = x.reshape(b, l, num_groups, c // num_groups)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.var(xg, axis=(1, 3), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    x = xg.reshape(b, l, c)
    return x * gamma + beta
