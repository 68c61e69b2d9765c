"""DDPM ("ddpm_steps") ancestral sampler math.

Capability parity with the reference ``functions/denoising.py:55-92``:
alpha_bar is re-derived with a prepended zero beta (``compute_alpha``, :4-7 —
numerically identical to the DDIM table); per step with a_t, a_{t-1}:

    beta_t = 1 - a_t / a_{t-1}
    x0     = sqrt(1/a_t) x - sqrt(1/a_t - 1) eps, clamped to [-1, 1]
    mean   = (sqrt(a_{t-1}) beta_t x0 + sqrt(1-beta_t)(1-a_{t-1}) x) / (1-a_t)
    x_next = mean + 1[t>0] * sqrt(beta_t) * N(0,1)      (fixedlarge variance)

Unlike the reference (which raises on select_index, :56-59), the scan driver
supports selective output here too — strictly more capable.
"""

from __future__ import annotations

import numpy as np


def ddpm_coefficients(betas: np.ndarray, seq) -> dict:
    """Per-scan-step arrays. Keys: t, at, coef_x0, coef_x, noise_scale."""
    b32 = np.asarray(betas, dtype=np.float32).astype(np.float64)
    abar = np.cumprod(1.0 - np.concatenate([[0.0], b32]))  # abar[t+1] = a_bar_t
    seq = [int(s) for s in seq]
    seq_next = [-1] + seq[:-1]
    ii = np.array(seq[::-1], dtype=np.int64)
    jj = np.array(seq_next[::-1], dtype=np.int64)
    at = abar[ii + 1]
    atm1 = abar[jj + 1]
    beta_t = 1.0 - at / atm1
    coef_x0 = np.sqrt(atm1) * beta_t / (1.0 - at)
    coef_x = np.sqrt(1.0 - beta_t) * (1.0 - atm1) / (1.0 - at)
    noise_scale = np.where(ii == 0, 0.0, np.exp(0.5 * np.log(beta_t)))
    return {
        "t": ii.astype(np.int32),
        "at": at.astype(np.float32),
        "coef_x0": coef_x0.astype(np.float32),
        "coef_x": coef_x.astype(np.float32),
        "noise_scale": noise_scale.astype(np.float32),
    }


def ddpm_step(x, eps, at, coef_x0, coef_x, noise_scale, noise):
    """One DDPM update. Returns (x0_pred_clamped, x_next)."""
    x0 = (1.0 / at) ** 0.5 * x - (1.0 / at - 1.0) ** 0.5 * eps
    x0 = x0.clip(-1.0, 1.0)
    x_next = coef_x0 * x0 + coef_x * x + noise_scale * noise
    return x0, x_next
