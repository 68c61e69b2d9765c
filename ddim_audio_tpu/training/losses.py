"""Training losses.

Capability parity with the reference ``functions/losses.py:4-23``: the simple
ε-prediction DDPM loss — ``x_t = sqrt(a_t)·x0 + sqrt(1-a_t)·e``, squared
error **summed over (C, T, F)** and averaged over the batch (the reference's
scaling, deliberately preserved), keyed by ``config.model.type`` in a
registry.
"""

from __future__ import annotations

import jax.numpy as jnp


def noise_estimation_loss(apply_fn, params, x0, t, e, alphas_cumprod, *, keepdim=False):
    """apply_fn(params, x, t) -> eps_hat. alphas_cumprod: [T] array."""
    a = alphas_cumprod[t][:, None, None, None].astype(x0.dtype)
    x = x0 * jnp.sqrt(a) + e * jnp.sqrt(1.0 - a)
    out = apply_fn(params, x, t)
    per_sample = jnp.square(e - out).sum(axis=(1, 2, 3))
    if keepdim:
        return per_sample
    return per_sample.mean(axis=0)


loss_registry = {
    "simple": noise_estimation_loss,
}
