"""Timestep ("beta") embedding.

Capability parity with the reference ``BetaEmbedding``
(``models/diffusion.py:95-120``): a fixed interleaved sin/cos table
``[num_timesteps, 128]`` gathered by t, followed by an MLP
128 → 512 → 512 → sum(embedding_size) with SiLU between layers (not after
the last). The output is split into one per-resblock chunk
(``models/diffusion.py:248-250``).

The table is a compile-time constant (the reference registers it as a
buffer, not a parameter — it is excluded from optimizers and EMA), so it
lives outside the param pytree here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .layers import linear_apply, linear_init, sinusoid_table

POS_CH = 128
EMB_CH = 512


def beta_embedding_init(key, num_timesteps: int, channel_sz: int, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "mlp": [
            linear_init(k1, POS_CH, EMB_CH, dtype=dtype),
            linear_init(k2, EMB_CH, EMB_CH, dtype=dtype),
            linear_init(k3, EMB_CH, channel_sz, dtype=dtype),
        ]
    }


def beta_embedding_apply(params, t, *, num_timesteps: int, dtype=jnp.float32):
    """t: int array [B] → [B, channel_sz]."""
    table = jnp.asarray(sinusoid_table(num_timesteps, POS_CH), dtype=dtype)
    # mode="clip": jnp.take's default OOB mode fills NaN, which silently
    # poisons the whole forward if t ever exceeds the table.
    x = jnp.take(table, t, axis=0, mode="clip")
    x = linear_apply(params["mlp"][0], x)
    x = jax.nn.silu(x)
    x = linear_apply(params["mlp"][1], x)
    x = jax.nn.silu(x)
    x = linear_apply(params["mlp"][2], x)
    return x
