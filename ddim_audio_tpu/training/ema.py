"""Exponential moving average of parameters.

Capability parity with the reference ``EMAHelper`` (``models/ema.py:4-51``):
shadow initialized to the params, per-step ``shadow = (1-mu)·p + mu·shadow``
(mu = 0.9999, configs/audio.yml:53), ``ema_apply`` returns the shadow as the
eval params. Pure pytree ops — fused into the jitted train step, no
name-keyed dict walking."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_init(params):
    # Fresh buffers, not aliases: the train step donates its TrainState, and
    # donating the same underlying buffer twice (params leaf + ema leaf) is a
    # runtime error.
    return jax.tree_util.tree_map(jnp.copy, params)


def ema_update(shadow, params, mu: float):
    return jax.tree_util.tree_map(
        lambda s, p: (1.0 - mu) * p + mu * s, shadow, params
    )


def ema_apply(shadow):
    """The reference copies shadow values into the model (models/ema.py:26-31);
    functionally, the shadow *is* the EMA model's params."""
    return shadow
