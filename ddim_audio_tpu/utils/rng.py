"""Deterministic RNG threading.

The reference relies on global torch/numpy RNG state seeded once
(``main.py:195-199``). A functional JAX framework instead threads explicit
keys; ``RngStream`` provides named, fold-in-derived keys so every consumer
(init, per-step noise, antithetic timesteps, dropout, per-shard noise) is
independently deterministic and reproducible across host counts.
"""

from __future__ import annotations

import hashlib

import jax


def _name_to_int(name: str) -> int:
    # Stable 32-bit tag per purpose-name.
    return int.from_bytes(hashlib.sha256(name.encode()).digest()[:4], "little")


class RngStream:
    """Derives per-purpose, per-step keys from one root seed.

    ``stream.key("sampler_noise", step)`` is a pure function of
    (seed, "sampler_noise", step) — no hidden state, safe under jit when the
    folded values are traced.
    """

    def __init__(self, seed: int):
        self.root = jax.random.key(seed)

    def key(self, name: str, *folds: int) -> jax.Array:
        k = jax.random.fold_in(self.root, _name_to_int(name))
        for f in folds:
            k = jax.random.fold_in(k, f)
        return k


def purpose_key(root: jax.Array, name: str, *folds) -> jax.Array:
    """Functional form usable inside jit: fold a purpose tag + indices."""
    k = jax.random.fold_in(root, _name_to_int(name))
    for f in folds:
        k = jax.random.fold_in(k, f)
    return k
