"""Test harness: force a virtual 8-device CPU mesh before jax imports.

The standard JAX trick for testing distributed code without a cluster
(SURVEY.md §4): ``xla_force_host_platform_device_count`` fakes N devices so
pjit/shard_map paths compile and execute; sharded outputs are asserted equal
to single-device outputs.
"""

import os

# The ambient environment pins JAX_PLATFORMS=axon (the real TPU tunnel) and
# the axon plugin overrides the env var — only jax.config.update below
# actually forces CPU. XLA_FLAGS must still be set pre-initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

# Parity tests compare against fp32 torch; JAX's DEFAULT matmul/conv
# precision downcasts operands (bf16-like passes even on CPU via oneDNN).
# Production exposes this as config.model.matmul_precision.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def tiny_model_config():
    """Small-but-structurally-complete model config for fast tests:
    3 stages (T divisible by 4), 2 fnet layers."""
    from ddim_audio_tpu.utils.namespace import dict2namespace
    from ddim_audio_tpu.models.unet import ModelConfig

    transformers = dict2namespace(
        {
            "module": "fnet",
            "kwargs": {
                "hidden_size": 32,
                "num_hidden_layers": 2,
                "intermediate_size": 64,
                "hidden_act": "gelu_new",
                "hidden_dropout_prob": 0.1,
                "initializer_range": 0.02,
                "layer_norm_eps": 1e-6,
            },
            "channels": 32,
            "dtype": None,
            "fourier_impl": "dft_matmul",
        }
    )
    return ModelConfig(
        channels=2,
        f_size=16,
        ch=(8, 16, 24),
        krn=(3, 3, 3),
        res=(1, 1, 2),
        num_timesteps=50,
        transformers=transformers,
    )


@pytest.fixture
def tiny_cfg():
    return tiny_model_config()
