#!/usr/bin/env python
"""The production-knob matrix at sampling scale: {tap_int8 off/on} ×
{act_store off/int8}, each measured as ms/forward (slope protocol — the
axon tunnel's per-call constant cancels) AND full-forward SNR vs the fp32
XLA reference, on the exact op the sampler invokes per step
(apply_model_flat_io on the unpadded [B, T, F·C] carried state).

This is the measurement that decides the production default
(configs/audio.yml sampling.{tap_int8, act_store}); results recorded in
BASELINE.md. Reference workload: the denoiser call of the sampling hot
loop (reference functions/denoising.py:10-52).

Usage: python benchmarks/bench_prod_matrix.py [batch]
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from ddim_audio_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

from benchmarks.timing import op_ms
from ddim_audio_tpu.config import load_config
from ddim_audio_tpu.models.unet import (
    ModelConfig,
    apply_model_flat_io,
    init_model,
)


def _snr(ref, out):
    ref = np.asarray(ref, np.float64)
    out = np.asarray(out, np.float64)
    return 10 * np.log10((ref ** 2).mean() / ((out - ref) ** 2).mean() + 1e-300)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    config = load_config(os.path.join(os.path.dirname(__file__), "..",
                                      "configs", "audio.yml"))
    base = ModelConfig.from_config(config)
    params = init_model(jax.random.key(0), base)
    t = jnp.full((batch,), 500, jnp.int32)
    xf = jax.random.normal(
        jax.random.key(1), (batch, 8192, 256 * base.channels), jnp.float32)
    print(f"backend={jax.default_backend()} batch={batch}", flush=True)

    # fp32 flat reference output for the SNR column (the fp32-vs-XLA
    # exactness is separately pinned by tpu_tests/test_tpu_fullscale.py)
    cfg32 = dataclasses.replace(base, dtype=jnp.float32)
    ref = np.asarray(jax.jit(
        lambda x: apply_model_flat_io(params, x, t, cfg32))(xf))

    combos = [
        ("bf16            ", dict(dtype=jnp.bfloat16)),
        ("tap_int8        ", dict(dtype=jnp.bfloat16, tap_int8=True)),
        ("tap+strided_int8", dict(dtype=jnp.bfloat16, tap_int8=True,
                                  strided_int8=True)),
        ("act_int8        ", dict(dtype=jnp.bfloat16, act_store="int8")),
        ("tap+act_int8    ", dict(dtype=jnp.bfloat16, tap_int8=True,
                                  act_store="int8")),
    ]
    print(f"{'config':17s} {'ms/fwd':>8s} {'SNR dB':>8s}", flush=True)
    for name, kw in combos:
        cfg = dataclasses.replace(base, **kw)
        out = np.asarray(jax.jit(
            lambda x: apply_model_flat_io(params, x, t, cfg))(xf))
        ms = op_ms(
            lambda x: apply_model_flat_io(params, x, t, cfg).astype(x.dtype),
            xf, renorm=True)
        print(f"{name} {ms:8.2f} {_snr(ref, out):8.1f}", flush=True)


if __name__ == "__main__":
    main()
