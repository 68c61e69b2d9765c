#!/usr/bin/env python
"""Slope-protocol timing of the production flat-io forward at sampling
scale: apply_model_flat_io on the unpadded [B, T, F*C] carried state,
exactly the op the sampler loop invokes every step (see
ddim_audio_tpu/sampling/driver.py).

Usage: python benchmarks/bench_fwd_slope.py [batch]
Prints one ms/forward number per config variant (production = audio.yml:
bf16 compute, int8 taps + int8 activation storage).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from benchmarks.timing import op_ms
from ddim_audio_tpu.config import load_config
from ddim_audio_tpu.models.unet import ModelConfig, apply_model_flat_io, init_model


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    config = load_config(os.path.join(os.path.dirname(__file__), "..",
                                      "configs", "audio.yml"))
    # The sampling-section overrides via the shared production helper —
    # the same config the runner serves and bench.py measures.
    from ddim_audio_tpu.config import production_eval_cfg
    cfg = production_eval_cfg(config, ModelConfig.from_config(config))
    params = init_model(jax.random.key(0), cfg)
    t = jnp.full((batch,), 500, jnp.int32)
    xf = jax.random.normal(
        jax.random.key(1), (batch, 8192, 256 * cfg.channels), jnp.float32)
    print(f"backend={jax.default_backend()} batch={batch} "
          f"dtype={cfg.dtype} act_store={getattr(cfg, 'act_store', None)} "
          f"tap_int8={getattr(cfg, 'tap_int8', None)}", flush=True)
    ms = op_ms(lambda x: apply_model_flat_io(params, x, t, cfg).astype(x.dtype),
               xf, renorm=True)
    print(f"forward (production cfg)           {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
