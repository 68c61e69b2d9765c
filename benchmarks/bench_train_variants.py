#!/usr/bin/env python
"""A/B the train step's memory-for-compute knobs at production scale
[14, 2, 1024, 256] fp32: {remat on/off} × {grad_accum 1/2/4}.

Both knobs were chosen in round 1 to FIT fp32 batch-14 in one 16 GB v5e
HBM; the round-3 measurement correction (MXU/VPU-bound kernels, ~650 GB/s
real bandwidth) re-opens the question — remat re-pays the whole forward in
the backward, and if a smaller microbatch fits WITHOUT remat the recompute
disappears. Variants that OOM print "oom" (that is a result: the knob is
load-bearing).

Usage: python benchmarks/bench_train_variants.py
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ddim_audio_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

from ddim_audio_tpu.config import load_config
from ddim_audio_tpu.diffusion.schedules import make_schedule
from ddim_audio_tpu.models.unet import ModelConfig, init_model
from ddim_audio_tpu.training import init_train_state, make_train_step

B = 14


def main():
    config = load_config(os.path.join(os.path.dirname(__file__), "..",
                                      "configs", "audio.yml"))
    base = ModelConfig.from_config(config)
    sched = make_schedule(
        config.diffusion.beta_schedule, config.diffusion.beta_start,
        config.diffusion.beta_end, config.diffusion.num_diffusion_timesteps)
    x0 = jax.random.normal(jax.random.key(1), (B, 2, 1024, 256)) * 0.5
    rng = jax.random.key(42)

    print(f"{'variant':28s} {'s/step':>8s}", flush=True)
    for remat in (True, False):
        for accum in (1, 2, 4):
            if B % accum:
                continue
            cfg = dataclasses.replace(base, remat=remat)
            config.training.grad_accum = accum
            try:
                params = init_model(jax.random.key(0), cfg)
                state, tx = init_train_state(
                    params, config.optimization, use_ema=True)
                step = make_train_step(cfg, config, sched.alphas_cumprod, tx)
                state, m = step(state, x0, rng)
                float(m["loss"])
                t0 = time.time()
                for _ in range(5):
                    state, m = step(state, x0, rng)
                float(m["loss"])
                dt = (time.time() - t0) / 5
                print(f"remat={remat!s:5s} grad_accum={accum}   {dt:8.3f}",
                      flush=True)
            except Exception as e:  # noqa: BLE001 — OOM is a result here
                msg = str(e).split("\n")[0][:80]
                print(f"remat={remat!s:5s} grad_accum={accum}   oom/err: "
                      f"{msg}", flush=True)
            finally:
                config.training.grad_accum = 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
