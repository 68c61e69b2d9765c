#!/usr/bin/env python
"""Bisect the batch-14 train step: fwd-only loss, value_and_grad, and the
full jitted train step (optimizers + EMA), at the production scale
[14, 2, 1024, 256] fp32 with audio.yml's remat + grad_accum settings.

Usage: bench_train_bisect.py [fwd|grad|step ...]
Tunnel-safe timing: chained lax.scan inside one jit, host-fetch sync."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ddim_audio_tpu.config import load_config
from ddim_audio_tpu.diffusion.schedules import make_schedule
from ddim_audio_tpu.models import ModelConfig, apply_model, init_model
from ddim_audio_tpu.training.losses import loss_registry
from ddim_audio_tpu.training.train_step import (
    init_train_state,
    make_train_step,
)

B, C, T, F = 14, 2, 1024, 256


def call_overhead():
    f = jax.jit(lambda x: jnp.sum(x * 1.000001))
    x = jnp.ones((8, 128), jnp.float32)
    float(f(x))
    ts = []
    for _ in range(5):
        t0 = time.time()
        float(f(x))
        ts.append(time.time() - t0)
    return min(ts)


def main():
    config = load_config(os.path.join(os.path.dirname(__file__), "..",
                                      "configs", "audio.yml"))
    cfg = ModelConfig.from_config(config)
    params = init_model(jax.random.key(0), cfg)
    sched = make_schedule(
        config.diffusion.beta_schedule, config.diffusion.beta_start,
        config.diffusion.beta_end, config.diffusion.num_diffusion_timesteps)
    alphas = jnp.asarray(sched.alphas_cumprod, jnp.float32)
    loss_impl = loss_registry[config.model.type]
    ovh = call_overhead()
    x0 = jax.random.normal(jax.random.key(1), (B, C, T, F), jnp.float32)
    tt = jnp.arange(B, dtype=jnp.int32) * 70
    e = jax.random.normal(jax.random.key(2), (B, C, T, F), jnp.float32)

    which = sys.argv[1:] or ["fwd", "grad", "step"]
    iters = 4

    def apply_fn(p, x, t_):
        return apply_model(p, x, t_, cfg, train=True, rng=jax.random.key(3))

    if "fwd" in which:
        @jax.jit
        def fwd_chain(p, x0):
            def body(h, _):
                loss = loss_impl(apply_fn, p, h, tt, e, alphas)
                return h * jax.lax.rsqrt(loss / 1e6 + 1.0), None
            return jax.lax.scan(body, x0, None, length=iters)[0]

        out = fwd_chain(params, x0)
        out.block_until_ready()
        best = min(
            _timed(lambda: float(jnp.sum(jnp.abs(fwd_chain(params, x0)))))
            for _ in range(2))
        print(f"fwd-only loss (train mode):  {(best - ovh) / iters * 1e3:8.1f} ms",
              flush=True)

    if "grad" in which:
        @jax.jit
        def grad_chain(p, x0):
            def body(h, _):
                loss, g = jax.value_and_grad(
                    lambda pp: loss_impl(apply_fn, pp, h, tt, e, alphas)
                )(p)
                gn = sum(jnp.sum(jnp.square(x)) for x in jax.tree.leaves(g))
                return h * jax.lax.rsqrt((loss + gn) / 1e9 + 1.0), None
            return jax.lax.scan(body, x0, None, length=iters)[0]

        out = grad_chain(params, x0)
        out.block_until_ready()
        best = min(
            _timed(lambda: float(jnp.sum(jnp.abs(grad_chain(params, x0)))))
            for _ in range(2))
        print(f"value_and_grad (no opt):     {(best - ovh) / iters * 1e3:8.1f} ms",
              flush=True)

    if "step" in which:
        state, tx = init_train_state(
            params, config.optimization, use_ema=bool(config.model.ema))
        train_step = make_train_step(cfg, config, sched.alphas_cumprod, tx)
        rng_root = jax.random.key(7)
        # warm
        state2, m = train_step(state, x0, rng_root)
        jax.tree_util.tree_map(lambda o: o.block_until_ready(), state2.params)
        ts = []
        st = state2
        for _ in range(4):
            t0 = time.time()
            st, m = train_step(st, x0, rng_root)
            float(m["loss"])
            ts.append(time.time() - t0)
        print(f"full train step (opt + EMA): {(min(ts) - ovh) * 1e3:8.1f} ms",
              flush=True)


def _timed(fn):
    t0 = time.time()
    fn()
    return time.time() - t0


if __name__ == "__main__":
    main()
