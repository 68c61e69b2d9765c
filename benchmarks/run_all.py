#!/usr/bin/env python
"""Full benchmark suite — one JSON line per BASELINE.json config row.

(bench.py stays the driver's single-line entry point — row 1 only; this
script measures every row on the real TPU. ~15 min cold, fast with the
compile cache.)

Rows (BASELINE.json "configs"):
1. audio.yml DDIM sampling, eta=0, 100 steps, batch 1   → per-clip seconds
2. training step (loss + 2 optimizers + EMA), batch 14  → seconds/step
3. --sequence N intermediate-trajectory sampling         → seconds (10 kept)
4. ddpm_steps, eta=1, 1000 steps, batched num_samples=2 → seconds
5. data-parallel batched sampling                        → covered by
   tests/test_parallel.py on the virtual mesh (this host has 1 chip)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ddim_audio_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from ddim_audio_tpu.config import load_config, production_eval_cfg
    from ddim_audio_tpu.diffusion.schedules import (
        make_schedule,
        make_timestep_subsequence,
    )
    from ddim_audio_tpu.models.unet import ModelConfig, apply_model, init_model
    from ddim_audio_tpu.sampling.driver import ScanSampler
    from ddim_audio_tpu.training import init_train_state, make_train_step

    config = load_config("configs/audio.yml")
    cfg = ModelConfig.from_config(config)
    # Sampling rows run ALL production inference overrides (sampling.dtype,
    # act_store, tap_int8) through the shared helper — exactly the config
    # the runner serves and bench.py measures; the train row keeps
    # model.dtype.
    eval_cfg = production_eval_cfg(config, cfg)
    sched = make_schedule(
        config.diffusion.beta_schedule,
        config.diffusion.beta_start,
        config.diffusion.beta_end,
        config.diffusion.num_diffusion_timesteps,
    )
    params = init_model(jax.random.key(0), cfg)

    # production flat-io sampling state (the single adapter contract from
    # models.unet, shared with runners/_sampler_for_state and bench.py)
    from ddim_audio_tpu.models.unet import (
        _supports_full_flat,
        apply_model_flat_io,
        flat_io_adapters,
    )

    flat_io = (_supports_full_flat(eval_cfg)
               and jax.default_backend() == "tpu")
    to_flat, from_flat, noise_builder = flat_io_adapters(eval_cfg)

    if flat_io:
        def denoise(p, xf, t):
            return apply_model_flat_io(p, xf, t, eval_cfg)

        sampler_kwargs = dict(state_to_saved=from_flat,
                              noise_builder=noise_builder)
        prep = to_flat
    else:
        def denoise(p, x, t):
            return apply_model(p, x, t, eval_cfg, train=False)

        sampler_kwargs = {}
        prep = lambda v: v  # noqa: E731

    def fetch(o):
        return float(jnp.sum(jnp.abs(o.astype(jnp.float32))))

    def emit(metric, value, unit="s"):
        print(json.dumps({"metric": metric, "value": round(value, 3),
                          "unit": unit}), flush=True)

    renorm = jax.jit(lambda o: (o * jax.lax.rsqrt(
        jnp.mean(o.astype(jnp.float32) ** 2) + 1e-8)).astype(o.dtype))

    # --- row 1: DDIM eta=0, 100 steps, batch 1 ---------------------------
    sampler = ScanSampler(denoise, kind="generalized", scan_chunk=100,
                          **sampler_kwargs)
    seq100 = make_timestep_subsequence(sched.num_timesteps, 100, "uniform")
    x = prep(jax.random.normal(jax.random.key(1), (1, 2, 8192, 256),
                               jnp.float32))
    fetch(sampler.sample_last(x, seq100, sched, eta=0.0, params=params))
    t0 = time.time()
    out = sampler.sample_last(x, seq100, sched, eta=0.0, params=params)
    fetch(out)
    emit("row1_ddim_eta0_100step_b1_per_clip", time.time() - t0)
    x = renorm(out)

    # --- row 3: --sequence 10 trajectory (100 steps, 10 kept) -------------
    idx = np.linspace(1, 100, 10, dtype=np.int32)
    select = set((100 - idx).tolist())
    # Median of 5 measured runs. Two tunnel effects make single readings
    # unreliable here (measured, benchmarks/../BASELINE.md row 3 note):
    # the device→host transfer channels warm up lazily over the first few
    # kept-state drains (run 1 after the compile warm-up pays ~2-4× the
    # steady-state transfer cost), and the tunnel sporadically stalls a
    # whole run by ~+2.5-3 s (steady-state runs measure ~4.7 s total, bad
    # draws ~7.5 — a median of 3 can land on a stall). 5 measured runs +
    # the emitted spread keep one bad draw out of the row while still
    # surfacing the variance.
    runs = []
    for _ in range(6):  # 1 compile/channel warm-up + 5 measured
        t0 = time.time()
        timings = {}
        xs, x0s = sampler.sample(
            x, seq100, sched, eta=0.0, select_index=select,
            key=jax.random.key(3), params=params, buffer_dtype="float16",
            timings=timings,
        )
        assert len(x0s) == 10
        runs.append((time.time() - t0, timings))
    measured = sorted(runs[1:], key=lambda r: r[0])
    total, timings = measured[len(measured) // 2]
    emit("row3_sequence10_trajectory_100step", total)
    # split: compute vs tunnel transfer (drain), so axon-tunnel transfer
    # variance can't mask compute regressions (and vice versa)
    emit("row3_compute_component", timings["compute_s"])
    emit("row3_transfer_component", timings["drain_s"])
    emit("row3_run_spread_min_to_max",
         measured[-1][0] - measured[0][0])

    # --- row 4: ddpm eta=1, 1000 steps, batch 2 (last only) ---------------
    ddpm = ScanSampler(denoise, kind="ddpm_noisy", scan_chunk=100,
                       **sampler_kwargs)
    seq1000 = make_timestep_subsequence(sched.num_timesteps, 1000, "uniform")
    x2 = prep(jax.random.normal(jax.random.key(4), (2, 2, 8192, 256),
                                jnp.float32))
    fetch(ddpm.sample_last(x2, seq1000[:100], sched, key=jax.random.key(5),
                           params=params))  # compile on a short chunk set
    t0 = time.time()
    out = ddpm.sample_last(x2, seq1000, sched, key=jax.random.key(5),
                           params=params)
    fetch(out)
    emit("row4_ddpm_1000step_b2", time.time() - t0)

    # --- row 2 (LAST: the train step donates its state, which shares the
    # params buffers used by the samplers above) --------------------------
    state, tx = init_train_state(params, config.optimization, use_ema=True)
    step = make_train_step(cfg, config, sched.alphas_cumprod, tx)
    x0 = jax.random.normal(jax.random.key(2), (14, 2, 1024, 256)) * 0.5
    rng = jax.random.key(42)
    state, m = step(state, x0, rng)
    float(m["loss"])
    t0 = time.time()
    for _ in range(5):
        state, m = step(state, x0, rng)
    float(m["loss"])
    emit("row2_train_step_b14", (time.time() - t0) / 5)
    return 0


if __name__ == "__main__":
    sys.exit(main())
