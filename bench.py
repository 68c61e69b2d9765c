#!/usr/bin/env python
"""Benchmark: per-clip 100-step DDIM sampling wall-clock on one TPU chip.

The driver-defined target metric (BASELINE.json): per-clip sampling
wall-clock for ``audio.yml`` DDIM sampling (eta=0, --timesteps 100, batch 1,
[1, 2, 8192, 256]) — 100 strictly sequential forwards of the 47.2M-param
denoiser through the jitted lax.scan sampler.

Baseline: the PyTorch reference cannot run this workload on CUDA here; its
CPU execution (torch 2.13, this host's 1 vCPU) MEASURED end-to-end through
the actual reference sampler (functions/denoising.py generalized_steps with
the reference Model, cuda literals mapped to cpu — see
benchmarks/torch_cpu_baseline.py, result in torch_cpu_baseline.json,
measured 2026-08-16): 4129.3 s for the 100-step clip. (The round-1 number
extrapolated a single cold forward ×100 to 10,449 s; repeated forwards are
~2.5× faster once oneDNN warms, so the measured clip is the honest
baseline.) ``vs_baseline`` is the speedup ratio (reference wall-clock /
ours; >1 is faster than the reference).

Prints exactly ONE JSON line:
  {"metric": ..., "value": <seconds>, "unit": "s", "vs_baseline": <ratio>}
"""

import json
import sys
import time

# measured on this machine (benchmarks/torch_cpu_baseline.json)
TORCH_CPU_100STEP_SECONDS = 4129.3

TIMESTEPS = 100
SHAPE = (1, 2, 8192, 256)


def main():
    t_start = time.time()
    import jax

    # persistent compile cache OUTSIDE the repo tree (survives `git clean`;
    # the round-4 driver bench timed out on a cold in-repo cache). The
    # remote-compile cost model is documented in utils/compile_cache.py.
    from ddim_audio_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from ddim_audio_tpu.config import load_config, production_eval_cfg
    from ddim_audio_tpu.diffusion.schedules import (
        make_schedule,
        make_timestep_subsequence,
    )
    from ddim_audio_tpu.models.unet import ModelConfig, apply_model, init_model
    from ddim_audio_tpu.sampling.driver import ScanSampler

    config = load_config("configs/audio.yml")
    # ALL production inference overrides (sampling.dtype bf16, act_store,
    # tap_int8) via the shared helper — the same path the runner serves
    cfg = production_eval_cfg(config, ModelConfig.from_config(config))
    sched = make_schedule(
        config.diffusion.beta_schedule,
        config.diffusion.beta_start,
        config.diffusion.beta_end,
        config.diffusion.num_diffusion_timesteps,
    )
    params = init_model(jax.random.key(0), cfg)

    import jax.numpy as jnp

    from ddim_audio_tpu.models.unet import (
        _supports_full_flat,
        apply_model_flat_io,
        flat_io_adapters,
    )

    seq = make_timestep_subsequence(sched.num_timesteps, TIMESTEPS, "uniform")
    x = jax.random.normal(jax.random.key(1), SHAPE, jax.numpy.float32)

    if _supports_full_flat(cfg) and jax.default_backend() == "tpu":
        # production flat-io state: pad/transpose once, carry the flat
        # [B, T, F·ch0] array across all steps (see runners/_sampler_for_state)
        to_flat, _, _ = flat_io_adapters(cfg)
        x = to_flat(x)

        def denoise(p, xf, t):
            return apply_model_flat_io(p, xf, t, cfg)
    else:
        def denoise(p, x, t):
            return apply_model(p, x, t, cfg, train=False)

    sampler = ScanSampler(denoise, kind="generalized", scan_chunk=TIMESTEPS)

    def fetch(o):
        # block_until_ready can return early through the remote-TPU tunnel;
        # a host fetch of a reduction cannot lie about completion
        return float(jax.numpy.sum(jax.numpy.abs(o)))

    # warm-up: compile + one full run
    out = sampler.sample_last(x, seq, sched, eta=0.0, params=params)
    fetch(out)

    # timed runs, data-dependent chaining: the remote-TPU runtime can elide
    # re-execution of byte-identical calls, so each run consumes the previous
    # run's (renormalized) output as its input noise.
    #
    # TIMEOUT RESILIENCE (round-4 lesson — the driver's bench died at
    # rc=124 with nothing printed): extra timed runs only sharpen the
    # number (min-of-N vs min-of-1), so they are taken only while total
    # wall-clock stays under a budget. A cold remote compile (~17 min) or
    # a cold tunnel-server kernel cache (~7 min first execution) already
    # spent the time budget: print after ONE run and get out.
    renorm = jax.jit(lambda o: o * jax.lax.rsqrt(jax.numpy.mean(o * o) + 1e-8))
    extra_run_budget_s = 420.0  # keep total under ~8 min when warm-ish
    runs = []
    for i in range(3):
        t0 = time.time()
        out = sampler.sample_last(x, seq, sched, eta=0.0, params=params)
        fetch(out)
        runs.append(time.time() - t0)
        if time.time() - t_start > extra_run_budget_s:
            break
        x = renorm(out)
    value = min(runs)

    print(
        json.dumps(
            {
                "metric": "ddim_100step_b1_t8192_per_clip_wall_clock",
                "value": round(value, 3),
                "unit": "s",
                "vs_baseline": round(TORCH_CPU_100STEP_SECONDS / value, 1),
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
