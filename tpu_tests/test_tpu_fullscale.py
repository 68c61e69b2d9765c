"""Full-scale (audio.yml geometry) parity of the flat Pallas pipeline vs
the XLA path ON REAL TPU HARDWARE — the rows-view and int8 paths' behavior
at [2, 2, 8192, 256] exists nowhere else (the Mosaic lowering constraints
only bind on hardware; tests/ runs interpret mode on scaled-down shapes).

Reference workload being verified: the denoiser forward of the sampling hot
loop (reference functions/denoising.py:10-52 calling models/diffusion.py
Model.forward at [2, 2, 8192, 256])."""

import contextlib
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddim_audio_tpu.config import load_config
from ddim_audio_tpu.models.unet import ModelConfig, apply_model, init_model

pytestmark = pytest.mark.slow


def _snr(ref, out):
    ref = np.asarray(ref, np.float64)
    out = np.asarray(out, np.float64)
    return 10 * np.log10((ref ** 2).mean() / ((out - ref) ** 2).mean() + 1e-300)


@pytest.fixture(scope="module")
def full_setup():
    config = load_config("configs/audio.yml")
    cfg = ModelConfig.from_config(config)
    cfg = dataclasses.replace(cfg, dtype=jnp.float32, conv_impl="xla")
    params = init_model(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (2, 2, 8192, 256), jnp.float32)
    t = jnp.array([500, 17])
    ref = np.asarray(jax.jit(
        lambda p, xx, tt: apply_model(p, xx, tt, cfg, train=False)
    )(params, x, t))
    return cfg, params, x, t, ref


def _run(cfg, params, x, t, precision=None):
    ctx = (jax.default_matmul_precision(precision) if precision
           else contextlib.nullcontext())
    with ctx:
        fn = jax.jit(
            lambda p, xx, tt: apply_model(p, xx, tt, cfg, train=False))
        return np.asarray(fn(params, x, t))


def test_fullscale_flat_fp32_matches_xla(full_setup):
    """Batch-2 rows-view flat pipeline == XLA at fp32.

    Compared under matmul precision "highest" on BOTH paths: at the
    default (lossy-pass) precision XLA's f32 convs and Pallas' f32 dots
    run different pass policies, and that per-op ~1e-7 policy difference
    amplifies to ~1e-3 (57 dB) over the 30-block model — on EVERY round's
    kernels, measured back to the round-2 rows-view commit. With the
    policy pinned, the flat pipeline (slim taps, post-matmul masks,
    asymmetric head/tail, strided transitions) is exact: measured
    137.7 dB."""
    cfg, params, x, t, _ = full_setup
    with jax.default_matmul_precision("highest"):
        fn = jax.jit(lambda p, xx, tt: apply_model(
            p, xx, tt, cfg, train=False))
        ref = np.asarray(fn(params, x, t))
    out = _run(dataclasses.replace(cfg, conv_impl="pallas"), params, x, t,
               precision="highest")
    assert _snr(ref, out) > 110, _snr(ref, out)


def test_fullscale_flat_bf16_snr(full_setup):
    """bf16 storage (production sampling dtype) SNR guard vs fp32."""
    cfg, params, x, t, ref = full_setup
    out = _run(dataclasses.replace(cfg, conv_impl="pallas",
                                   dtype=jnp.bfloat16), params, x, t)
    assert _snr(ref, out) > 38, _snr(ref, out)


def test_fullscale_flat_int8_snr(full_setup):
    """int8 activation storage SNR guard vs fp32 at full scale. act_store
    is NOT production (the round-4 matrix measured it slower than bf16
    storage AND −6.5 dB — BASELINE.md); the guard pins the measured
    41.9 dB against silent regression while the option exists."""
    cfg, params, x, t, ref = full_setup
    out = _run(dataclasses.replace(cfg, conv_impl="pallas",
                                   dtype=jnp.bfloat16, act_store="int8"),
               params, x, t)
    assert _snr(ref, out) > 38, _snr(ref, out)


def test_production_chain_snr(full_setup):
    """END-TO-END production-path SNR guard: 100 sequential DDIM steps on
    the production config (bf16 + tap_int8, flat-io carried state — exactly
    what bench.py and the runner execute) vs the same 100 steps at fp32,
    from the same noise. Single-forward SNR guards cannot see error
    ACCUMULATION over the chain; this pins the headline claim that final
    samples match fp32 at ≥ 44 dB. Reference chain being approximated at
    fp32: functions/denoising.py:10-52."""
    import numpy as np

    from ddim_audio_tpu.config import load_config, production_eval_cfg
    from ddim_audio_tpu.diffusion.schedules import (
        make_schedule,
        make_timestep_subsequence,
    )
    from ddim_audio_tpu.models.unet import (
        _supports_full_flat,
        apply_model_flat_io,
        flat_io_adapters,
    )
    from ddim_audio_tpu.sampling.driver import ScanSampler

    config = load_config("configs/audio.yml")
    base = ModelConfig.from_config(config)
    prod = production_eval_cfg(config, base)
    f32 = dataclasses.replace(prod, dtype=jnp.float32, tap_int8=False,
                              act_store=None)
    assert _supports_full_flat(prod)
    params = init_model(jax.random.key(0), base)
    sched = make_schedule(
        config.diffusion.beta_schedule, config.diffusion.beta_start,
        config.diffusion.beta_end, config.diffusion.num_diffusion_timesteps)
    seq = make_timestep_subsequence(sched.num_timesteps, 100, "uniform")
    x = jax.random.normal(jax.random.key(1), (1, 2, 8192, 256), jnp.float32)

    outs = {}
    for name, cfg_i in (("prod", prod), ("f32", f32)):
        to_flat, from_flat, noise_builder = flat_io_adapters(cfg_i)

        def denoise(p, xf, t, cfg_i=cfg_i):
            return apply_model_flat_io(p, xf, t, cfg_i)

        sampler = ScanSampler(denoise, kind="generalized", scan_chunk=100,
                              state_to_saved=from_flat,
                              noise_builder=noise_builder)
        out = sampler.sample_last(to_flat(x), seq, sched, eta=0.0,
                                  params=params)
        outs[name] = np.asarray(from_flat(out))

    snr = _snr(outs["f32"], outs["prod"])
    assert snr > 44, snr


def test_fullscale_tap_int8_snr(full_setup):
    """int8 MXU taps (production default, sampling.tap_int8) SNR guard vs
    fp32 at full scale — measured 48.4 dB with the asymmetric float head
    (the padded head's input requant used to dominate at 39 dB)."""
    cfg, params, x, t, ref = full_setup
    out = _run(dataclasses.replace(cfg, conv_impl="pallas",
                                   dtype=jnp.bfloat16, tap_int8=True),
               params, x, t)
    assert _snr(ref, out) > 44, _snr(ref, out)


def test_streaming_budget_eviction(full_setup, monkeypatch):
    """The ``--sequence -1`` streaming path ON HARDWARE with forced HBM
    -budget evictions: a 60-step all-kept trajectory under a shrunken
    buffer budget must evict pending device buffers to host MID-RUN
    (timings["mid_drains"] > 0) and still return every state, with the
    final streamed state matching an independent last-only run. The
    production-scale proof (1000 steps, 16 GB of kept states through the
    real 4 GB budget, 8 evictions) is benchmarks/bench_seq_all.py /
    BASELINE.md. Reference semantics: runners/diffusion.py:388-394 keeps
    every step."""
    import numpy as np

    from ddim_audio_tpu.config import load_config, production_eval_cfg
    from ddim_audio_tpu.diffusion.schedules import (
        make_schedule,
        make_timestep_subsequence,
    )
    from ddim_audio_tpu.models.unet import (
        _supports_full_flat,
        apply_model_flat_io,
        flat_io_adapters,
    )
    from ddim_audio_tpu.sampling import driver as driver_mod
    from ddim_audio_tpu.sampling.driver import ScanSampler

    config = load_config("configs/audio.yml")
    base = ModelConfig.from_config(config)
    prod = production_eval_cfg(config, base)
    assert _supports_full_flat(prod)
    params = init_model(jax.random.key(0), base)
    sched = make_schedule(
        config.diffusion.beta_schedule, config.diffusion.beta_start,
        config.diffusion.beta_end, config.diffusion.num_diffusion_timesteps)
    seq = make_timestep_subsequence(sched.num_timesteps, 60, "uniform")
    steps = len(seq)  # uniform stride rounding can overshoot the request
    x = jax.random.normal(jax.random.key(1), (1, 2, 8192, 256), jnp.float32)

    to_flat, from_flat, noise_builder = flat_io_adapters(prod)

    def denoise(p, xf, t):
        return apply_model_flat_io(p, xf, t, prod)

    sampler = ScanSampler(denoise, kind="generalized", scan_chunk=20,
                          state_to_saved=from_flat,
                          noise_builder=noise_builder)
    # fp16 saved state = 8 MiB; a 20-step chunk pair = 320 MiB. A 512 MiB
    # budget forces an eviction roughly every other chunk.
    monkeypatch.setattr(driver_mod, "_BUFFER_BUDGET_BYTES", 512 << 20)

    timings = {}
    xf = to_flat(x)
    xs, x0s = sampler.sample(
        xf, seq, sched, eta=0.0, select_index=None, params=params,
        buffer_dtype="float16", timings=timings,
    )
    assert len(xs) == steps + 1 and len(x0s) == steps
    assert timings["mid_drains"] > 0, timings
    for arr in (xs[1], xs[-1], x0s[0], x0s[-1]):
        assert np.isfinite(arr).all()

    ref = np.asarray(
        from_flat(sampler.sample_last(xf, seq, sched, eta=0.0,
                                      params=params)), np.float32)
    assert _snr(ref, xs[-1]) > 60, _snr(ref, xs[-1])
