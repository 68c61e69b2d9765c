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
    """int8 activation storage SNR guard vs fp32 at full scale — gates
    act_store: int8 as a production sampling option."""
    cfg, params, x, t, ref = full_setup
    out = _run(dataclasses.replace(cfg, conv_impl="pallas",
                                   dtype=jnp.bfloat16, act_store="int8"),
               params, x, t)
    assert _snr(ref, out) > 30, _snr(ref, out)


def test_fullscale_tap_int8_snr(full_setup):
    """int8 MXU taps (production default, sampling.tap_int8) SNR guard vs
    fp32 at full scale — measured 48.4 dB with the asymmetric float head
    (the padded head's input requant used to dominate at 39 dB)."""
    cfg, params, x, t, ref = full_setup
    out = _run(dataclasses.replace(cfg, conv_impl="pallas",
                                   dtype=jnp.bfloat16, tap_int8=True),
               params, x, t)
    assert _snr(ref, out) > 44, _snr(ref, out)
