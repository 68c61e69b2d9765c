"""Pallas flat-conv kernel tests (interpreter mode on CPU; the real-TPU
numerics and timings are exercised by the verify drives / bench)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from ddim_audio_tpu.models.layers import conv_apply
from ddim_audio_tpu.models.unet import _resblock_apply, _resblock_init
from ddim_audio_tpu.ops.flat_resblock import gn_affine_flat, resblock_flat
from ddim_audio_tpu.ops.pallas.conv_flat import (
    conv3x3_flat,
    pack_conv_weights,
    supports_flat,
)


def test_supports_flat():
    assert supports_flat(32, 256) and supports_flat(64, 128)
    assert supports_flat(128, 64)
    assert not supports_flat(96, 64)  # 128 % 96 != 0
    assert not supports_flat(32, 2)  # F·C = 64 < 128


@pytest.mark.parametrize("c,f", [(32, 8), (64, 4), (128, 2)])
def test_conv_flat_matches_xla(c, f):
    rng = np.random.default_rng(c)
    B, T = 2, 32
    x = rng.standard_normal((B, T, f, c)).astype(np.float32)
    w = (rng.standard_normal((3, 3, c, c)) * 0.1).astype(np.float32)
    bias = rng.standard_normal(c).astype(np.float32)
    ref = np.asarray(
        conv_apply({"w": jnp.asarray(w), "b": jnp.asarray(bias)},
                   jnp.asarray(x), padding=1)
    ).reshape(B, T, f * c)
    with pltpu.force_tpu_interpret_mode():
        out = conv3x3_flat(
            jnp.asarray(x.reshape(B, T, f * c)),
            pack_conv_weights(jnp.asarray(w)),
            jnp.asarray(np.tile(bias, f)),
            c=c,
            tile_t=8,
        )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_gn_affine_flat_matches_groupnorm():
    from ddim_audio_tpu.models.layers import group_norm_apply

    rng = np.random.default_rng(1)
    B, T, F, C = 2, 8, 8, 32
    x = rng.standard_normal((B, T, F, C)).astype(np.float32)
    p = {"g": jnp.asarray(1.0 + 0.1 * rng.standard_normal(C).astype(np.float32)),
         "b": jnp.asarray(0.1 * rng.standard_normal(C).astype(np.float32))}
    ref = np.asarray(group_norm_apply(p, jnp.asarray(x)))
    xf = jnp.asarray(x.reshape(B, T, F * C))
    scale, shift = gn_affine_flat(xf, p, F, C)
    out = np.asarray(xf * scale[:, None, :] + shift[:, None, :])
    np.testing.assert_allclose(out.reshape(B, T, F, C), ref, atol=1e-5)


def test_resblock_flat_matches_xla():
    rng = np.random.default_rng(2)
    B, T, F, C = 2, 16, 8, 32
    p = _resblock_init(jax.random.key(0), C, 3, jnp.float32)
    # non-trivial final norm (zero-init would hide conv errors behind a
    # pure-identity block)
    p["norm3"]["g"] = jnp.asarray(
        1.0 + 0.2 * rng.standard_normal(C).astype(np.float32)
    )
    x = rng.standard_normal((B, T, F, C)).astype(np.float32)
    temb = rng.standard_normal((B, C)).astype(np.float32)
    ref = np.asarray(
        _resblock_apply(p, jnp.asarray(x), jnp.asarray(temb), kernel_size=3)
    )
    with pltpu.force_tpu_interpret_mode():
        out = resblock_flat(
            p, jnp.asarray(x.reshape(B, T, F * C)), jnp.asarray(temb),
            f=F, c=C, tile_t=8,
        )
    np.testing.assert_allclose(
        np.asarray(out).reshape(B, T, F, C), ref, atol=5e-5
    )


@pytest.mark.parametrize("c,f", [(32, 8), (16, 16), (64, 4)])
def test_down_conv_flat_matches_xla(c, f):
    """Strided k4 s2 p1 down-conv kernel (TPU-verified exact; integration is
    the round-2 item — ARCHITECTURE.md roadmap)."""
    from ddim_audio_tpu.ops.pallas.conv_strided import (
        conv_down_flat,
        pack_down_weights,
        supports_flat_down,
    )

    assert supports_flat_down(c, f)
    rng = np.random.default_rng(c)
    B, T = 2, 32
    x = rng.standard_normal((B, T, f, c)).astype(np.float32)
    w = (rng.standard_normal((4, 4, c, 2 * c)) * 0.1).astype(np.float32)
    bias = rng.standard_normal(2 * c).astype(np.float32)
    ref = np.asarray(
        conv_apply({"w": jnp.asarray(w), "b": jnp.asarray(bias)},
                   jnp.asarray(x), stride=2, padding=1)
    ).reshape(B, T // 2, f * c)
    with pltpu.force_tpu_interpret_mode():
        out = conv_down_flat(
            jnp.asarray(x.reshape(B, T, f * c)),
            pack_down_weights(jnp.asarray(w)),
            np.tile(bias, f // 2),
            c_in=c,
            tile_t=4,
        )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_full_model_pallas_path_matches_xla(tiny_cfg):
    """apply_model with conv_impl=pallas (interpreted) == the XLA path."""
    import dataclasses

    from ddim_audio_tpu.models.unet import apply_model, init_model

    # tiny_cfg stages: ch=(8,16,24) — none flat-capable (f·c < 128 etc.), so
    # widen f_size to make stage 0 (c=8, f=16) flat-capable: 8|128, 16·8=128.
    cfg_x = dataclasses.replace(tiny_cfg, conv_impl="xla")
    cfg_p = dataclasses.replace(tiny_cfg, conv_impl="pallas")
    params = init_model(jax.random.key(0), cfg_x)
    x = jax.random.normal(jax.random.key(1), (1, 2, 8, 16))
    t = jnp.array([3])
    ref = apply_model(params, x, t, cfg_x)
    with pltpu.force_tpu_interpret_mode():
        out = apply_model(params, x, t, cfg_p)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
