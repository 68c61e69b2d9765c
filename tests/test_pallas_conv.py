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
    assert supports_flat(96, 64)  # P = 384: 64·96 = 6144 = 16·384
    assert supports_flat(192, 16) and supports_flat(256, 8)
    assert not supports_flat(32, 2)  # F·C = 64 < P = 128
    assert not supports_flat(96, 2)  # F·C = 192 not a multiple of P = 384


@pytest.mark.parametrize(
    "c,f", [(32, 8), (64, 4), (128, 2), (96, 4), (192, 2), (256, 2)]
)
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


# audio.yml stage transitions, scaled-down f: (c_in, c_out, f_in)
TRANSITIONS = [
    (32, 64, 8),    # P=128  S=128
    (64, 96, 16),   # P=384  S=512
    (96, 128, 8),   # P=256  S=384
    (128, 192, 8),  # P=384  S=512
    (192, 256, 4),  # P=256  S=384
]


@pytest.mark.parametrize("c_in,c_out,f", TRANSITIONS)
def test_down_conv_flat_matches_xla(c_in, c_out, f):
    """Strided k4 s2 p1 down-conv kernel vs XLA, every stage transition."""
    from ddim_audio_tpu.ops.pallas.conv_strided import (
        conv_down_flat,
        pack_down_weights,
        supports_flat_down,
    )

    assert supports_flat_down(c_in, f, c_out, hw=False)
    rng = np.random.default_rng(c_in)
    B, T = 2, 16
    x = rng.standard_normal((B, T, f, c_in)).astype(np.float32)
    w = (rng.standard_normal((4, 4, c_in, c_out)) * 0.1).astype(np.float32)
    bias = rng.standard_normal(c_out).astype(np.float32)
    ref = np.asarray(
        conv_apply({"w": jnp.asarray(w), "b": jnp.asarray(bias)},
                   jnp.asarray(x), stride=2, padding=1)
    ).reshape(B, T // 2, (f // 2) * c_out)
    with pltpu.force_tpu_interpret_mode():
        out = conv_down_flat(
            jnp.asarray(x.reshape(B, T, f * c_in)),
            pack_down_weights(jnp.asarray(w)),
            bias,
            c_in=c_in,
            c_out=c_out,
            tile_t=4,
        )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_down_conv_flat_stats():
    from ddim_audio_tpu.ops.pallas.conv_strided import (
        conv_down_flat,
        pack_down_weights,
    )

    rng = np.random.default_rng(7)
    B, T, f, c_in, c_out = 2, 16, 8, 32, 64
    x = jnp.asarray(rng.standard_normal((B, T, f * c_in)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((4, 4, c_in, c_out)) * 0.1
                     ).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(c_out).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        out, s1, s2 = conv_down_flat(
            x, pack_down_weights(w), bias, c_in=c_in, c_out=c_out,
            tile_t=4, want_stats=True,
        )
    np.testing.assert_allclose(
        np.asarray(s1), np.asarray(out).sum(axis=1), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(s2), (np.asarray(out) ** 2).sum(axis=1),
        rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("c_out,c_in,f", TRANSITIONS)
def test_up_conv_flat_matches_xla(c_out, c_in, f):
    """Transposed k4 s2 p1 up-conv kernel vs XLA, every stage transition
    (the up path runs each down transition in reverse: c_in → c_out)."""
    from ddim_audio_tpu.models.layers import conv_transpose_apply
    from ddim_audio_tpu.ops.pallas.conv_strided import (
        conv_up_flat,
        pack_up_weights,
        supports_flat_up,
    )

    f_in = f // 2  # the up stage operates at the downsampled resolution
    assert supports_flat_up(c_in, f_in, c_out, hw=False)
    rng = np.random.default_rng(c_in)
    B, T = 2, 8
    x = rng.standard_normal((B, T, f_in, c_in)).astype(np.float32)
    w = (rng.standard_normal((4, 4, c_in, c_out)) * 0.1).astype(np.float32)
    bias = rng.standard_normal(c_out).astype(np.float32)
    ref = np.asarray(
        conv_transpose_apply({"w": jnp.asarray(w), "b": jnp.asarray(bias)},
                             jnp.asarray(x), stride=2, padding=1)
    ).reshape(B, 2 * T, 2 * f_in * c_out)
    with pltpu.force_tpu_interpret_mode():
        out = conv_up_flat(
            jnp.asarray(x.reshape(B, T, f_in * c_in)),
            pack_up_weights(jnp.asarray(w)),
            bias,
            c_in=c_in,
            c_out=c_out,
            tile_t=4,
        )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_strided_int8_taps_snr():
    """int8 MXU taps for the 12-format strided transitions (the s0↔s1
    pair): per-tile symmetric input requant shared across both time-parity
    streams + per-output-channel weight quant. Gate: only 12-format
    geometries profit (slim formats already shrink the executed width);
    SNR vs the float kernels is int8-arithmetic bounded."""
    from ddim_audio_tpu.ops.pallas.conv_strided import (
        conv_down_flat,
        conv_up_flat,
        pack_down_weights,
        pack_down_weights_int8,
        pack_up_weights,
        pack_up_weights_int8,
        strided_int8_profitable,
    )

    assert strided_int8_profitable(32, 64)
    assert strided_int8_profitable(64, 32, up=True)
    assert not strided_int8_profitable(64, 96)       # slim format
    assert not strided_int8_profitable(96, 64, up=True)

    def snr(ref, out):
        ref = np.asarray(ref, np.float64)
        out = np.asarray(out, np.float64)
        return 10 * np.log10(
            (ref ** 2).mean() / ((out - ref) ** 2).mean() + 1e-300)

    rng = np.random.default_rng(3)
    B, T, f, c_in, c_out = 1, 16, 16, 32, 64
    x = jnp.asarray(rng.standard_normal((B, T, f * c_in)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((4, 4, c_in, c_out)) * 0.1
                     ).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(c_out).astype(np.float32))
    wq, ws = pack_down_weights_int8(w)
    assert wq.dtype == jnp.int8 and ws.shape == (128,)
    with pltpu.force_tpu_interpret_mode():
        ref = conv_down_flat(x, pack_down_weights(w), bias,
                             c_in=c_in, c_out=c_out, tile_t=4)
        out = conv_down_flat(x, wq, bias, c_in=c_in, c_out=c_out, tile_t=4,
                             mxu_int8=True, w_scale=ws)
    assert snr(ref, out) > 30, snr(ref, out)

    # up: 64 → 32 at the downsampled resolution, with fused residual+stats
    xu = jnp.asarray(rng.standard_normal((B, T // 2, (f // 2) * c_out)
                                         ).astype(np.float32))
    wu = jnp.asarray((rng.standard_normal((4, 4, c_out, c_in)) * 0.1
                      ).astype(np.float32))
    bu = jnp.asarray(rng.standard_normal(c_in).astype(np.float32))
    res = jnp.asarray(rng.standard_normal((B, T, f * c_in))
                      .astype(np.float32))
    wuq, wus = pack_up_weights_int8(wu)
    with pltpu.force_tpu_interpret_mode():
        ref, r1, r2 = conv_up_flat(
            xu, pack_up_weights(wu), bu, c_in=c_out, c_out=c_in, tile_t=4,
            residual=res, want_stats=True)
        out, o1, o2 = conv_up_flat(
            xu, wuq, bu, c_in=c_out, c_out=c_in, tile_t=4,
            residual=res, want_stats=True, mxu_int8=True, w_scale=wus)
    assert snr(ref, out) > 30, snr(ref, out)
    np.testing.assert_allclose(
        np.asarray(o1), np.asarray(out).sum(axis=1), rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("c,f", [(32, 8), (96, 4)])
def test_conv_flat_vjp_matches_xla(c, f):
    """Custom-VJP flat conv: value AND grads (x, w, add) match jax.grad of
    the XLA conv."""
    from ddim_audio_tpu.ops.flat_grad import conv3x3_flat_t

    rng = np.random.default_rng(c)
    B, T = 2, 16
    x = rng.standard_normal((B, T, f, c)).astype(np.float32)
    w = (rng.standard_normal((3, 3, c, c)) * 0.1).astype(np.float32)
    bias = rng.standard_normal(c).astype(np.float32)
    cot = rng.standard_normal((B, T, f, c)).astype(np.float32)

    def loss_xla(x, w, b):
        out = conv_apply({"w": w, "b": b}, x, padding=1)
        return jnp.sum(out * jnp.asarray(cot))

    def loss_flat(xf, w, b):
        out = conv3x3_flat_t(xf, w, jnp.tile(b, f), c=c)
        return jnp.sum(out * jnp.asarray(cot.reshape(B, T, f * c)))

    ref_v, ref_g = jax.value_and_grad(loss_xla, argnums=(0, 1, 2))(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias))
    with pltpu.force_tpu_interpret_mode():
        got_v, got_g = jax.value_and_grad(loss_flat, argnums=(0, 1, 2))(
            jnp.asarray(x.reshape(B, T, f * c)), jnp.asarray(w),
            jnp.asarray(bias))
    np.testing.assert_allclose(float(got_v), float(ref_v), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got_g[0]).reshape(B, T, f, c), np.asarray(ref_g[0]),
        atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_g[1]), np.asarray(ref_g[1]),
                               atol=1e-4)
    # flat add grad summed per channel == bias grad
    np.testing.assert_allclose(
        np.asarray(got_g[2]), np.asarray(ref_g[2]), atol=1e-4)


def test_resblock_flat_train_matches_xla():
    """Trainable flat resblock: forward and full grads match the XLA
    _resblock_apply."""
    from ddim_audio_tpu.ops.flat_grad import resblock_flat_train

    rng = np.random.default_rng(5)
    B, T, F, C = 2, 16, 8, 32
    p = _resblock_init(jax.random.key(0), C, 3, jnp.float32)
    p["norm3"]["g"] = jnp.asarray(
        1.0 + 0.2 * rng.standard_normal(C).astype(np.float32))
    x = rng.standard_normal((B, T, F, C)).astype(np.float32)
    temb = rng.standard_normal((B, C)).astype(np.float32)
    cot = rng.standard_normal((B, T, F, C)).astype(np.float32)

    def loss_xla(p, x, temb):
        out = _resblock_apply(p, x, temb, kernel_size=3)
        return jnp.sum(out * jnp.asarray(cot))

    def loss_flat(p, xf, temb):
        out = resblock_flat_train(p, xf, temb, f=F, c=C)
        return jnp.sum(out * jnp.asarray(cot.reshape(B, T, F * C)))

    ref_v, ref_g = jax.value_and_grad(loss_xla, argnums=(0, 1, 2))(
        p, jnp.asarray(x), jnp.asarray(temb))
    with pltpu.force_tpu_interpret_mode():
        got_v, got_g = jax.value_and_grad(loss_flat, argnums=(0, 1, 2))(
            p, jnp.asarray(x.reshape(B, T, F * C)), jnp.asarray(temb))
    np.testing.assert_allclose(float(got_v), float(ref_v), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got_g[1]).reshape(B, T, F, C), np.asarray(ref_g[1]),
        atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_g[2]), np.asarray(ref_g[2]),
                               atol=1e-4)
    for path, leaf in jax.tree_util.tree_leaves_with_path(got_g[0]):
        ref_leaf = ref_g[0]
        for k in path:
            ref_leaf = ref_leaf[k.key]
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(ref_leaf), rtol=1e-4, atol=1e-4,
            err_msg=str(path))


def test_full_model_full_flat_path_matches_xla():
    """A config where EVERY stage and transition is flat-capable exercises
    the end-to-end flat pipeline (_apply_model_flat): head → flat resblocks
    → flat strided down/up convs → bottleneck → tail."""
    import dataclasses

    from ddim_audio_tpu.models.unet import (
        ModelConfig,
        _supports_full_flat,
        apply_model,
        init_model,
    )
    from ddim_audio_tpu.utils.namespace import dict2namespace

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
    cfg_x = ModelConfig(
        channels=2, f_size=16, ch=(32, 64, 96), krn=(3, 3, 3), res=(1, 1, 1),
        num_timesteps=50, transformers=transformers, conv_impl="xla",
    )
    cfg_p = dataclasses.replace(cfg_x, conv_impl="pallas")
    assert _supports_full_flat(cfg_p)
    params = init_model(jax.random.key(0), cfg_x)
    # non-trivial final norms so conv errors aren't hidden by identity blocks
    rng = np.random.default_rng(3)
    for mod in ("down_modules", "up_modules"):
        for stage in params[mod]["stages"]:
            for block in stage["blocks"]:
                c = block["norm3"]["g"].shape[0]
                block["norm3"]["g"] = jnp.asarray(
                    1.0 + 0.2 * rng.standard_normal(c).astype(np.float32)
                )
    x = jax.random.normal(jax.random.key(1), (2, 2, 16, 16))
    t = jnp.array([3, 17])
    ref = apply_model(params, x, t, cfg_x)
    with pltpu.force_tpu_interpret_mode():
        out = apply_model(params, x, t, cfg_p)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


@pytest.mark.heavy
def test_full_model_train_grads_flat_vs_xla():
    """Training gradients through the flat custom-VJP resblocks equal the
    XLA path's gradients for the whole model (loss → every param leaf)."""
    import dataclasses

    from ddim_audio_tpu.models.unet import ModelConfig, apply_model, init_model
    from ddim_audio_tpu.utils.namespace import dict2namespace

    transformers = dict2namespace(
        {
            "module": "fnet",
            "kwargs": {
                "hidden_size": 32,
                "num_hidden_layers": 1,
                "intermediate_size": 64,
                "hidden_act": "gelu_new",
                "hidden_dropout_prob": 0.0,
                "initializer_range": 0.02,
                "layer_norm_eps": 1e-6,
            },
            "channels": 32,
            "dtype": None,
            "fourier_impl": "dft_matmul",
        }
    )
    cfg_x = ModelConfig(
        channels=2, f_size=16, ch=(32, 64), krn=(3, 3), res=(1, 1),
        num_timesteps=50, transformers=transformers, conv_impl="xla",
        remat=False,
    )
    cfg_p = dataclasses.replace(cfg_x, conv_impl="pallas")
    params = init_model(jax.random.key(0), cfg_x)
    rng = np.random.default_rng(9)
    for mod in ("down_modules", "up_modules"):
        for stage in params[mod]["stages"]:
            for block in stage["blocks"]:
                c = block["norm3"]["g"].shape[0]
                block["norm3"]["g"] = jnp.asarray(
                    1.0 + 0.2 * rng.standard_normal(c).astype(np.float32))
    x = jax.random.normal(jax.random.key(1), (2, 2, 8, 16))
    tgt = jax.random.normal(jax.random.key(2), (2, 2, 8, 16))
    t = jnp.array([3, 17])

    def loss(p, cfg):
        out = apply_model(p, x, t, cfg, train=True)
        return jnp.mean((out - tgt) ** 2)

    ref_v, ref_g = jax.value_and_grad(loss)(params, cfg_x)
    with pltpu.force_tpu_interpret_mode():
        got_v, got_g = jax.value_and_grad(loss)(params, cfg_p)
    np.testing.assert_allclose(float(got_v), float(ref_v), rtol=1e-5)
    for path, leaf in jax.tree_util.tree_leaves_with_path(got_g):
        ref_leaf = ref_g
        for k in path:
            ref_leaf = ref_leaf[k.key if hasattr(k, "key") else k.idx]
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(ref_leaf), rtol=1e-4, atol=2e-5,
            err_msg=str(path))


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


def test_up_conv_flat_residual_stats():
    """conv_up_flat residual=/want_stats=: the fused `up(h) + skip` equals
    XLA's transposed-conv + add, and the emitted per-lane (sum, sum²) are
    the GroupNorm statistics of the summed output."""
    from ddim_audio_tpu.models.layers import conv_transpose_apply
    from ddim_audio_tpu.ops.pallas.conv_strided import (
        conv_up_flat,
        pack_up_weights,
    )

    c_in, c_out, f_in = 64, 32, 8
    rng = np.random.default_rng(7)
    B, T = 2, 8
    x = rng.standard_normal((B, T, f_in, c_in)).astype(np.float32)
    w = (rng.standard_normal((4, 4, c_in, c_out)) * 0.1).astype(np.float32)
    bias = rng.standard_normal(c_out).astype(np.float32)
    skip = rng.standard_normal(
        (B, 2 * T, 2 * f_in * c_out)).astype(np.float32)
    ref = np.asarray(
        conv_transpose_apply({"w": jnp.asarray(w), "b": jnp.asarray(bias)},
                             jnp.asarray(x), stride=2, padding=1)
    ).reshape(B, 2 * T, 2 * f_in * c_out) + skip
    with pltpu.force_tpu_interpret_mode():
        out, s1, s2 = conv_up_flat(
            jnp.asarray(x.reshape(B, T, f_in * c_in)),
            pack_up_weights(jnp.asarray(w)),
            bias, c_in=c_in, c_out=c_out, tile_t=4,
            residual=jnp.asarray(skip), want_stats=True,
        )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1), ref.sum(axis=1),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(s2), (ref * ref).sum(axis=1),
                               rtol=1e-5, atol=1e-3)


def test_conv_flat_residual():
    """conv3x3_flat residual=: conv(x + skip) fused in the kernel's
    assembly equals XLA conv of the materialized sum."""
    from ddim_audio_tpu.ops.pallas.conv_flat import (
        conv3x3_flat,
        pack_conv_weights,
    )

    c, f = 32, 8
    rng = np.random.default_rng(9)
    B, T = 2, 16
    x = rng.standard_normal((B, T, f, c)).astype(np.float32)
    skip = rng.standard_normal((B, T, f, c)).astype(np.float32)
    w = (rng.standard_normal((3, 3, c, c)) * 0.1).astype(np.float32)
    ref = np.asarray(conv_apply(
        {"w": jnp.asarray(w), "b": jnp.zeros((c,), jnp.float32)},
        jnp.asarray(x + skip), padding=1)).reshape(B, T, f * c)
    with pltpu.force_tpu_interpret_mode():
        out = conv3x3_flat(
            jnp.asarray(x.reshape(B, T, f * c)),
            pack_conv_weights(jnp.asarray(w)),
            c=c, residual=jnp.asarray(skip.reshape(B, T, f * c)),
        )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


@pytest.mark.parametrize("c_in,c_out,f", [(32, 64, 8), (96, 128, 8)])
def test_down_conv_vjp_matches_xla(c_in, c_out, f):
    """Custom-VJP flat down-conv: value AND grads (x, w, b) match jax.grad
    of the strided XLA conv."""
    from ddim_audio_tpu.ops.flat_grad import conv_down_flat_t

    rng = np.random.default_rng(c_in)
    B, T = 2, 8
    x = rng.standard_normal((B, T, f, c_in)).astype(np.float32)
    w = (rng.standard_normal((4, 4, c_in, c_out)) * 0.1).astype(np.float32)
    bias = rng.standard_normal(c_out).astype(np.float32)
    cot = rng.standard_normal((B, T // 2, (f // 2) * c_out)).astype(np.float32)

    def loss_xla(x, w, b):
        out = conv_apply({"w": w, "b": b}, x, stride=2, padding=1)
        return jnp.sum(out.reshape(B, T // 2, -1) * jnp.asarray(cot))

    def loss_flat(xf, w, b):
        out = conv_down_flat_t(xf, w, b, c_in=c_in, c_out=c_out)
        return jnp.sum(out * jnp.asarray(cot))

    ref_v, ref_g = jax.value_and_grad(loss_xla, argnums=(0, 1, 2))(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias))
    with pltpu.force_tpu_interpret_mode():
        got_v, got_g = jax.value_and_grad(loss_flat, argnums=(0, 1, 2))(
            jnp.asarray(x.reshape(B, T, f * c_in)), jnp.asarray(w),
            jnp.asarray(bias))
    np.testing.assert_allclose(float(got_v), float(ref_v), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got_g[0]).reshape(B, T, f, c_in), np.asarray(ref_g[0]),
        atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_g[1]), np.asarray(ref_g[1]),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_g[2]), np.asarray(ref_g[2]),
                               rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("c_in,c_out,f_in", [(64, 32, 4), (128, 96, 4)])
def test_up_conv_vjp_matches_xla(c_in, c_out, f_in):
    """Custom-VJP flat transposed up-conv: value AND grads match jax.grad
    of the XLA transposed conv."""
    from ddim_audio_tpu.models.layers import conv_transpose_apply
    from ddim_audio_tpu.ops.flat_grad import conv_up_flat_t

    rng = np.random.default_rng(c_in)
    B, T = 2, 4
    x = rng.standard_normal((B, T, f_in, c_in)).astype(np.float32)
    w = (rng.standard_normal((4, 4, c_in, c_out)) * 0.1).astype(np.float32)
    bias = rng.standard_normal(c_out).astype(np.float32)
    cot = rng.standard_normal((B, 2 * T, 2 * f_in * c_out)).astype(np.float32)

    def loss_xla(x, w, b):
        out = conv_transpose_apply({"w": w, "b": b}, x, stride=2, padding=1)
        return jnp.sum(out.reshape(B, 2 * T, -1) * jnp.asarray(cot))

    def loss_flat(xf, w, b):
        out = conv_up_flat_t(xf, w, b, c_in=c_in, c_out=c_out)
        return jnp.sum(out * jnp.asarray(cot))

    ref_v, ref_g = jax.value_and_grad(loss_xla, argnums=(0, 1, 2))(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias))
    with pltpu.force_tpu_interpret_mode():
        got_v, got_g = jax.value_and_grad(loss_flat, argnums=(0, 1, 2))(
            jnp.asarray(x.reshape(B, T, f_in * c_in)), jnp.asarray(w),
            jnp.asarray(bias))
    np.testing.assert_allclose(float(got_v), float(ref_v), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got_g[0]).reshape(B, T, f_in, c_in), np.asarray(ref_g[0]),
        atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_g[1]), np.asarray(ref_g[1]),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_g[2]), np.asarray(ref_g[2]),
                               rtol=1e-4, atol=1e-3)


def test_conv_flat_int8_roundtrip():
    """int8 activation storage: quant_out publishes per-tile scales; a
    consumer fed (int8, scales) matches the same conv fed the dequantized
    fp32 input exactly (dequant is a per-tile scalar multiply), and the
    producer's quantization error is bounded by the 8-bit step."""
    from ddim_audio_tpu.ops.pallas.conv_flat import flat_period

    c, f = 32, 8
    rng = np.random.default_rng(11)
    B, T = 2, 16
    p = flat_period(c)
    g = f * c // p
    x = rng.standard_normal((B, T, f * c)).astype(np.float32)
    w = (rng.standard_normal((3, 3, c, c)) * 0.1).astype(np.float32)
    w2 = pack_conv_weights(jnp.asarray(w))
    pre = (np.abs(rng.standard_normal(f * c)).astype(np.float32) * 0.3 + 0.7,
           rng.standard_normal(f * c).astype(np.float32) * 0.1)
    with pltpu.force_tpu_interpret_mode():
        q, scales = conv3x3_flat(
            jnp.asarray(x), w2, c=c, tile_t=4, post_silu=True, quant_out=True)
        assert q.dtype == jnp.int8 and scales.shape == (B, T // 4, 8, p)
        n_t = scales.shape[1]
        deq = (np.asarray(q, np.float32).reshape(B, n_t, 4 * g, p)
               * np.asarray(scales)[:, :, 0:1, :]).reshape(B, T, f * c)
        ref_full = np.asarray(conv3x3_flat(
            jnp.asarray(x), w2, c=c, tile_t=4, post_silu=True))
        # quantization error ≤ one step (scale) per tile
        step = np.asarray(scales).max()
        assert np.abs(deq - ref_full).max() <= step + 1e-6
        # consumer: int8 in (fp32 compute) == same conv on dequantized input
        out_i = conv3x3_flat(
            q, w2, c=c, in_scales=scales, pre=pre, pre_silu=True,
            post_silu=True, compute_dtype=jnp.float32)
        out_ref = conv3x3_flat(
            jnp.asarray(deq), w2, c=c, tile_t=4, pre=pre, pre_silu=True,
            post_silu=True)
    np.testing.assert_allclose(
        np.asarray(out_i), np.asarray(out_ref), atol=1e-5)


def test_conv_flat_int8_chained_with_stats():
    """Chained int8: quant in AND quant out with fused GN stats — the stats
    are computed on the pre-quant fp32 output."""
    c, f = 32, 8
    rng = np.random.default_rng(12)
    B, T = 1, 16
    x = rng.standard_normal((B, T, f * c)).astype(np.float32)
    w = (rng.standard_normal((3, 3, c, c)) * 0.1).astype(np.float32)
    w2 = pack_conv_weights(jnp.asarray(w))
    with pltpu.force_tpu_interpret_mode():
        q, scales = conv3x3_flat(
            jnp.asarray(x), w2, c=c, tile_t=4, quant_out=True)
        q2, sc2, s1, s2 = conv3x3_flat(
            q, w2, c=c, in_scales=scales, quant_out=True, want_stats=True,
            compute_dtype=jnp.float32)
        assert q2.dtype == jnp.int8 and sc2.shape == scales.shape
        # stats equal the dequantized-input conv's output sums
        n_t = scales.shape[1]
        from ddim_audio_tpu.ops.pallas.conv_flat import flat_period
        p = flat_period(c)
        g = f * c // p
        deq = (np.asarray(q, np.float32).reshape(B, n_t, 4 * g, p)
               * np.asarray(scales)[:, :, 0:1, :]).reshape(B, T, f * c)
        full = np.asarray(conv3x3_flat(jnp.asarray(deq), w2, c=c, tile_t=4))
    np.testing.assert_allclose(
        np.asarray(s1), full.sum(axis=1), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(s2), (full * full).sum(axis=1), rtol=1e-4, atol=1e-4)


def test_conv_flat_int8_residual():
    """int8 residual stream: conv(deq(x) + deq(skip)) via res_scales."""
    c, f = 32, 8
    rng = np.random.default_rng(13)
    B, T = 2, 16
    x = rng.standard_normal((B, T, f * c)).astype(np.float32)
    skip = rng.standard_normal((B, T, f * c)).astype(np.float32)
    w = (rng.standard_normal((3, 3, c, c)) * 0.1).astype(np.float32)
    w2 = pack_conv_weights(jnp.asarray(w))
    with pltpu.force_tpu_interpret_mode():
        q, qs = conv3x3_flat(jnp.asarray(x), w2, c=c, tile_t=4,
                             quant_out=True)
        r, rs = conv3x3_flat(jnp.asarray(skip), w2, c=c, tile_t=4,
                             quant_out=True)
        from ddim_audio_tpu.ops.pallas.conv_flat import flat_period
        p = flat_period(c)
        g = f * c // p
        n_t = qs.shape[1]

        def deq(qq, ss):
            return (np.asarray(qq, np.float32).reshape(B, n_t, 4 * g, p)
                    * np.asarray(ss)[:, :, 0:1, :]).reshape(B, T, f * c)

        out = conv3x3_flat(q, w2, c=c, in_scales=qs, residual=r,
                           res_scales=rs, compute_dtype=jnp.float32)
        ref = conv3x3_flat(jnp.asarray(deq(q, qs) + deq(r, rs)), w2, c=c,
                           tile_t=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

@pytest.mark.parametrize("c,f", [(32, 8), (96, 4)])
def test_conv_flat_mxu_int8(c, f):
    """mxu_int8: taps run int8 × int8 → int32 on the MXU (per-tile
    activation requant in-kernel + per-output-lane weight scales from
    pack_conv_weights_int8). SNR vs the fp32 kernel is int8-arithmetic
    bounded; the full production chain shape (int8 in, prologue, quant
    out, stats) stays consistent with the fp32 reference. (32, 8)
    exercises the 9-tap format, (96, 4) the slim-carry format (int8
    slim taps landed in round 4 — 0.287 vs 0.380 ms bf16 at C=96)."""
    from ddim_audio_tpu.ops.pallas.conv_flat import (
        flat_period, pack_conv_weights_int8)
    rng = np.random.default_rng(21)
    B, T = 2, 16
    p = flat_period(c)
    g = f * c // p
    x = rng.standard_normal((B, T, f * c)).astype(np.float32)
    w = (rng.standard_normal((3, 3, c, c)) * 0.1).astype(np.float32)
    w2f = pack_conv_weights(jnp.asarray(w), jnp.float32)
    w2q, wsc = pack_conv_weights_int8(jnp.asarray(w))
    assert w2q.dtype == jnp.int8 and wsc.shape == (p,)
    pre = (np.abs(rng.standard_normal(f * c)).astype(np.float32) * 0.5 + 0.5,
           rng.standard_normal(f * c).astype(np.float32) * 0.1)

    def snr(ref, out):
        return 10 * np.log10((ref ** 2).mean() / ((out - ref) ** 2).mean())

    with pltpu.force_tpu_interpret_mode():
        ref = np.asarray(conv3x3_flat(
            jnp.asarray(x), w2f, c=c, tile_t=4, pre=pre, pre_silu=True,
            post_silu=True))
        out = np.asarray(conv3x3_flat(
            jnp.asarray(x), w2q, c=c, tile_t=4, pre=pre, pre_silu=True,
            post_silu=True, mxu_int8=True, w_scale=wsc))
        assert snr(ref, out) > 33, snr(ref, out)

        # full chain: int8 input, prologue, int8 MXU taps, quant_out, stats
        q, scales = conv3x3_flat(jnp.asarray(x), w2f, c=c, tile_t=4,
                                 post_silu=True, quant_out=True)
        o2, sc2, s1, s2 = conv3x3_flat(
            q, w2q, c=c, in_scales=scales, pre=pre, pre_silu=True,
            post_silu=True, quant_out=True, want_stats=True,
            mxu_int8=True, w_scale=wsc)
        assert o2.dtype == jnp.int8 and sc2.shape == scales.shape
        n_t = scales.shape[1]
        deq_in = (np.asarray(q, np.float32).reshape(B, n_t, 4 * g, p)
                  * np.asarray(scales)[:, :, 0:1, :]).reshape(B, T, f * c)
        ref2 = np.asarray(conv3x3_flat(
            jnp.asarray(deq_in), w2f, c=c, tile_t=4, pre=pre, pre_silu=True,
            post_silu=True))
        deq2 = (np.asarray(o2, np.float32).reshape(B, n_t, 4 * g, p)
                * np.asarray(sc2)[:, :, 0:1, :]).reshape(B, T, f * c)
        assert snr(ref2, deq2) > 28, snr(ref2, deq2)
        # stats are the pre-quant epilogue sums — loose int8-noise agreement
        rel = (np.abs(np.asarray(s1) - ref2.sum(axis=1)).max()
               / (np.abs(ref2.sum(axis=1)).max() + 1e-9))
        assert rel < 0.05, rel


def test_residual_affine_flat_kernel():
    """Fused resblock tail: out = deq(x) + deq(s)·scale + shift, with
    per-tile requant + pre-quant stats — the pass that closes the int8
    activation-storage chain (the XLA tail add can't dequant/requant
    per-tile in one pass)."""
    from ddim_audio_tpu.ops.pallas.conv_flat import (
        flat_period, residual_affine_flat)

    c, f = 32, 8
    p = flat_period(c)
    g = f * c // p
    rng = np.random.default_rng(30)
    B, T = 2, 16
    tile_t = 4
    n_t = T // tile_t
    rows = T * g

    def quant(a):
        a4 = a.reshape(B, n_t, tile_t * g, p)
        sc = np.abs(a4).max(axis=2, keepdims=True) / 127.0  # [B, n_t, 1, p]
        q = np.clip(np.round(a4 / sc), -127, 127)
        stripes = np.broadcast_to(sc, (B, n_t, 8, p)).astype(np.float32)
        return (q.astype(np.int8).reshape(B, rows, p), stripes,
                (q * sc).reshape(B, rows, p))

    x = rng.standard_normal((B, rows, p)).astype(np.float32)
    s = rng.standard_normal((B, rows, p)).astype(np.float32)
    scale = (0.5 + np.abs(rng.standard_normal((B, p)))).astype(np.float32)
    shift = (0.1 * rng.standard_normal((B, p))).astype(np.float32)
    xq, xsc, xdq = quant(x)
    sq, ssc, sdq = quant(s)
    ref = xdq + sdq * scale[:, None, :] + shift[:, None, :]

    with pltpu.force_tpu_interpret_mode():
        # float out + stats
        out, s1, s2 = residual_affine_flat(
            jnp.asarray(xq), jnp.asarray(sq),
            (jnp.asarray(scale), jnp.asarray(shift)),
            c=c, f=f, x_scales=jnp.asarray(xsc), s_scales=jnp.asarray(ssc),
            want_stats=True, out_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
        np.testing.assert_allclose(np.asarray(s1), ref.sum(axis=1),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(s2), (ref * ref).sum(axis=1),
                                   rtol=1e-4, atol=1e-4)
        # quant out: dequantized result within one step per tile; stats are
        # pre-quant
        q2, sc2, q1s, q2s = residual_affine_flat(
            jnp.asarray(xq), jnp.asarray(sq),
            (jnp.asarray(scale), jnp.asarray(shift)),
            c=c, f=f, x_scales=jnp.asarray(xsc), s_scales=jnp.asarray(ssc),
            quant_out=True, want_stats=True)
        assert q2.dtype == jnp.int8 and sc2.shape == (B, n_t, 8, p)
        deq = (np.asarray(q2, np.float32).reshape(B, n_t, tile_t * g, p)
               * np.asarray(sc2)[:, :, 0:1, :]).reshape(B, rows, p)
        assert np.abs(deq - ref).max() <= np.asarray(sc2).max() + 1e-6
        np.testing.assert_allclose(np.asarray(q1s), ref.sum(axis=1),
                                   rtol=1e-4, atol=1e-4)
        # float x + int8 s (stage-entry block shape)
        out2 = residual_affine_flat(
            jnp.asarray(x), jnp.asarray(sq),
            (jnp.asarray(scale), jnp.asarray(shift)),
            c=c, f=f, s_scales=jnp.asarray(ssc), out_dtype=jnp.float32)
        ref2 = x + sdq * scale[:, None, :] + shift[:, None, :]
        np.testing.assert_allclose(np.asarray(out2), ref2, atol=1e-5)


def test_resblock_flat_int8_chain_matches_float():
    """A 2-block int8 activation-storage chain (float entry → int8 interior
    → float exit) tracks the float resblock chain at int8-quantization
    noise."""
    from ddim_audio_tpu.ops.flat_resblock import resblock_flat_int8
    from ddim_audio_tpu.ops.pallas.conv_flat import flat_period

    rng = np.random.default_rng(31)
    B, T, F, C = 2, 16, 8, 32
    p = flat_period(C)
    g = F * C // p
    blocks = []
    for i in range(2):
        blk = _resblock_init(jax.random.key(i), C, 3, jnp.float32)
        blk["norm3"]["g"] = jnp.asarray(
            1.0 + 0.2 * rng.standard_normal(C).astype(np.float32))
        blocks.append(blk)
    x = rng.standard_normal((B, T, F, C)).astype(np.float32)
    tembs = [rng.standard_normal((B, C)).astype(np.float32) for _ in range(2)]

    ref = jnp.asarray(x)
    for blk, te in zip(blocks, tembs):
        ref = _resblock_apply(blk, ref, jnp.asarray(te), kernel_size=3)
    ref = np.asarray(ref)

    with pltpu.force_tpu_interpret_mode():
        hv = jnp.asarray(x.reshape(B, T, F * C).reshape(B, T * g, p))
        scales, stats = None, None
        for k, (blk, te) in enumerate(zip(blocks, tembs)):
            last = k == 1
            hv, scales, stats = resblock_flat_int8(
                blk, hv, jnp.asarray(te), f=F, c=C,
                in_stats=stats, in_scales=scales,
                quant_out=not last, want_out_stats=not last,
                compute_dtype=jnp.float32)
        out = np.asarray(hv).reshape(B, T, F, C)

    def snr(r, o):
        return 10 * np.log10((r ** 2).mean() / ((o - r) ** 2).mean())

    assert snr(ref, out) > 35, snr(ref, out)


@pytest.mark.heavy
def test_full_model_int8_act_store():
    """act_store="int8" on the full flat pipeline: end-to-end output tracks
    the fp32 XLA model at int8-quantization noise."""
    import dataclasses

    from ddim_audio_tpu.models.unet import (
        ModelConfig,
        _supports_full_flat,
        apply_model,
        init_model,
    )
    from ddim_audio_tpu.utils.namespace import dict2namespace

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
    cfg_x = ModelConfig(
        channels=2, f_size=16, ch=(32, 64, 96), krn=(3, 3, 3), res=(2, 1, 1),
        num_timesteps=50, transformers=transformers, conv_impl="xla",
    )
    cfg_p = dataclasses.replace(cfg_x, conv_impl="pallas", act_store="int8")
    assert _supports_full_flat(cfg_p)
    params = init_model(jax.random.key(0), cfg_x)
    rng = np.random.default_rng(3)
    for mod in ("down_modules", "up_modules"):
        for stage in params[mod]["stages"]:
            for block in stage["blocks"]:
                c = block["norm3"]["g"].shape[0]
                block["norm3"]["g"] = jnp.asarray(
                    1.0 + 0.2 * rng.standard_normal(c).astype(np.float32)
                )
    x = jax.random.normal(jax.random.key(1), (2, 2, 32, 16))
    t = jnp.array([3, 17])
    ref = np.asarray(apply_model(params, x, t, cfg_x))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(apply_model(params, x, t, cfg_p))

    def snr(r, o):
        return 10 * np.log10((r ** 2).mean() / ((o - r) ** 2).mean())

    assert snr(ref, out) > 30, snr(ref, out)


def test_resblock_flat_tap_int8():
    """tap_int8=True (int8 × int8 → int32 MXU taps on both convs) tracks
    the float resblock at int8-quantization noise."""
    from ddim_audio_tpu.ops.flat_resblock import resblock_flat

    rng = np.random.default_rng(7)
    B, T, F, C = 2, 16, 8, 32
    blk = _resblock_init(jax.random.key(5), C, 3, jnp.float32)
    blk["norm3"]["g"] = jnp.asarray(
        1.0 + 0.2 * rng.standard_normal(C).astype(np.float32))
    x = rng.standard_normal((B, T, F, C)).astype(np.float32)
    temb = rng.standard_normal((B, C)).astype(np.float32)

    ref = np.asarray(_resblock_apply(blk, jnp.asarray(x), jnp.asarray(temb),
                                     kernel_size=3))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(resblock_flat(
            blk, jnp.asarray(x.reshape(B, T, F * C)), jnp.asarray(temb),
            f=F, c=C, tap_int8=True)).reshape(B, T, F, C)

    def snr(r, o):
        return 10 * np.log10((r ** 2).mean() / ((o - r) ** 2).mean())

    assert snr(ref, out) > 35, snr(ref, out)


def test_full_model_tap_int8():
    """tap_int8 on the full flat pipeline (resblocks + head/tail at the
    profitable widths): end-to-end output tracks the fp32 XLA model at
    int8-tap quantization noise."""
    import dataclasses

    from ddim_audio_tpu.models.unet import (
        ModelConfig,
        _supports_full_flat,
        apply_model,
        init_model,
    )
    from ddim_audio_tpu.utils.namespace import dict2namespace

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
    cfg_x = ModelConfig(
        channels=2, f_size=16, ch=(32, 64, 96), krn=(3, 3, 3), res=(2, 1, 1),
        num_timesteps=50, transformers=transformers, conv_impl="xla",
    )
    cfg_p = dataclasses.replace(cfg_x, conv_impl="pallas", tap_int8=True)
    assert _supports_full_flat(cfg_p)
    params = init_model(jax.random.key(0), cfg_x)
    rng = np.random.default_rng(11)
    for mod in ("down_modules", "up_modules"):
        for stage in params[mod]["stages"]:
            for block in stage["blocks"]:
                c = block["norm3"]["g"].shape[0]
                block["norm3"]["g"] = jnp.asarray(
                    1.0 + 0.2 * rng.standard_normal(c).astype(np.float32)
                )
    x = jax.random.normal(jax.random.key(1), (2, 2, 32, 16))
    t = jnp.array([3, 17])
    ref = np.asarray(apply_model(params, x, t, cfg_x))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(apply_model(params, x, t, cfg_p))

    def snr(r, o):
        return 10 * np.log10((r ** 2).mean() / ((o - r) ** 2).mean())

    # Per-tile scalar requant at this tiny geometry (T=32 → one coarse
    # scale per whole stream) is far noisier than at production scale,
    # where the measured end-to-end SNR is 39.1 dB (TPU, [1,2,8192,256]).
    assert snr(ref, out) > 25, snr(ref, out)


def test_head_tail_flat_match_xla():
    """The channel-asymmetric head (C_in→ch0) and tail (ch0→C_out) kernels
    match lax.conv_general_dilated exactly at fp32, including the fused
    tail input-residual and the head's GroupNorm statistics epilogue."""
    from ddim_audio_tpu.ops.pallas.conv_head_tail import (
        conv_head_flat,
        conv_tail_flat,
        pack_head_weights,
        pack_tail_weights,
        supports_head_tail,
    )

    B, T, F, CIN, C0 = 2, 8, 256, 2, 32
    assert supports_head_tail(CIN, C0, F, hw=False)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, T, F, CIN)).astype(np.float32)
    wh = rng.standard_normal((3, 3, CIN, C0)).astype(np.float32) * 0.2
    bh = rng.standard_normal((C0,)).astype(np.float32)
    wt = rng.standard_normal((3, 3, C0, CIN)).astype(np.float32) * 0.2
    bt = rng.standard_normal((CIN,)).astype(np.float32)

    def xla_conv(xn, w, b):
        return jax.lax.conv_general_dilated(
            jnp.asarray(xn), jnp.asarray(w), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b

    ref_h = np.asarray(xla_conv(x, wh, bh))
    with pltpu.force_tpu_interpret_mode():
        out, s1, s2 = conv_head_flat(
            jnp.asarray(x.reshape(B, T, F * CIN)), pack_head_weights(wh),
            bh, c_in=CIN, c0=C0, f=F, want_stats=True)
    np.testing.assert_allclose(np.asarray(out).reshape(B, T, F, C0), ref_h,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(s1),
                               ref_h.reshape(B, T, -1).sum(1), atol=2e-4)
    np.testing.assert_allclose(np.asarray(s2),
                               (ref_h.reshape(B, T, -1) ** 2).sum(1),
                               atol=2e-4)

    res = rng.standard_normal((B, T, F, C0)).astype(np.float32)
    ref_t = np.asarray(xla_conv(ref_h + res, wt, bt))
    with pltpu.force_tpu_interpret_mode():
        out_t = conv_tail_flat(
            out, pack_tail_weights(wt, F), bt, c0=C0, c_out=CIN, f=F,
            residual=jnp.asarray(res.reshape(B, T * F * C0 // 128, 128)))
    np.testing.assert_allclose(np.asarray(out_t).reshape(B, T, F, CIN),
                               ref_t, atol=5e-5)


def test_full_model_headtail_kernels_match_xla():
    """Full flat pipeline WITH the asymmetric head/tail kernels active
    (f=64 → supports_head_tail holds at hw=False) vs the XLA model."""
    import dataclasses

    from ddim_audio_tpu.models.unet import (
        ModelConfig,
        _supports_full_flat,
        apply_model,
        init_model,
    )
    from ddim_audio_tpu.ops.pallas.conv_head_tail import supports_head_tail
    from ddim_audio_tpu.utils.namespace import dict2namespace

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
    cfg_x = ModelConfig(
        channels=2, f_size=64, ch=(32, 64), krn=(3, 3), res=(1, 1),
        num_timesteps=50, transformers=transformers, conv_impl="xla",
    )
    cfg_p = dataclasses.replace(cfg_x, conv_impl="pallas")
    assert _supports_full_flat(cfg_p)
    assert supports_head_tail(2, 32, 64, hw=False)
    params = init_model(jax.random.key(2), cfg_x)
    x = jax.random.normal(jax.random.key(3), (2, 2, 8, 64))
    t = jnp.array([3, 17])
    ref = np.asarray(apply_model(params, x, t, cfg_x))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(apply_model(params, x, t, cfg_p))
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-3)
