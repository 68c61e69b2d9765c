"""Primitive NN layers as pure init/apply functions over param dicts.

All convs operate on NHWC tensors ([B, T, F, C]) — the TPU-preferred layout
(channels on the 128-lane minor dimension); the reference uses torch NCHW
(``models/diffusion.py``) but layout is an implementation detail, not a
capability. Weight storage:

- conv:            HWIO ``[kh, kw, in, out]``
- conv_transpose:  HWIO of the *equivalent forward conv on the dilated
                   input* — i.e. spatially flipped, in/out-swapped relative
                   to torch's ``[in, out, kh, kw]`` ConvTranspose2d weight.
- linear:          ``[in, out]``

Initializers reproduce torch defaults (kaiming-uniform with a=sqrt(5) for
convs/linears, matching torch.nn.Conv2d/Linear reset_parameters) so that
fresh models have the same weight statistics as the reference.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def _kaiming_uniform_bound(fan_in: int) -> float:
    # torch kaiming_uniform_(a=sqrt(5)) → gain = sqrt(2/(1+5)) = 1/sqrt(3)
    # bound = gain * sqrt(3/fan_in) = 1/sqrt(fan_in)
    return 1.0 / math.sqrt(fan_in)


def conv_init(key, kh, kw, cin, cout, *, bias=True, dtype=jnp.float32):
    kw_key, b_key = jax.random.split(key)
    fan_in = cin * kh * kw
    bound = _kaiming_uniform_bound(fan_in)
    p = {"w": jax.random.uniform(kw_key, (kh, kw, cin, cout), dtype, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(b_key, (cout,), dtype, -bound, bound)
    return p


def conv_apply(p, x, *, stride=1, padding="SAME_LOWER"):
    """2-D conv, NHWC. padding: int (symmetric), pair, or jax string."""
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    out = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        out = out + p["b"].astype(x.dtype)
    return out


def conv_transpose_init(key, kh, kw, cin, cout, *, bias=True, dtype=jnp.float32):
    kw_key, b_key = jax.random.split(key)
    # torch ConvTranspose2d fan_in (of its [in,out,kh,kw] weight) = out*kh*kw
    fan_in = cout * kh * kw
    bound = _kaiming_uniform_bound(fan_in)
    p = {"w": jax.random.uniform(kw_key, (kh, kw, cin, cout), dtype, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(b_key, (cout,), dtype, -bound, bound)
    return p


def conv_transpose_apply(p, x, *, stride=2, padding=1):
    """torch ConvTranspose2d(k,s,p) semantics: out = (in-1)*s - 2p + k.

    Implemented as a forward conv over the lhs-dilated input with padding
    k-1-p per side; the stored kernel is already the flipped/swapped
    equivalent-conv kernel (see module docstring), so no flip at apply time.
    """
    kh, kw = p["w"].shape[:2]
    pad_h = kh - 1 - padding
    pad_w = kw - 1 - padding
    out = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(1, 1),
        padding=((pad_h, pad_h), (pad_w, pad_w)),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        out = out + p["b"].astype(x.dtype)
    return out


def linear_init(key, cin, cout, *, bias=True, dtype=jnp.float32):
    w_key, b_key = jax.random.split(key)
    bound = _kaiming_uniform_bound(cin)
    p = {"w": jax.random.uniform(w_key, (cin, cout), dtype, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(b_key, (cout,), dtype, -bound, bound)
    return p


def linear_normal_init(key, cin, cout, *, std=0.02, bias=True, dtype=jnp.float32):
    """HF-transformer style init (normal(0, initializer_range), zero bias)."""
    w_key, _ = jax.random.split(key)
    p = {"w": std * jax.random.normal(w_key, (cin, cout), dtype)}
    if bias:
        p["b"] = jnp.zeros((cout,), dtype)
    return p


def linear_apply(p, x):
    out = jnp.matmul(x, p["w"].astype(x.dtype), preferred_element_type=x.dtype)
    if "b" in p:
        out = out + p["b"].astype(x.dtype)
    return out


def group_norm_init(channels, *, bias=True, zero_weight=False, dtype=jnp.float32):
    p = {"g": (jnp.zeros if zero_weight else jnp.ones)((channels,), dtype)}
    if bias:
        p["b"] = jnp.zeros((channels,), dtype)
    return p


def group_norm_apply(p, x, *, num_groups=8, eps=1e-6):
    """GroupNorm over NHWC: stats per (sample, group) over (T, F, C/G).

    Matches torch.nn.GroupNorm(num_groups, C, eps) used throughout the
    reference resblocks (reference models/diffusion.py:19-21).
    """
    b, t, f, c = x.shape
    xg = x.reshape(b, t, f, num_groups, c // num_groups)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xg, axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    x = xg.reshape(b, t, f, c)
    x = x * p["g"].astype(x.dtype)
    if "b" in p:
        x = x + p["b"].astype(x.dtype)
    return x


def layer_norm_init(channels, dtype=jnp.float32):
    return {"g": jnp.ones((channels,), dtype), "b": jnp.zeros((channels,), dtype)}


def layer_norm_apply(p, x, *, eps=1e-6):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    x = (x - mean) * jax.lax.rsqrt(var + eps)
    return x * p["g"].astype(x.dtype) + p["b"].astype(x.dtype)


def gelu_new(x):
    """HF "gelu_new" — tanh-approximate GELU (reference transformer config
    hidden_act, configs/audio.yml:36)."""
    return jax.nn.gelu(x, approximate=True)


def dropout(key, x, rate: float, *, train: bool):
    if not train or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def sinusoid_table(length: int, channels: int, dtype=np.float32) -> np.ndarray:
    """Interleaved sin/cos positional table.

    table[p, 2k] = sin(p · exp(-2k·ln(10000)/channels)),
    table[p, 2k+1] = cos(same) — the reference's ``Add_Encoding`` applied to a
    zeros tensor (reference models/diffusion.py:81-92). Host-side numpy: the
    table is a compile-time constant.
    """
    # Computed in the target dtype (not float64) to track the reference,
    # which builds the table with float32 tensor ops.
    position = np.arange(length, dtype=dtype)[:, None]
    div_term = np.exp(
        np.arange(0, channels, 2, dtype=dtype) * dtype(-math.log(10000.0) / channels)
    )
    x = position * div_term
    table = np.zeros((length, channels), dtype=dtype)
    table[:, 0::2] = np.sin(x)
    table[:, 1::2] = np.cos(x)
    return table
