"""Fused residual block over flat-packed [B, T, F·C] activations.

The residual block (reference models/diffusion.py:42-56)

    x → GN1 → SiLU → conv1 (+temb) → SiLU → GN2 → conv2 → SiLU → GN3 → +x

executed as two fused Pallas conv kernels plus cheap XLA glue:

1. GroupNorm statistics are plain XLA reductions over the flat layout
   (sum and self-inner-product per flat lane, folded F→channels on a tiny
   [B, F, C] tensor) — full-bandwidth, no lane padding;
2. kernel 1: GN1 (as a per-lane affine prologue) + SiLU + conv1 + temb add
   + SiLU, emitting h;
3. kernel 2: GN2 prologue + conv2 + bias + SiLU, emitting s;
4. the tail ``x + GN3(s)`` is one fused XLA elementwise pass (GN3 has a
   zero-init weight and no bias — reference models/diffusion.py:25-26).

Forward-only (the sampling hot path); training keeps the XLA resblock.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .pallas.conv_flat import conv3x3_flat, pack_conv_weights

GROUPS = 8
EPS = 1e-6


def gn_stats_flat(x_flat, f: int, c: int):
    """Per-(sample, group) mean / reciprocal-std over the flat layout.
    Returns (mean [B, G], rstd [B, G]) in fp32."""
    b, t, fc = x_flat.shape
    xf = x_flat.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=1)  # [B, FC]
    s2 = jnp.einsum("btk,btk->bk", xf, xf)  # [B, FC]
    cpg = c // GROUPS
    s1g = s1.reshape(b, f, GROUPS, cpg).sum(axis=(1, 3))  # [B, G]
    s2g = s2.reshape(b, f, GROUPS, cpg).sum(axis=(1, 3))
    n = t * f * cpg
    mean = s1g / n
    var = s2g / n - jnp.square(mean)
    rstd = jax.lax.rsqrt(jnp.maximum(var, 0.0) + EPS)
    return mean, rstd


def gn_affine_flat(x_flat, norm_params, f: int, c: int):
    """Fold GroupNorm into per-lane (scale, shift) [B, F·C] fp32 vectors:
    GN(x) = x·scale + shift."""
    b = x_flat.shape[0]
    mean, rstd = gn_stats_flat(x_flat, f, c)  # [B, G]
    gamma = norm_params["g"].astype(jnp.float32)  # [C]
    beta = norm_params.get("b")
    cpg = c // GROUPS
    mean_c = jnp.repeat(mean, cpg, axis=1)  # [B, C]
    rstd_c = jnp.repeat(rstd, cpg, axis=1)
    scale_c = rstd_c * gamma[None, :]
    shift_c = -mean_c * rstd_c * gamma[None, :]
    if beta is not None:
        shift_c = shift_c + beta.astype(jnp.float32)[None, :]
    scale = jnp.tile(scale_c, (1, f))  # flat index = f·C + c
    shift = jnp.tile(shift_c, (1, f))
    return scale, shift


def resblock_flat(p, x_flat, temb, *, f: int, c: int, tile_t: int = 32):
    """p: resblock params (norm1/conv1/norm2/conv2/norm3); x_flat [B,T,F·C];
    temb [B, C]. Returns [B, T, F·C]. Matches models.unet._resblock_apply."""
    b = x_flat.shape[0]
    dtype = x_flat.dtype

    w1 = pack_conv_weights(p["conv1"]["w"], dtype)
    w2 = pack_conv_weights(p["conv2"]["w"], dtype)
    temb_flat = jnp.tile(temb.astype(jnp.float32), (1, f))  # [B, F·C]
    bias2_flat = jnp.tile(p["conv2"]["b"].astype(jnp.float32), f)  # [F·C]

    pre1 = gn_affine_flat(x_flat, p["norm1"], f, c)
    h = conv3x3_flat(
        x_flat, w1, c=c, tile_t=tile_t,
        pre=pre1, pre_silu=True, add=temb_flat, post_silu=True,
    )
    pre2 = gn_affine_flat(h, p["norm2"], f, c)
    s = conv3x3_flat(
        h, w2, c=c, tile_t=tile_t,
        pre=pre2, pre_silu=False, add=bias2_flat, post_silu=True,
    )
    scale3, shift3 = gn_affine_flat(s, p["norm3"], f, c)
    out = (
        x_flat.astype(jnp.float32)
        + s.astype(jnp.float32) * scale3[:, None, :]
        + shift3[:, None, :]
    )
    return out.astype(dtype)
