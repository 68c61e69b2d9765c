"""Sequence parallelism: the denoiser forward with the time axis sharded.

The reference's long-clip story is architectural length generalization only
(train t_size 1024 → sample 8192, SURVEY.md §5); clips beyond one chip's HBM
have no answer there. Here the T axis is sharded over the mesh's ``sp`` axis
with an explicit ``shard_map`` implementation:

- stride-1 convs (k=3): halo exchange of 1 row each side via ``ppermute``
  (missing neighbors contribute zeros — exactly the conv's zero padding)
- Downsample k4 s2 p1: halo left 1 / right 2, then VALID conv over T
- Upsample (transposed k4 s2 p1): halo 1 each side, transpose-conv the
  haloed block, crop 2 output rows each side
- GroupNorm: global (T, F, C/G) statistics via psum of local sums
- FNet bottleneck: all_gather the (tiny — T/32) token axis, run the global
  Fourier mixing replicated, keep the local slice (Ulysses-style: shard the
  outer T for convs, gather for the global-mixing layer)

``apply_model_sp`` matches ``apply_model`` exactly (tested on the virtual
8-device CPU mesh against the single-device forward). GSPMD (jit with
sharding constraints) is the zero-effort alternative exercised by
``__graft_entry__.dryrun_multichip``; this module is the explicit,
collective-controlled path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..models.embeddings import beta_embedding_apply
from ..models.fnet import transformer_module_apply
from ..models.unet import ModelConfig, _split_points

SP_AXIS = "sp"


def _axis_index():
    return jax.lax.axis_index(SP_AXIS)


def _halo(x, left: int, right: int):
    """Pad the local T axis with neighbor rows over ``sp`` (zeros at the
    global boundary). x: [B, T_loc, F, C] → [B, left+T_loc+right, F, C]."""
    n = jax.lax.axis_size(SP_AXIS)
    parts = []
    if left:
        # my tail rows → my RIGHT neighbor's left halo: receive from i-1
        src = x[:, -left:]
        recv = jax.lax.ppermute(
            src, SP_AXIS, perm=[(i, i + 1) for i in range(n - 1)]
        )
        parts.append(recv)
    parts.append(x)
    if right:
        src = x[:, :right]
        recv = jax.lax.ppermute(
            src, SP_AXIS, perm=[(i + 1, i) for i in range(n - 1)]
        )
        parts.append(recv)
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else x


def _conv_same_sp(p, x, kernel_size: int):
    """Stride-1 SAME conv over sharded T: halo k//2, VALID on T, SAME on F."""
    pad = kernel_size // 2
    xh = _halo(x, pad, pad)
    out = jax.lax.conv_general_dilated(
        xh,
        p["w"].astype(x.dtype),
        window_strides=(1, 1),
        padding=((0, 0), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        out = out + p["b"].astype(x.dtype)
    return out


def _down_conv_sp(p, x):
    """k4 s2 p1 downsample over sharded T: halo (1, 2), VALID on T."""
    xh = _halo(x, 1, 2)
    out = jax.lax.conv_general_dilated(
        xh,
        p["w"].astype(x.dtype),
        window_strides=(2, 2),
        padding=((0, 0), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        out = out + p["b"].astype(x.dtype)
    return out


def _up_conv_sp(p, x):
    """Transposed k4 s2 p1 over sharded T: halo (1, 1), transpose-conv the
    haloed block, crop 2 output rows per side."""
    xh = _halo(x, 1, 1)
    kh, kw = p["w"].shape[:2]
    out = jax.lax.conv_general_dilated(
        xh,
        p["w"].astype(x.dtype),
        window_strides=(1, 1),
        padding=((kh - 1 - 1, kh - 1 - 1), (kw - 1 - 1, kw - 1 - 1)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        out = out + p["b"].astype(x.dtype)
    return out[:, 2:-2]


def _group_norm_sp(p, x, *, num_groups=8, eps=1e-6):
    """GroupNorm with global (sharded-T) statistics via psum."""
    b, t, f, c = x.shape
    xg = x.reshape(b, t, f, num_groups, c // num_groups)
    s1 = jnp.sum(xg, axis=(1, 2, 4), keepdims=True)
    s2 = jnp.sum(jnp.square(xg), axis=(1, 2, 4), keepdims=True)
    cnt = t * f * (c // num_groups)
    s1 = jax.lax.psum(s1, SP_AXIS)
    s2 = jax.lax.psum(s2, SP_AXIS)
    n = jax.lax.axis_size(SP_AXIS) * cnt
    mean = s1 / n
    var = s2 / n - jnp.square(mean)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    x = xg.reshape(b, t, f, c)
    x = x * p["g"].astype(x.dtype)
    if "b" in p:
        x = x + p["b"].astype(x.dtype)
    return x


def _resblock_sp(p, x, temb, *, kernel_size: int):
    h = _group_norm_sp(p["norm1"], x)
    h = jax.nn.silu(h)
    h = _conv_same_sp(p["conv1"], h, kernel_size) + temb[:, None, None, :].astype(
        x.dtype
    )
    h = jax.nn.silu(h)
    h = _group_norm_sp(p["norm2"], h)
    h = _conv_same_sp(p["conv2"], h, kernel_size)
    h = jax.nn.silu(h)
    h = _group_norm_sp(p["norm3"], h)
    return x + h


def _apply_model_sp_local(params, x, t, cfg: ModelConfig):
    """Per-shard body (runs inside shard_map). x: [B, C, T_loc, F]."""
    compute_dtype = cfg.dtype
    x = jnp.transpose(x, (0, 2, 3, 1)).astype(compute_dtype)

    temb = beta_embedding_apply(
        params["temb"], t, num_timesteps=cfg.num_timesteps, dtype=jnp.float32
    )
    temb_iter = iter(jnp.split(temb, _split_points(cfg.embedding_sizes), axis=-1))

    hidden = []
    h = _conv_same_sp(params["down_modules"]["head"], x, 3)
    hidden.append(h)
    for stage, krn in zip(params["down_modules"]["stages"], cfg.krn):
        if "down" in stage:
            h = _down_conv_sp(stage["down"], h)
        for block in stage["blocks"]:
            h = _resblock_sp(block, h, next(temb_iter), kernel_size=krn)
        hidden.append(h)

    # bottleneck: gather the (small) token axis, mix globally, re-shard
    b, tt, ff, cc = h.shape
    z = jnp.transpose(h, (0, 1, 3, 2)).reshape(b, tt, cc * ff)
    z_full = jax.lax.all_gather(z, SP_AXIS, axis=1, tiled=True)
    z_full = transformer_module_apply(
        params["transformer"], z_full.astype(jnp.float32), tcfg=cfg.transformers,
        train=False, rng=None,
    )
    idx = _axis_index()
    z = jax.lax.dynamic_slice_in_dim(z_full, idx * tt, tt, axis=1)
    h = jnp.transpose(
        z.reshape(b, tt, cc, ff), (0, 1, 3, 2)
    ).astype(compute_dtype)

    for stage, krn in zip(
        reversed(params["up_modules"]["stages"]), reversed(cfg.krn)
    ):
        h = h + hidden.pop()
        for block in stage["blocks"]:
            h = _resblock_sp(block, h, next(temb_iter), kernel_size=krn)
        if "up" in stage:
            h = _up_conv_sp(stage["up"], h)
    h = h + hidden.pop()
    h = _conv_same_sp(params["up_modules"]["tail"], h, 3)

    return jnp.transpose(h, (0, 3, 1, 2)).astype(jnp.float32)


def apply_model_sp(params, x, t, cfg: ModelConfig, mesh):
    """Sequence-parallel forward: x [B, C, T, F] sharded over T across the
    mesh's ``sp`` axis. T must divide evenly into sp × total-stride blocks."""
    sp = mesh.shape[SP_AXIS]
    stride_total = 2 ** (len(cfg.ch) - 1)
    if x.shape[2] % (sp * stride_total) != 0:
        raise ValueError(
            f"T={x.shape[2]} must be divisible by sp×stride = "
            f"{sp * stride_total}"
        )

    fn = jax.shard_map(
        functools.partial(_apply_model_sp_local, cfg=cfg),
        mesh=mesh,
        in_specs=(P(), P(None, None, SP_AXIS, None), P()),
        out_specs=P(None, None, SP_AXIS, None),
        check_vma=False,
    )
    return fn(params, x, t)
