"""Differentiable flat-layout conv ops: custom VJPs that keep TRAINING on
the Pallas flat kernels (round-2 item; the round-1 flat path was
forward-only, so the fp32 train step paid XLA's NHWC lane-padding tax).

The backward of the stride-1 flat conv is two more flat ops:

- dx is the SAME kernel run on the incoming cotangent with the
  spatially-flipped, I/O-transposed HWIO kernel (w'[dt,df,i,o] =
  w[2−dt,2−df,o,i]), packed with the regular `pack_conv_weights` — the
  kernel's own boundary masks are exactly the transported forward masks
  (proved in tests against jax.vjp of the XLA conv).
- dW is one new kernel (`_dw_kernel`): per row-shifted tap, the [P, P]
  contraction x_rows(masked, shifted)ᵀ · g_rows accumulated over the whole
  grid into a 9-format [9P, P] gradient; unpacking to [3, 3, C, C] happens
  for free through the VJP of `_pack9` (scatter-add → gather-sum).

GroupNorm/SiLU stay XLA ops on the FLAT [B, T, F·C] arrays (reductions read
through bitcast reshapes; normalize is a per-lane affine), so the training
resblock never materializes a lane-padded NHWC tensor.

Reference behavior covered: training the stride-1 convs of Residual_Block
(reference models/diffusion.py:28-40) via functions/losses.py's
noise_estimation_loss backward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas.conv_flat import (
    _pack9,
    _pick_tile_t,
    conv3x3_flat,
    flat_period,
    pack_conv_weights,
)

GROUPS = 8
EPS = 1e-6


def _dw_kernel(refs, *, tile_t, g, p, n_t):
    it = iter(refs)
    x_ref = next(it)
    top_ref = next(it)
    bot_ref = next(it)
    g_ref = next(it)
    out_ref = next(it)
    scratch = next(it)
    lo_scr = next(it)
    hi_scr = next(it)

    b = pl.program_id(0)
    i = pl.program_id(1)
    m = tile_t * g
    h = 2 * g

    scratch[0:h, :] = top_ref[0]
    scratch[h : h + m, :] = x_ref[0]
    scratch[h + m :, :] = bot_ref[0]

    @pl.when(i == 0)
    def _():
        scratch[0:h, :] = jnp.zeros((h, p), scratch.dtype)

    @pl.when(i == n_t - 1)
    def _():
        scratch[h + m :, :] = jnp.zeros((h, p), scratch.dtype)

    nz = m + 2 * h
    gidx = jax.lax.broadcasted_iota(jnp.int32, (nz, 1), 0) % g
    zero = jnp.zeros((), scratch.dtype)
    lo_scr[:, :] = jnp.where(gidx == g - 1, zero, scratch[:, :])
    hi_scr[:, :] = jnp.where(gidx == 0, zero, scratch[:, :])

    @pl.when(jnp.logical_and(b == 0, i == 0))
    def _():
        out_ref[:, :] = jnp.zeros((9 * p, p), jnp.float32)

    gout = g_ref[0]
    for dt in range(3):
        for dg in range(3):
            delta = (dt - 1) * g + (dg - 1)
            src = (lo_scr, scratch, hi_scr)[dg]
            rows = src[h + delta : h + delta + m, :]
            j = dt * 3 + dg
            # dW_j += x_rowsᵀ · g  — contract the row (time·period) dim
            out_ref[j * p : (j + 1) * p, :] = out_ref[
                j * p : (j + 1) * p, :
            ] + jax.lax.dot_general(
                rows, gout,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )


def conv_dw_flat(x, gout, *, c: int, tile_t: int | None = None):
    """Packed weight gradient [9P, P] of conv3x3_flat wrt its weights.
    x, gout: [B, T, F·C]."""
    bsz, t, fc = x.shape
    p = flat_period(c)
    g = fc // p
    tile_t = _pick_tile_t(t, g, p, x.dtype.itemsize, tile_t)
    n_t = t // tile_t
    ht = tile_t // 2

    xv = x.reshape(bsz, t * g, p)
    gv = gout.reshape(bsz, t * g, p)
    kern = functools.partial(_dw_kernel, tile_t=tile_t, g=g, p=p, n_t=n_t)
    out = pl.pallas_call(
        lambda *refs: kern(refs),
        grid=(bsz, n_t),
        in_specs=[
            pl.BlockSpec((1, tile_t * g, p), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * g, p),
                         lambda b, i: (b, jnp.maximum(i * ht - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * g, p),
                         lambda b, i: (b, jnp.minimum((i + 1) * ht,
                                                      t // 2 - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_t * g, p), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9 * p, p), lambda b, i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9 * p, p), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM(((tile_t + 4) * g, p), x.dtype),
            pltpu.VMEM(((tile_t + 4) * g, p), x.dtype),
            pltpu.VMEM(((tile_t + 4) * g, p), x.dtype),
        ],
    )(xv, xv, xv, gv)
    return out


@functools.cache
def _conv_op(c: int):
    """Differentiable fused flat conv for channel width c:
    op(x [B,T,FC], w [3,3,C,C] HWIO, add [FC] or [B,FC]) → [B,T,FC].

    Takes the RAW weight (packing happens inside, in-graph — XLA hoists the
    loop-invariant pack out of scan/accumulation loops) so the backward is
    pack-format-agnostic: dx packs the spatially-flipped, I/O-transposed
    kernel; dW comes from the 9-format `conv_dw_flat` accumulator and is
    unpacked to HWIO through `_pack9`'s VJP (scatter-add → gather-sum)."""

    @jax.custom_vjp
    def op(x, w, add):
        return conv3x3_flat(x, pack_conv_weights(w, x.dtype), c=c, add=add)

    def fwd(x, w, add):
        return op(x, w, add), (x, w, add.ndim)

    def bwd(res, gout):
        x, w, add_ndim = res
        wb = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
        dx = conv3x3_flat(gout, pack_conv_weights(wb, gout.dtype), c=c)
        dw2 = conv_dw_flat(x, gout, c=c)
        _, unpack = jax.vjp(_pack9, w.astype(jnp.float32))
        (dw,) = unpack(dw2)
        gsum = jnp.sum(gout.astype(jnp.float32), axis=1)  # [B, FC]
        dadd = jnp.sum(gsum, axis=0) if add_ndim == 1 else gsum
        return dx, dw.astype(w.dtype), dadd

    op.defvjp(fwd, bwd)
    return op


def conv3x3_flat_t(x, w, add, *, c: int):
    """Trainable (custom-VJP) fused flat conv + per-lane add (w: raw HWIO)."""
    return _conv_op(c)(x, w, add)


def gn_flat(pnorm, x, *, f: int, c: int):
    """Differentiable GroupNorm over flat [B, T, F·C] (two-pass mean/var —
    the reductions read through bitcast reshapes; no NHWC materialization).
    Matches torch.nn.GroupNorm(8, C, eps=1e-6)."""
    b, t, fc = x.shape
    cpg = c // GROUPS
    xg = x.reshape(b, t, f, GROUPS, cpg).astype(jnp.float32)
    mean = jnp.mean(xg, axis=(1, 2, 4))  # [B, G]
    var = jnp.mean(
        jnp.square(xg - mean[:, None, None, :, None]), axis=(1, 2, 4)
    )
    rstd = jax.lax.rsqrt(var + EPS)
    gamma = pnorm["g"].astype(jnp.float32)
    beta = pnorm.get("b")
    scale_c = jnp.repeat(rstd, cpg, axis=1) * gamma[None, :]  # [B, C]
    shift_c = -jnp.repeat(mean * rstd, cpg, axis=1) * gamma[None, :]
    if beta is not None:
        shift_c = shift_c + beta.astype(jnp.float32)[None, :]
    scale = jnp.tile(scale_c, (1, f))
    shift = jnp.tile(shift_c, (1, f))
    out = x.astype(jnp.float32) * scale[:, None, :] + shift[:, None, :]
    return out.astype(x.dtype)


def resblock_flat_train(p, x_flat, temb, *, f: int, c: int):
    """Differentiable flat residual block — same math as
    models.unet._resblock_apply (reference models/diffusion.py:42-56), with
    the convs on the Pallas flat kernels (fwd AND bwd) and GN/SiLU as
    unpadded XLA ops."""
    temb_flat = jnp.tile(temb.astype(jnp.float32), (1, f))
    bias2_flat = jnp.tile(p["conv2"]["b"].astype(jnp.float32), f)

    h = gn_flat(p["norm1"], x_flat, f=f, c=c)
    h = jax.nn.silu(h)
    h = conv3x3_flat_t(h, p["conv1"]["w"], temb_flat, c=c)
    h = jax.nn.silu(h)
    h = gn_flat(p["norm2"], h, f=f, c=c)
    h = conv3x3_flat_t(h, p["conv2"]["w"], bias2_flat, c=c)
    h = jax.nn.silu(h)
    h = gn_flat(p["norm3"], h, f=f, c=c)
    return x_flat + h
