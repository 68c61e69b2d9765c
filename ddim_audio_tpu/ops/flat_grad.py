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

GroupNorm/SiLU stay XLA ops on the FLAT [B, T, F·C] arrays with an ANALYTIC
GroupNorm VJP (`_gn_op`) — strictly 2-D arithmetic, since 5-D group-reshape
views force XLA into padded layouts (measured 9.1× expansion at train
scale). The strided stage transitions and the channel-padded head/tail
convs also train on flat kernels via `conv_down_flat_t` / `conv_up_flat_t`
/ `conv3x3_flat_t`, so the training step never materializes a lane-padded
NHWC tensor anywhere in the conv stack.

Reference behavior covered: training Residual_Block's stride-1 convs and
Downsample/Upsample (reference models/diffusion.py:28-78) via
functions/losses.py's noise_estimation_loss backward.
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


def _gn_fwd_parts(x, gamma, beta, f, c, sp_axis=None):
    # Strictly 2-D/[B, FC] arithmetic: a 5-D (b, t, f, G, cpg) reshape view
    # forces XLA into tiny-minor-dim padded layouts (measured 9.1× memory
    # expansion and a 4 GB temp at train scale) — all full-size work stays
    # on the [B, T, F·C] layout; group folds happen on [B, FC] partials.
    # sp_axis: statistics become GLOBAL over a sharded T axis — the [B, G]
    # group folds are psum'd over the mesh axis (sequence parallelism).
    b, t, fc = x.shape
    cpg = c // GROUPS
    n = t * f * cpg
    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=1)  # [B, FC]
    s2 = jnp.einsum("btk,btk->bk", xf, xf)
    s1g = s1.reshape(b, f, GROUPS, cpg).sum(axis=(1, 3))  # [B, G] (tiny)
    s2g = s2.reshape(b, f, GROUPS, cpg).sum(axis=(1, 3))
    if sp_axis is not None:
        s1g = jax.lax.psum(s1g, sp_axis)
        s2g = jax.lax.psum(s2g, sp_axis)
        n = n * jax.lax.axis_size(sp_axis)
    mean = s1g / n
    var = s2g / n - jnp.square(mean)
    rstd = jax.lax.rsqrt(jnp.maximum(var, 0.0) + EPS)
    scale_c = jnp.repeat(rstd, cpg, axis=1) * gamma[None, :]  # [B, C]
    shift_c = -jnp.repeat(mean * rstd, cpg, axis=1) * gamma[None, :]
    if beta is not None:
        shift_c = shift_c + beta[None, :]
    scale = jnp.tile(scale_c, (1, f))
    shift = jnp.tile(shift_c, (1, f))
    out = xf * scale[:, None, :] + shift[:, None, :]
    return out.astype(x.dtype), mean, rstd


@functools.cache
def _gn_op(f: int, c: int, has_beta: bool, sp_axis=None):
    """Differentiable GroupNorm over flat [B, T, F·C] with an ANALYTIC
    backward (autodiff through the two-pass mean/var emits ~6 full-array
    passes; the closed form is 2: one fused (Σdy, Σdy·x) reduction + the
    dx write as a per-lane affine of (dy, x)).

    dx = rstd·(γ·dy − S₁/N − x̂·S₂/N) per group, with S₁ = Σ γ·dy,
    S₂ = Σ γ·dy·x̂; dγ = Σ_{b,t,f} dy·x̂, dβ = Σ dy — all derived from the
    per-lane partials Σ_t dy and Σ_t dy·x.

    sp_axis (sequence parallelism): fwd stats AND the bwd S₁/S₂ folds are
    psum'd over the mesh axis, while dγ/dβ stay LOCAL partial sums — the
    custom VJP executes its collectives directly instead of relying on
    autodiff transposing raw psums (which over-counts under shard_map
    check_vma=False); the SP train step psums the per-device partial param
    grads once at the end (training/train_step.py)."""

    @jax.custom_vjp
    def op(gamma, beta, x):
        return _gn_fwd_parts(x, gamma, beta, f, c, sp_axis)[0]

    def fwd(gamma, beta, x):
        out, mean, rstd = _gn_fwd_parts(x, gamma, beta, f, c, sp_axis)
        return out, (x, gamma, mean, rstd)

    def bwd(res, dy):
        x, gamma, mean, rstd = res  # mean/rstd [B, G]
        b, t, fc = x.shape
        cpg = c // GROUPS
        n = t * f * cpg
        if sp_axis is not None:
            n = n * jax.lax.axis_size(sp_axis)
        xf = x.astype(jnp.float32)
        dyf = dy.astype(jnp.float32)
        # one fused pass over (dy, x): per-lane partials over T
        sd = jnp.sum(dyf, axis=1)  # [B, FC]
        sdx = jnp.einsum("btk,btk->bk", dyf, xf)
        # group folds on [B, FC] partials (tiny)
        gamma_lane = jnp.tile(gamma, f)[None]  # [1, FC]

        def fold(a):
            folded = (a * gamma_lane).reshape(b, f, GROUPS, cpg).sum(
                axis=(1, 3))
            if sp_axis is not None:
                folded = jax.lax.psum(folded, sp_axis)
            return folded

        s1 = fold(sd)  # Σ γ·dy         [B, G]
        s2 = rstd * (fold(sdx) - mean * s1)  # Σ γ·dy·x̂
        # dx = A·dy + B·x + C with per-channel coefficients
        rstd_c = jnp.repeat(rstd, cpg, axis=1)  # [B, C]
        mean_c = jnp.repeat(mean, cpg, axis=1)
        s1_c = jnp.repeat(s1, cpg, axis=1)
        s2_c = jnp.repeat(s2, cpg, axis=1)
        a_c = rstd_c * gamma[None, :]
        b_c = -jnp.square(rstd_c) * s2_c / n
        c_c = (-rstd_c * s1_c + mean_c * jnp.square(rstd_c) * s2_c) / n
        a_l = jnp.tile(a_c, (1, f))[:, None, :]
        b_l = jnp.tile(b_c, (1, f))[:, None, :]
        c_l = jnp.tile(c_c, (1, f))[:, None, :]
        dx = dyf * a_l + xf * b_l + c_l
        # dgamma/dbeta from the same per-lane partials
        rstd_l = jnp.tile(rstd_c, (1, f))
        mean_l = jnp.tile(mean_c, (1, f))
        dg_lane = rstd_l * (sdx - mean_l * sd)  # [B, FC] = Σ_t dy·x̂
        dgamma = dg_lane.reshape(b, f, c).sum(axis=(0, 1))
        dbeta = sd.reshape(b, f, c).sum(axis=(0, 1)) if has_beta else None
        return (dgamma.astype(gamma.dtype), dbeta, dx.astype(x.dtype))

    op.defvjp(fwd, bwd)
    return op


def gn_flat(pnorm, x, *, f: int, c: int, sp_axis=None):
    """Differentiable GroupNorm over flat [B, T, F·C] (reductions read
    through bitcast reshapes; no NHWC materialization; analytic backward).
    Matches torch.nn.GroupNorm(8, C, eps=1e-6). sp_axis: global statistics
    over a sharded T axis (collectives executed inside the custom VJP)."""
    gamma = pnorm["g"].astype(jnp.float32)
    beta = pnorm.get("b")
    if beta is not None:
        beta = beta.astype(jnp.float32)
    return _gn_op(f, c, beta is not None, sp_axis)(gamma, beta, x)


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


# ------------------------------------------------- strided transitions ----
# Custom VJPs for the k4 s2 down-conv and transposed up-conv flat kernels
# (reference models/diffusion.py:59-78 Downsample/Upsample in training).
# dx of each is the OTHER kernel with the spatially-flipped, I/O-transposed
# HWIO weight (verified exact vs jax.vjp of the XLA convs); dW is a mirror
# kernel accumulating per-tap [S, P] / [Q, P_s] contractions into the
# packed-weight layout, unpacked to HWIO through the packer's VJP.

def _flip_swap(w):
    return jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)


def _down_dw_kernel(refs, *, tile_t, r, s, p, n_t):
    it = iter(refs)
    x_ref, top_ref, bot_ref = next(it), next(it), next(it)
    g_ref = next(it)
    out_ref = next(it)
    se = next(it)
    so = next(it)

    b = pl.program_id(0)
    i = pl.program_id(1)
    m = tile_t * r
    h = 2 * r

    for k in range(tile_t):
        se[h + k * r : h + (k + 1) * r, :] = x_ref[0, 2 * k * r : (2 * k + 1) * r, :]
        so[h + k * r : h + (k + 1) * r, :] = x_ref[0, (2 * k + 1) * r : (2 * k + 2) * r, :]
    se[h - r : h, :] = top_ref[0, 0:r, :]
    so[h - r : h, :] = top_ref[0, r : 2 * r, :]
    se[h + m : h + m + r, :] = bot_ref[0, 0:r, :]
    so[h + m : h + m + r, :] = bot_ref[0, r : 2 * r, :]

    @pl.when(i == 0)
    def _():
        se[0:h, :] = jnp.zeros((h, s), se.dtype)
        so[0:h, :] = jnp.zeros((h, s), so.dtype)

    @pl.when(i == n_t - 1)
    def _():
        se[h + m :, :] = jnp.zeros((h, s), se.dtype)
        so[h + m :, :] = jnp.zeros((h, s), so.dtype)

    @pl.when(jnp.logical_and(b == 0, i == 0))
    def _():
        out_ref[:, :] = jnp.zeros((12 * s, p), jnp.float32)

    gidx = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0) % r
    first_mask = gidx == 0
    last_mask = gidx == r - 1
    g = g_ref[0]
    stream = {0: so, 1: se, 2: so, 3: se}
    tshift = {0: -r, 1: 0, 2: 0, 3: r}
    for dt in range(4):
        sc = stream[dt]
        for dq in (-1, 0, 1):
            delta = tshift[dt] + dq
            rows = sc[h + delta : h + delta + m, :]
            if dq == -1:
                rows = jnp.where(first_mask, jnp.zeros((), rows.dtype), rows)
            elif dq == 1:
                rows = jnp.where(last_mask, jnp.zeros((), rows.dtype), rows)
            j = dt * 3 + dq + 1
            out_ref[j * s : (j + 1) * s, :] = out_ref[
                j * s : (j + 1) * s, :
            ] + jax.lax.dot_general(
                rows, g, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )


def conv_down_dw_flat(x, gout, *, c_in: int, c_out: int,
                      tile_t: int | None = None):
    """Packed [12·S, P] weight gradient of conv_down_flat.
    x: [B, T, F·C_in]; gout: [B, T/2, (F/2)·C_out]."""
    from .pallas.conv_strided import down_plan

    bsz, t, fc_in = x.shape
    p, s = down_plan(c_in, c_out)
    r = fc_in // s
    t_out = t // 2
    tile_t = _pick_tile_t(t_out, r, s, x.dtype.itemsize, tile_t,
                          m_cap=2048, b_cap=1 << 18)
    n_t = t_out // tile_t

    xv = x.reshape(bsz, t * r, s)
    gv = gout.reshape(bsz, t_out * r, p)
    kern = functools.partial(_down_dw_kernel, tile_t=tile_t, r=r, s=s, p=p,
                             n_t=n_t)
    return pl.pallas_call(
        lambda *refs: kern(refs),
        grid=(bsz, n_t),
        in_specs=[
            pl.BlockSpec((1, 2 * tile_t * r, s), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * r, s),
                         lambda b, i: (b, jnp.maximum(i * tile_t - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * r, s),
                         lambda b, i: (b, jnp.minimum((i + 1) * tile_t,
                                                      t // 2 - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_t * r, p), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((12 * s, p), lambda b, i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((12 * s, p), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM(((tile_t + 4) * r, s), x.dtype),
            pltpu.VMEM(((tile_t + 4) * r, s), x.dtype),
        ],
    )(xv, xv, xv, gv)


def _up_dw_kernel(refs, *, tile_t, r, q, p_s, n_t):
    it = iter(refs)
    x_ref, top_ref, bot_ref = next(it), next(it), next(it)
    g_ref = next(it)
    out_ref = next(it)
    sc = next(it)
    ge = next(it)
    go = next(it)

    b = pl.program_id(0)
    i = pl.program_id(1)
    m = tile_t * r
    h = 2 * r

    sc[0:h, :] = top_ref[0]
    sc[h : h + m, :] = x_ref[0]
    sc[h + m :, :] = bot_ref[0]

    @pl.when(i == 0)
    def _():
        sc[0:h, :] = jnp.zeros((h, q), sc.dtype)

    @pl.when(i == n_t - 1)
    def _():
        sc[h + m :, :] = jnp.zeros((h, q), sc.dtype)

    # de-interleave the cotangent's time-parity streams (even rows → ge)
    for k in range(tile_t):
        ge[k * r : (k + 1) * r, :] = g_ref[0, 2 * k * r : (2 * k + 1) * r, :]
        go[k * r : (k + 1) * r, :] = g_ref[0, (2 * k + 1) * r : (2 * k + 2) * r, :]

    @pl.when(jnp.logical_and(b == 0, i == 0))
    def _():
        out_ref[:, :] = jnp.zeros((12 * q, p_s), jnp.float32)

    gidx = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0) % r
    first_mask = gidx == 0
    last_mask = gidx == r - 1
    tshift = {0: (0, -r), 1: (r, 0)}
    for stream, g_scr in ((0, ge), (1, go)):
        gs = g_scr[0:m, :]
        for local_dt in (0, 1):
            for dq in (-1, 0, 1):
                delta = tshift[stream][local_dt] + dq
                rows = sc[h + delta : h + delta + m, :]
                if dq == -1:
                    rows = jnp.where(first_mask, jnp.zeros((), rows.dtype),
                                     rows)
                elif dq == 1:
                    rows = jnp.where(last_mask, jnp.zeros((), rows.dtype),
                                     rows)
                j = stream * 6 + local_dt * 3 + dq + 1
                out_ref[j * q : (j + 1) * q, :] = out_ref[
                    j * q : (j + 1) * q, :
                ] + jax.lax.dot_general(
                    rows, gs, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )


def conv_up_dw_flat(x, gout, *, c_in: int, c_out: int,
                    tile_t: int | None = None):
    """Packed [12·Q, P_s] weight gradient of conv_up_flat.
    x: [B, T, F·C_in]; gout: [B, 2T, (2F)·C_out]."""
    from .pallas.conv_strided import up_plan

    bsz, t, fc_in = x.shape
    q, p_s = up_plan(c_in, c_out)
    r = fc_in // q
    # bound by P_s (the 2·tile_t·r × P_s cotangent block is the larger one)
    tile_t = _pick_tile_t(t, r, p_s, x.dtype.itemsize, tile_t,
                          m_cap=2048, b_cap=1 << 18)
    n_t = t // tile_t
    ht = tile_t // 2

    xv = x.reshape(bsz, t * r, q)
    gv = gout.reshape(bsz, 2 * t * r, p_s)
    kern = functools.partial(_up_dw_kernel, tile_t=tile_t, r=r, q=q, p_s=p_s,
                             n_t=n_t)
    return pl.pallas_call(
        lambda *refs: kern(refs),
        grid=(bsz, n_t),
        in_specs=[
            pl.BlockSpec((1, tile_t * r, q), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * r, q),
                         lambda b, i: (b, jnp.maximum(i * ht - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * r, q),
                         lambda b, i: (b, jnp.minimum((i + 1) * ht,
                                                      t // 2 - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * tile_t * r, p_s), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((12 * q, p_s), lambda b, i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((12 * q, p_s), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM(((tile_t + 4) * r, q), x.dtype),
            pltpu.VMEM((tile_t * r, p_s), x.dtype),
            pltpu.VMEM((tile_t * r, p_s), x.dtype),
        ],
    )(xv, xv, xv, gv)


@functools.cache
def _down_op(c_in: int, c_out: int):
    from .pallas.conv_strided import (
        conv_down_flat,
        conv_up_flat,
        pack_down_weights,
        pack_down_weights12,
        pack_up_weights,
        pack_up_weights12,
    )

    @jax.custom_vjp
    def op(x, w, bias):
        return conv_down_flat(x, pack_down_weights(w, x.dtype), bias,
                              c_in=c_in, c_out=c_out)

    def fwd(x, w, bias):
        return op(x, w, bias), (x, w)

    def bwd(res, g):
        x, w = res
        dx = conv_up_flat(
            g, pack_up_weights(_flip_swap(w), g.dtype),
            jnp.zeros((c_in,), jnp.float32), c_in=c_out, c_out=c_in)
        dw12 = conv_down_dw_flat(x, g, c_in=c_in, c_out=c_out)
        # the dw kernel emits the 12-block layout; unpack through the
        # always-12 packer regardless of the forward's (possibly slim) one
        _, unpack = jax.vjp(
            lambda ww: pack_down_weights12(ww.astype(jnp.float32)), w)
        (dw,) = unpack(dw12)
        db = jnp.sum(g.astype(jnp.float32), axis=(0, 1)).reshape(
            -1, c_out).sum(axis=0)
        return dx, dw.astype(w.dtype), db

    op.defvjp(fwd, bwd)
    return op


@functools.cache
def _up_op(c_in: int, c_out: int):
    from .pallas.conv_strided import (
        conv_down_flat,
        conv_up_flat,
        pack_down_weights,
        pack_down_weights12,
        pack_up_weights,
        pack_up_weights12,
    )

    @jax.custom_vjp
    def op(x, w, bias):
        return conv_up_flat(x, pack_up_weights(w, x.dtype), bias,
                            c_in=c_in, c_out=c_out)

    def fwd(x, w, bias):
        return op(x, w, bias), (x, w)

    def bwd(res, g):
        x, w = res
        dx = conv_down_flat(
            g, pack_down_weights(_flip_swap(w), g.dtype),
            jnp.zeros((c_in,), jnp.float32), c_in=c_out, c_out=c_in)
        dw12 = conv_up_dw_flat(x, g, c_in=c_in, c_out=c_out)
        _, unpack = jax.vjp(
            lambda ww: pack_up_weights12(ww.astype(jnp.float32)), w)
        (dw,) = unpack(dw12)
        db = jnp.sum(g.astype(jnp.float32), axis=(0, 1)).reshape(
            -1, c_out).sum(axis=0)
        return dx, dw.astype(w.dtype), db

    op.defvjp(fwd, bwd)
    return op


def conv_down_flat_t(x, w, bias, *, c_in: int, c_out: int):
    """Trainable (custom-VJP) flat k4 s2 down-conv (w: raw HWIO [4,4,ci,co])."""
    return _down_op(c_in, c_out)(x, w, bias)


def conv_up_flat_t(x, w, bias, *, c_in: int, c_out: int):
    """Trainable (custom-VJP) flat transposed k4 s2 up-conv (w: raw HWIO)."""
    return _up_op(c_in, c_out)(x, w, bias)
