"""Fused residual block over flat-packed [B, T, F·C] activations.

The residual block (reference models/diffusion.py:42-56)

    x → GN1 → SiLU → conv1 (+temb) → SiLU → GN2 → conv2 → SiLU → GN3 → +x

executed as two fused Pallas conv kernels plus cheap XLA glue:

1. kernel 1: GN1 (per-lane affine prologue from precomputed statistics) +
   SiLU + conv1 + temb add + SiLU → h, with GN2's statistics (per-lane
   sum/sum² over T) accumulated in the kernel epilogue — no extra HBM pass;
2. kernel 2: GN2 prologue + conv2 + bias + SiLU → s, with GN3's statistics
   likewise free;
3. the tail ``x + GN3(s)`` is one fused XLA elementwise pass (GN3 has a
   zero-init weight and no bias — reference models/diffusion.py:25-26), and
   the NEXT block's GN1 statistics are reduced in that same fused pass.

Blocks therefore chain through ``(out, out_stats)``; only the first block of
a stage computes its input statistics explicitly. The kernels carry custom
VJPs (ops/flat_grad.py) so this path serves both the sampling hot loop and
training (whole-model grads are parity-tested against the XLA resblock).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .pallas.conv_flat import (
    conv3x3_flat,
    flat_period,
    pack_conv_weights,
    pack_conv_weights_int8,
    residual_affine_flat,
)

GROUPS = 8
EPS = 1e-6


def _affine_c_from_sums_p(s1p, s2p, n: int, norm_params, c: int):
    """Per-channel GroupNorm (scale, shift) [B, C] fp32 from period-folded
    [B, P] sums (n = elements per group). The group of a lane depends only
    on lane % C, so the [B, P] fold loses nothing."""
    b, p = s1p.shape
    cpg = c // GROUPS
    s1g = s1p.reshape(b, p // c, GROUPS, cpg).sum(axis=(1, 3))  # [B, G]
    s2g = s2p.reshape(b, p // c, GROUPS, cpg).sum(axis=(1, 3))
    mean = s1g / n
    var = s2g / n - jnp.square(mean)
    rstd = jax.lax.rsqrt(jnp.maximum(var, 0.0) + EPS)
    gamma = norm_params["g"].astype(jnp.float32)
    beta = norm_params.get("b")
    mean_c = jnp.repeat(mean, cpg, axis=1)  # [B, C]
    rstd_c = jnp.repeat(rstd, cpg, axis=1)
    scale_c = rstd_c * gamma[None, :]
    shift_c = -mean_c * rstd_c * gamma[None, :]
    if beta is not None:
        shift_c = shift_c + beta.astype(jnp.float32)[None, :]
    return scale_c, shift_c


def lane_sums(x_flat):
    """Per-lane (sum, sum²) over T in fp32: ([B, F·C], [B, F·C])."""
    xf = x_flat.astype(jnp.float32)
    return jnp.sum(xf, axis=1), jnp.einsum("btk,btk->bk", xf, xf)


def _affine_from_sums(s1, s2, t: int, norm_params, f: int, c: int):
    """Fold GroupNorm into per-lane (scale, shift) [B, F·C] fp32 from
    per-lane sums over T: GN(x) = x·scale + shift."""
    b = s1.shape[0]
    cpg = c // GROUPS
    s1g = s1.reshape(b, f, GROUPS, cpg).sum(axis=(1, 3))  # [B, G]
    s2g = s2.reshape(b, f, GROUPS, cpg).sum(axis=(1, 3))
    n = t * f * cpg
    mean = s1g / n
    var = s2g / n - jnp.square(mean)
    rstd = jax.lax.rsqrt(jnp.maximum(var, 0.0) + EPS)

    gamma = norm_params["g"].astype(jnp.float32)
    beta = norm_params.get("b")
    mean_c = jnp.repeat(mean, cpg, axis=1)  # [B, C]
    rstd_c = jnp.repeat(rstd, cpg, axis=1)
    scale_c = rstd_c * gamma[None, :]
    shift_c = -mean_c * rstd_c * gamma[None, :]
    if beta is not None:
        shift_c = shift_c + beta.astype(jnp.float32)[None, :]
    return jnp.tile(scale_c, (1, f)), jnp.tile(shift_c, (1, f))


def gn_stats_flat(x_flat, f: int, c: int):
    """Per-(sample, group) mean / reciprocal-std (kept for tests)."""
    b, t, fc = x_flat.shape
    s1, s2 = lane_sums(x_flat)
    cpg = c // GROUPS
    s1g = s1.reshape(b, f, GROUPS, cpg).sum(axis=(1, 3))
    s2g = s2.reshape(b, f, GROUPS, cpg).sum(axis=(1, 3))
    n = t * f * cpg
    mean = s1g / n
    var = s2g / n - jnp.square(mean)
    return mean, jax.lax.rsqrt(jnp.maximum(var, 0.0) + EPS)


def gn_affine_flat(x_flat, norm_params, f: int, c: int):
    """GroupNorm folded to per-lane (scale, shift) — computes its own stats."""
    s1, s2 = lane_sums(x_flat)
    return _affine_from_sums(s1, s2, x_flat.shape[1], norm_params, f, c)


def resblock_flat_int8(p, xv, temb, *, f: int, c: int,
                       tile_t: int | None = None,
                       in_stats=None, in_scales=None,
                       quant_out: bool = False,
                       want_out_stats: bool = False,
                       compute_dtype=jnp.bfloat16):
    """Residual block with int8 ACTIVATION STORAGE over the [B, T·G, P] row
    view — HBM traffic is the forward's binding roofline (BASELINE.md), and
    int8 storage halves the bf16 floor again:

    - conv1/conv2 quantize their outputs per tile in the kernel epilogue
      (quant_out) and dequantize int8 inputs in the assembly pass (conv math
      stays in compute_dtype with fp32 accumulation — int8 is storage, not
      arithmetic);
    - the tail ``x + GN3(s)`` — XLA glue in the float path — runs as ONE
      fused Pallas pass (residual_affine_flat) that dequantizes both
      streams, applies the folded GN3 affine, optionally requantizes the
      result for the next block, and accumulates the next GroupNorm's
      statistics on the pre-quant fp32 values.

    xv: [B, T·G, P] rows, int8 (with in_scales [B, n_t]) or a float dtype —
    stage entries arrive float from the transition kernels, interior blocks
    chain int8. All scale grids share one tile_t (resolved from the first
    quantizing kernel and threaded through the chain).

    Returns (out, out_scales | None, out_stats | None): out is int8 when
    quant_out (with its [B, n_t] scales), else compute_dtype; out_stats are
    the pre-quant fp32 (sum, sum²) in [B, P] period-folded form.

    Reference math accelerated: Residual_Block (models/diffusion.py:12-56);
    numerics are int8-quantization-bounded vs the float kernels
    (tests/test_pallas_conv.py, SNR-guarded at full scale on TPU)."""
    pp = flat_period(c)
    fc = f * c
    g = fc // pp
    b, rows, _ = xv.shape
    t = rows // g
    n = t * f * (c // GROUPS)
    fpp = pp // c
    if xv.dtype != jnp.dtype(jnp.int8):
        xv = xv.astype(compute_dtype)  # packed weights are in compute_dtype

    w1 = pack_conv_weights(p["conv1"]["w"], compute_dtype)
    w2 = pack_conv_weights(p["conv2"]["w"], compute_dtype)
    temb_p = jnp.tile(temb.astype(jnp.float32), (1, fpp))
    bias2_p = jnp.tile(p["conv2"]["b"].astype(jnp.float32), fpp)
    if in_stats is None:
        if xv.dtype == jnp.dtype(jnp.int8):
            raise ValueError("int8 input requires in_stats (pre-quant sums)")
        xf32 = xv.astype(jnp.float32)
        in_stats = (jnp.sum(xf32, axis=1),
                    jnp.einsum("brk,brk->bk", xf32, xf32))
    elif in_stats[0].shape[1] == fc and fc != pp:
        in_stats = tuple(s.reshape(b, g, pp).sum(axis=1) for s in in_stats)

    def pre_of(s1p, s2p, norm):
        sc, sh = _affine_c_from_sums_p(s1p, s2p, n, norm, c)
        return jnp.tile(sc, (1, fpp)), jnp.tile(sh, (1, fpp))

    hv, h_sc, h1, h2 = conv3x3_flat(
        xv, w1, c=c, f=f, rows_view=True, tile_t=tile_t,
        in_scales=in_scales,
        pre=pre_of(*in_stats, p["norm1"]), pre_silu=True, add=temb_p,
        post_silu=True, want_stats=True, quant_out=True,
        compute_dtype=compute_dtype,
    )
    sv, s_sc, s1, s2 = conv3x3_flat(
        hv, w2, c=c, f=f, rows_view=True, in_scales=h_sc,
        pre=pre_of(h1, h2, p["norm2"]), pre_silu=False, add=bias2_p,
        post_silu=True, want_stats=True, quant_out=True,
        compute_dtype=compute_dtype,
    )
    scale3, shift3 = _affine_c_from_sums_p(s1, s2, n, p["norm3"], c)
    res = residual_affine_flat(
        xv, sv, (jnp.tile(scale3, (1, fpp)), jnp.tile(shift3, (1, fpp))),
        c=c, f=f, x_scales=in_scales, s_scales=s_sc,
        quant_out=quant_out, want_stats=want_out_stats,
        out_dtype=compute_dtype,
    )
    if not isinstance(res, tuple):
        res = (res,)
    out = res[0]
    out_scales = res[1] if quant_out else None
    out_stats = tuple(res[-2:]) if want_out_stats else None
    return out, out_scales, out_stats


def resblock_flat(p, x_flat, temb, *, f: int, c: int, tile_t: int | None = None,
                  in_stats=None, want_out_stats: bool = False,
                  rows_io: bool = False, tap_int8: bool = False):
    """p: resblock params; x_flat [B, T, F·C] (or the [B, T·G, P] row view
    when rows_io=True — stage chains should pass rows to skip per-block
    reshapes); temb [B, C].

    in_stats: optional (s1, s2) per-lane sums of x_flat from the previous
    block ([B, P] period-folded) or from a transition kernel ([B, F·C]);
    computed here when absent. Returns out, or (out, out_stats) when
    want_out_stats (out_stats in [B, P] form). Matches
    models.unet._resblock_apply.

    Everything between the entry and exit reshape runs in the kernels' own
    [B, T·G, P] row view (rows_view=True): XLA materializes the
    [B, T, F·C] ↔ row-view reshapes around custom calls whenever B > 1
    (trace-measured: 39 ms of reshape copies per batch-2 forward), and all
    per-lane affines here are period-invariant so [B, P] patterns suffice.

    tap_int8=True runs both convs' tap matmuls as int8 × int8 → int32 on
    the MXU (per-tile activation requant + per-output-channel weight quant,
    conv_flat mxu_int8) — 2× the bf16 MXU rate. The hot convs are
    MXU-bound, not HBM-bound (overhead-free round-3 measurements,
    BASELINE.md): profitable at the lane-padded widths C ≤ 96."""
    dtype = x_flat.dtype
    pp = flat_period(c)
    fc = f * c
    g = fc // pp
    if rows_io:
        b, rows, _ = x_flat.shape
        t = rows // g
        xv = x_flat
    else:
        b, t, _ = x_flat.shape
        xv = x_flat.reshape(b, t * g, pp)
    n = t * f * (c // GROUPS)  # elements per (sample, group)
    fpp = pp // c

    if tap_int8:
        w1, ws1 = pack_conv_weights_int8(p["conv1"]["w"])
        w2, ws2 = pack_conv_weights_int8(p["conv2"]["w"])
        kw1 = {"mxu_int8": True, "w_scale": ws1}
        kw2 = {"mxu_int8": True, "w_scale": ws2}
    else:
        w1 = pack_conv_weights(p["conv1"]["w"], dtype)
        w2 = pack_conv_weights(p["conv2"]["w"], dtype)
        kw1 = kw2 = {}
    temb_p = jnp.tile(temb.astype(jnp.float32), (1, fpp))  # [B, P]
    bias2_p = jnp.tile(p["conv2"]["b"].astype(jnp.float32), fpp)
    if in_stats is None:
        xf32 = xv.astype(jnp.float32)
        in_stats = (jnp.sum(xf32, axis=1),
                    jnp.einsum("brk,brk->bk", xf32, xf32))  # [B, P]
    elif in_stats[0].shape[1] == fc and fc != pp:
        # transition kernels emit [B, F·C] sums — fold to [B, P]
        in_stats = tuple(s.reshape(b, g, pp).sum(axis=1) for s in in_stats)

    def pre_of(s1p, s2p, norm):
        sc, sh = _affine_c_from_sums_p(s1p, s2p, n, norm, c)
        return jnp.tile(sc, (1, fpp)), jnp.tile(sh, (1, fpp))  # [B, P]

    hv, h1, h2 = conv3x3_flat(
        xv, w1, c=c, f=f, rows_view=True, tile_t=tile_t,
        pre=pre_of(*in_stats, p["norm1"]), pre_silu=True, add=temb_p,
        post_silu=True, want_stats=True, **kw1,
    )
    sv, s1, s2 = conv3x3_flat(
        hv, w2, c=c, f=f, rows_view=True, tile_t=tile_t,
        pre=pre_of(h1, h2, p["norm2"]), pre_silu=False, add=bias2_p,
        post_silu=True, want_stats=True, **kw2,
    )
    scale3, shift3 = _affine_c_from_sums_p(s1, s2, n, p["norm3"], c)
    scale3_p = jnp.tile(scale3, (1, fpp))[:, None, :]
    shift3_p = jnp.tile(shift3, (1, fpp))[:, None, :]
    out_v = (
        xv.astype(jnp.float32) + sv.astype(jnp.float32) * scale3_p + shift3_p
    ).astype(dtype)
    out = out_v if rows_io else out_v.reshape(b, t, fc)
    if want_out_stats:
        # Reductions read the STORAGE-dtype result (a separate fusion):
        # keeping them on the fp32 expression forces XLA to materialize a
        # full fp32 copy of the stage array between the add and the
        # reductions (profiled: 0.63 ms per resblock at s0-bf16). Stats
        # from bf16 values deviate ~1e-3 relative — the folded GN affine is
        # far less sensitive than that (fp32 path unchanged: dtype=fp32).
        o32 = out_v.astype(jnp.float32)
        out_stats = (jnp.sum(o32, axis=1), jnp.einsum("brk,brk->bk", o32, o32))
        return out, out_stats
    return out
