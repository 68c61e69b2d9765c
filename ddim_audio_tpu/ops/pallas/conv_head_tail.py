"""Pallas TPU kernels: the U-Net's channel-asymmetric HEAD (C_in→ch0) and
TAIL (ch0→C_out) 3×3 convs in the INPUT's own flat layout.

Why: the generic flat conv (conv_flat.py) is square (C→C), so the model
used to zero-pad the 2-channel audio input to ch0=32 and run the head/tail
at full s0 geometry — 9 [524288,128]×[128,128] tap passes each
(155 GFLOP, ~1.8 ms) where the useful math is a 2↔32-channel window
(~10 GFLOP), plus a 16×-padded [B, T, F·32] sampler state whose every
DDIM/DDPM update op and HBM pass paid the padding.

Layout algebra (C_in=2, ch0=32, F=256 — parameterized below):
  input rows  [T·G2, P2]   P2 = 128 (needs 128 % C_in == 0),
                           FP2 = P2/C_in = 64 f's per row, G2 = F·C_in/P2
  output rows [T·G0, P0]   P0 = 128 (needs 128 % ch0 == 0), G0 = F·ch0/P0
  K = G0/G2 = ch0/C_in output rows per input row. The s0 stream viewed as
  [T·G2, K·P0] is the SAME row-major bytes (16·128 = 2048 lanes per input
  row), so the head can emit — and the tail consume — the s0 stream
  through one free reshape.

HEAD: out[T·G2, K·P0] = Σ_dt dot(in rows @ dt, W_dt [P2, K·P0]) — 3 dense
passes (the full 3×3 f-window of every output lane lives INSIDE one input
row) + 6 tiny carry passes for the two period-boundary f-offsets, whose
results land on one 128-lane-aligned OUTPUT slice each (first/last ch0
lanes), masked post-matmul on period-first/last rows. 58 GFLOP vs 155.
GroupNorm statistics for s0's first resblock accumulate in the epilogue
(per (row-mod-G2, lane) sums — exactly the FC0 per-lane layout after a
row-major reshape).

TAIL: the mirror — out[T·G2, P2] = Σ_dt dot(s0 view [·, K·P0] @ dt,
Wt_dt [K·P0, P2]) + 6 slim [128, P2] carries reading aligned lane slices
of the neighbour row. The U-Net's final head-skip add (reference
models/diffusion.py:279) rides the assembly as a fused input residual.

Sampler contract enabled by this pair: the flat-io sampling state is the
UNPADDED [B, T, F·C_in] array — 16× fewer bytes through every sampler
update op and step-boundary HBM pass than the padded round-2 contract.

Reference behavior accelerated: the head/tail convs of the reference
U-Net (models/diffusion.py:238-241, 276-279); numerics match
lax.conv_general_dilated at fp32 (tests/test_pallas_conv.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .conv_flat import _pick_tile_t

LANES = 128


def head_tail_plan(c_in: int, c0: int, f: int):
    """(P2, FP2, G2, K) of the asymmetric head/tail geometry."""
    p2 = LANES
    fp2 = p2 // c_in
    g2 = f * c_in // p2
    k = c0 // c_in
    return p2, fp2, g2, k


def supports_head_tail(c_in: int, c0: int, f: int, hw: bool = True) -> bool:
    """Both specialized kernels apply: narrow channel counts that divide a
    128-lane row, whole periods per time step, and (on hardware) the
    2·G2-sublane halo blocks Mosaic needs 8-aligned."""
    if LANES % c_in or LANES % c0 or c0 % c_in:
        return False
    p2, fp2, g2, k = head_tail_plan(c_in, c0, f)
    return (
        f * c_in % p2 == 0
        and g2 >= 1
        and (f * c0) % LANES == 0
        and (f * c0 // LANES) == g2 * k
        and (not hw or g2 % 4 == 0)
    )


def pack_head_weights(w, dtype=jnp.float32):
    """w [3, 3, C_in, ch0] (HWIO) → [3·P2 + 6·P2, K·P0] blocks:
        rows [dt·P2, (dt+1)·P2): dense in-row taps —
            W[fi·C_in + ci, fo·ch0 + co] = w[dt, df, ci, co],
            fi = fo + df − 1 ∈ [0, FP2)
        rows 3·P2 + dt·P2 …: the fi = −1 carry (prev row's last C_in
            lanes; result lands on output lanes [0, ch0) ⊂ [0, 128))
        rows 6·P2 + dt·P2 …: the fi = FP2 carry (next row's first C_in
            lanes; result lands on the LAST 128-lane output slice)
    The carry blocks are [P2, 128] (output-sliced), not [P2, K·P0]."""
    kh, kw, c_in, c0 = w.shape
    assert kh == 3 and kw == 3
    p2 = LANES
    fp2 = p2 // c_in
    wide = fp2 * c0
    dense = jnp.zeros((3 * p2, wide), jnp.float32)
    lo = jnp.zeros((3 * p2, LANES), jnp.float32)
    hi = jnp.zeros((3 * p2, LANES), jnp.float32)
    for dt in range(3):
        for df in range(3):
            for fo in range(fp2):
                fi = fo + df - 1
                wv = w[dt, df].astype(jnp.float32)
                if 0 <= fi < fp2:
                    dense = dense.at[
                        dt * p2 + fi * c_in : dt * p2 + (fi + 1) * c_in,
                        fo * c0 : (fo + 1) * c0,
                    ].add(wv)
                elif fi == -1:
                    lo = lo.at[dt * p2 + (p2 - c_in) : dt * p2 + p2,
                               0:c0].add(wv)
                else:  # fi == fp2, output lanes land in the LAST 128 slice
                    off = fo * c0 - (wide - LANES)
                    hi = hi.at[dt * p2 : dt * p2 + c_in,
                               off : off + c0].add(wv)
    # store carries padded to the wide column count? No — keep them as a
    # separate [6·P2, 128] tail so the kernel reads exact [P2, 128] blocks.
    out = jnp.zeros((9 * p2, wide), jnp.float32)
    out = out.at[: 3 * p2, :].set(dense)
    out = out.at[3 * p2 : 6 * p2, 0:LANES].set(lo)
    out = out.at[6 * p2 : 9 * p2, 0:LANES].set(hi)
    return out.astype(dtype)


def _head_kernel(refs, *, tile_t, g2, p2, wide, n_t, want_stats):
    it = iter(refs)
    x_ref, top_ref, bot_ref = next(it), next(it), next(it)
    w_ref = next(it)
    b_ref = next(it)
    out_ref = next(it)
    stats_ref = next(it) if want_stats else None
    sc = next(it)

    i = pl.program_id(1)
    m = tile_t * g2
    h = 2 * g2

    sc[0:h, :] = top_ref[0]
    sc[h : h + m, :] = x_ref[0]
    sc[h + m :, :] = bot_ref[0]

    @pl.when(i == 0)
    def _():
        sc[0:h, :] = jnp.zeros((h, p2), sc.dtype)

    @pl.when(i == n_t - 1)
    def _():
        sc[h + m :, :] = jnp.zeros((h, p2), sc.dtype)

    acc = jnp.zeros((m, wide), jnp.float32)
    lo = jnp.zeros((m, LANES), jnp.float32)
    hi = jnp.zeros((m, LANES), jnp.float32)
    for dt in range(3):
        delta = (dt - 1) * g2
        rows = sc[h + delta : h + delta + m, :]
        acc = acc + jnp.dot(rows, w_ref[dt * p2 : (dt + 1) * p2, :],
                            preferred_element_type=jnp.float32)
        lo = lo + jnp.dot(
            sc[h + delta - 1 : h + delta - 1 + m, :],
            w_ref[(3 + dt) * p2 : (4 + dt) * p2, 0:LANES],
            preferred_element_type=jnp.float32,
        )
        hi = hi + jnp.dot(
            sc[h + delta + 1 : h + delta + 1 + m, :],
            w_ref[(6 + dt) * p2 : (7 + dt) * p2, 0:LANES],
            preferred_element_type=jnp.float32,
        )
    ri = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0) % g2
    zf = jnp.zeros((), jnp.float32)
    lo = jnp.where(ri == 0, zf, lo)
    hi = jnp.where(ri == g2 - 1, zf, hi)
    # the carries land on the first/last 128-lane output slices; Mosaic has
    # no in-register scatter-add, so overlay via a lane-aligned concat
    if wide == LANES:
        acc = acc + lo + hi
    else:
        acc = acc + jnp.concatenate(
            [lo, jnp.zeros((m, wide - 2 * LANES), jnp.float32), hi], axis=1)

    out = acc + b_ref[0]
    out_ref[0] = out.astype(out_ref.dtype)

    if stats_ref is not None:
        @pl.when(i == 0)
        def _():
            stats_ref[0] = jnp.zeros((2, g2, wide), jnp.float32)

        gi = jax.lax.broadcasted_iota(jnp.int32, (g2, m), 0)
        gj = jax.lax.broadcasted_iota(jnp.int32, (g2, m), 1) % g2
        reducer = (gi == gj).astype(jnp.float32)
        stats_ref[0, 0] = stats_ref[0, 0] + jnp.dot(
            reducer, out, preferred_element_type=jnp.float32)
        stats_ref[0, 1] = stats_ref[0, 1] + jnp.dot(
            reducer, out * out, preferred_element_type=jnp.float32)


def conv_head_flat(x2, w2, bias, *, c_in: int, c0: int, f: int,
                   tile_t: int | None = None, want_stats: bool = False):
    """x2: [B, T, F·C_in] (or the [B, T·G2, P2] row view) → s0 stream
    [B, T·G0, P0] rows (+ per-lane (sum, sum²) [B, F·ch0] when want_stats).
    w2: pack_head_weights; bias: [ch0] fp32 (or pre-tiled [F·ch0 pattern]
    of length FP2·ch0)."""
    p2, fp2, g2, k = head_tail_plan(c_in, c0, f)
    wide = fp2 * c0
    bsz = x2.shape[0]
    if x2.ndim != 3:
        raise ValueError("x2 must be [B, T, F*C_in] or rows")
    if x2.shape[2] == f * c_in:
        t = x2.shape[1]
        xv = x2.reshape(bsz, t * g2, p2)
    elif x2.shape[2] == p2:
        t = x2.shape[1] // g2
        xv = x2
    else:
        raise ValueError(f"bad head input {x2.shape}")
    tile_t = _pick_tile_t(t, g2, wide, x2.dtype.itemsize, tile_t)
    n_t = t // tile_t
    ht = tile_t // 2

    bias = jnp.asarray(bias, jnp.float32)
    if bias.shape == (c0,):
        bias = jnp.tile(bias, fp2)
    bias = bias.reshape(1, wide)

    in_specs = [
        pl.BlockSpec((1, tile_t * g2, p2), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2 * g2, p2),
                     lambda b, i: (b, jnp.maximum(i * ht - 1, 0), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2 * g2, p2),
                     lambda b, i: (b, jnp.minimum((i + 1) * ht, t // 2 - 1),
                                   0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec((1, wide), lambda b, i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [pl.BlockSpec((1, tile_t * g2, wide), lambda b, i: (b, i, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((bsz, t * g2, wide), x2.dtype)]
    if want_stats:
        out_specs.append(pl.BlockSpec((1, 2, g2, wide),
                                      lambda b, i: (b, 0, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((bsz, 2, g2, wide), jnp.float32))

    kern = functools.partial(_head_kernel, tile_t=tile_t, g2=g2, p2=p2,
                             wide=wide, n_t=n_t, want_stats=want_stats)
    result = pl.pallas_call(
        lambda *refs: kern(refs),
        grid=(bsz, n_t),
        in_specs=in_specs,
        out_specs=tuple(out_specs) if want_stats else out_specs[0],
        out_shape=tuple(out_shape) if want_stats else out_shape[0],
        scratch_shapes=[pltpu.VMEM(((tile_t + 4) * g2, p2), x2.dtype)],
    )(xv, xv, xv, w2, bias)
    if want_stats:
        out, stats = result
        # stats lanes are (r mod G2) × (so, lane0); FC0 order is
        # ((r%G2)·K + so)·P0 + lane0 — a row-major reshape.
        fc0 = f * c0
        return (out.reshape(bsz, t * g2 * k, LANES),
                stats[:, 0].reshape(bsz, fc0),
                stats[:, 1].reshape(bsz, fc0))
    return result.reshape(bsz, t * g2 * k, LANES)


def pack_tail_weights(w, f: int, dtype=jnp.float32):
    """w [3, 3, ch0, C_out] (HWIO) → [3·W + 6·128, P2] blocks, W = K·P0:
        rows [dt·W, (dt+1)·W): dense — Wt[fi·ch0 + ci, fo·C_out + co]
            = w[dt, df, ci, co], fi = fo + df − 1 ∈ [0, FP2)
        rows 3·W + dt·128 …: fi = −1 carry (prev row's last ch0 lanes via
            the aligned slice [W−128, W))
        rows 3·W + (3+dt)·128 …: fi = FP2 carry (next row's first ch0
            lanes via slice [0, 128))"""
    kh, kw, c0, c_out = w.shape
    assert kh == 3 and kw == 3
    p2, fp2, g2, k = head_tail_plan(c_out, c0, f)
    wide = fp2 * c0
    w2 = jnp.zeros((3 * wide + 6 * LANES, p2), jnp.float32)
    for dt in range(3):
        for df in range(3):
            for fo in range(fp2):
                fi = fo + df - 1
                wv = w[dt, df].astype(jnp.float32)
                cols = slice(fo * c_out, (fo + 1) * c_out)
                if 0 <= fi < fp2:
                    w2 = w2.at[dt * wide + fi * c0 : dt * wide + (fi + 1) * c0,
                               cols].add(wv)
                elif fi == -1:
                    r0 = 3 * wide + dt * LANES + (LANES - c0)
                    w2 = w2.at[r0 : r0 + c0, cols].add(wv)
                else:  # fi == fp2
                    r0 = 3 * wide + (3 + dt) * LANES
                    w2 = w2.at[r0 : r0 + c0, cols].add(wv)
    return w2.astype(dtype)


def _tail_kernel(refs, *, tile_t, g2, p2, wide, n_t, has_res):
    it = iter(refs)
    x_ref, top_ref, bot_ref = next(it), next(it), next(it)
    w_ref = next(it)
    b_ref = next(it)
    if has_res:
        rm_ref, rt_ref, rb_ref = next(it), next(it), next(it)
    out_ref = next(it)
    sc = next(it)

    i = pl.program_id(1)
    m = tile_t * g2
    h = 2 * g2

    def piece(ref, res):
        v = ref[0]
        if has_res:
            v = (v.astype(jnp.float32) + res[0].astype(jnp.float32)).astype(
                sc.dtype)
        return v

    sc[0:h, :] = piece(top_ref, rt_ref if has_res else None)
    sc[h : h + m, :] = piece(x_ref, rm_ref if has_res else None)
    sc[h + m :, :] = piece(bot_ref, rb_ref if has_res else None)

    @pl.when(i == 0)
    def _():
        sc[0:h, :] = jnp.zeros((h, wide), sc.dtype)

    @pl.when(i == n_t - 1)
    def _():
        sc[h + m :, :] = jnp.zeros((h, wide), sc.dtype)

    acc = jnp.zeros((m, p2), jnp.float32)
    lo = jnp.zeros((m, p2), jnp.float32)
    hi = jnp.zeros((m, p2), jnp.float32)
    for dt in range(3):
        delta = (dt - 1) * g2
        acc = acc + jnp.dot(
            sc[h + delta : h + delta + m, :],
            w_ref[dt * wide : (dt + 1) * wide, :],
            preferred_element_type=jnp.float32,
        )
        lo = lo + jnp.dot(
            sc[h + delta - 1 : h + delta - 1 + m, wide - LANES :],
            w_ref[3 * wide + dt * LANES : 3 * wide + (dt + 1) * LANES, :],
            preferred_element_type=jnp.float32,
        )
        hi = hi + jnp.dot(
            sc[h + delta + 1 : h + delta + 1 + m, 0:LANES],
            w_ref[3 * wide + (3 + dt) * LANES : 3 * wide + (4 + dt) * LANES,
                  :],
            preferred_element_type=jnp.float32,
        )
    ri = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0) % g2
    zf = jnp.zeros((), jnp.float32)
    acc = (acc + jnp.where(ri == 0, zf, lo)
           + jnp.where(ri == g2 - 1, zf, hi))
    out_ref[0] = (acc + b_ref[0]).astype(out_ref.dtype)


def conv_tail_flat(hf, w2, bias, *, c0: int, c_out: int, f: int,
                   residual=None, tile_t: int | None = None):
    """hf: s0 stream [B, T·G0, P0] rows (or [B, T, F·ch0]) → [B, T, F·C_out]
    flat. w2: pack_tail_weights; bias: [C_out] fp32. residual: optional s0
    stream summed into the input during assembly (the final head-skip
    add)."""
    p2, fp2, g2, k = head_tail_plan(c_out, c0, f)
    wide = fp2 * c0
    bsz = hf.shape[0]
    if hf.shape[2] == f * c0:
        t = hf.shape[1]
    elif hf.shape[2] == LANES:
        t = hf.shape[1] // (g2 * k)
    else:
        raise ValueError(f"bad tail input {hf.shape}")
    xv = hf.reshape(bsz, t * g2, wide)
    tile_t = _pick_tile_t(t, g2, wide, hf.dtype.itemsize, tile_t)
    n_t = t // tile_t
    ht = tile_t // 2

    bias = jnp.asarray(bias, jnp.float32)
    if bias.shape == (c_out,):
        bias = jnp.tile(bias, p2 // c_out)
    bias = bias.reshape(1, p2)

    def stream_specs():
        return [
            pl.BlockSpec((1, tile_t * g2, wide), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * g2, wide),
                         lambda b, i: (b, jnp.maximum(i * ht - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * g2, wide),
                         lambda b, i: (b, jnp.minimum((i + 1) * ht,
                                                      t // 2 - 1), 0),
                         memory_space=pltpu.VMEM),
        ]

    in_specs = stream_specs() + [
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec((1, p2), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [xv, xv, xv, w2, bias]
    has_res = residual is not None
    if has_res:
        rv = residual.reshape(bsz, t * g2, wide).astype(hf.dtype)
        in_specs.extend(stream_specs())
        args.extend([rv, rv, rv])

    kern = functools.partial(_tail_kernel, tile_t=tile_t, g2=g2, p2=p2,
                             wide=wide, n_t=n_t, has_res=has_res)
    out = pl.pallas_call(
        lambda *refs: kern(refs),
        grid=(bsz, n_t),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile_t * g2, p2), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, t * g2, p2), hf.dtype),
        scratch_shapes=[pltpu.VMEM(((tile_t + 4) * g2, wide), hf.dtype)],
    )(*args)
    return out.reshape(bsz, t, f * c_out)
