"""Pallas TPU kernel: fused 3×3 SAME conv over flat-packed [T, F·C]
activations — period-generalized, auto-pipelined (round-2 redesign).

Why this exists (measured on a v5e chip, see BASELINE.md): XLA stores NHWC
activations with the channel dim on the 128-lane minor axis, so the
reference model's narrow stages (C = 32/64/96) are lane-padded 4×/2×/1.3× —
every byte of HBM traffic and every MXU pass pays the padding. This kernel
keeps activations in an UNPADDED flat layout [T, F·C] and computes the conv
as a handful of MXU matmuls per tile.

Design (v2 — replaces the round-1 im2col/manual-DMA kernel):

- The flat row [F·C] is periodic in the lane-to-(f, c) mapping with period
  P = lcm(C, 128), so x is *viewed* (free reshape) as [T·G, P] rows, where
  G = F·C/P rows per time step. Every conv tap (dt ∈ {0,1,2} time offset ×
  dq ∈ {−1,0,+1} period offset; sub-period f-offsets live inside the
  packed weights) is then a STATIC row-offset slice of a halo-extended
  VMEM scratch buffer followed by one matmul — no im2col materialization,
  no shift-matrix matmuls. At P > 128 the dq = ±1 taps hold only one
  C-wide band, so they read a 128-lane aligned slice against slim
  [128, P] blocks (the "slim" format, `_tap_format`) — the hot convs are
  MXU-bound, and slim cuts 9 P-sized passes to 3 + 6·(128/P).
- Blocks are delivered by Pallas' pipelined BlockSpecs (main tile + one
  2-time-row halo block on each side), so HBM→VMEM copies are
  double-buffered with compute automatically; the round-1 kernel serialized
  manual DMAs against the matmuls.
- f-boundary zero padding: rows whose period index is first/last are masked
  in the dq = ∓1 taps; t-boundary padding: edge halos are zeroed.
- fusions: a per-lane affine prologue (+ optional SiLU) applies GroupNorm
  (from precomputed stats) to the conv input *including halos* — boundary
  zero-rows stay zero, matching the reference's pad-after-norm semantics —
  and the epilogue adds a per-batch vector (bias or timestep embedding)
  and/or SiLU before the output store. Optionally the per-lane (sum, sum²)
  of the fp32 output is accumulated across the T grid — the next
  GroupNorm's statistics for free.

All six audio.yml stage widths are covered: C ∈ {32, 64, 128} at P = 128
(MXU work C/128-dense), C ∈ {96, 192} at P = 384, C = 256 at P = 256.

Reference behavior accelerated: the stride-1 convs of Residual_Block
(reference models/diffusion.py:28-40); numerics identical to
lax.conv_general_dilated at fp32 (tested in tests/test_pallas_conv.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def flat_period(c: int) -> int:
    """Lane period of the flat layout for channel width c."""
    return math.lcm(c, LANES)


def supports_flat(c: int, f: int, hw: bool = True) -> bool:
    # With hw=True (dispatch): the halo BlockSpecs are (1, 2·G, P) and
    # Mosaic requires the sublane block dim divisible by 8, so G = F·C/P
    # must be a multiple of 4 (true for all audio.yml stages; tiny test
    # geometries fall back to XLA). hw=False checks only the tiling math
    # (interpret-mode kernel tests).
    p = flat_period(c)
    return (f * c) % p == 0 and (not hw or ((f * c) // p) % 4 == 0)


def supports_flat_int8(c: int, f: int, hw: bool = True) -> bool:
    # int8 HBM arrays tile at (32, 128): the 2·G-sublane halo blocks must be
    # 32-row aligned, so G % 16 == 0. True for the four widest-traffic
    # audio.yml stages (C=32/64/96/128 → G = 64/64/16/32); the two deepest
    # (C=192/256 → G = 8) carry <2% of the forward's bytes and stay bf16.
    g = (f * c) // flat_period(c)
    return supports_flat(c, f, hw=hw) and (not hw or g % 16 == 0)


def _tap_format(fpp: int, p: int, mxu: bool = False) -> str:
    """Tap-block format for a conv geometry:

    "9"    — [9·P, P] blocks, one per (dt, dg) period-row offset (`_pack9`).
             fpp == 1 (C ∈ {128, 256}; the 3×3 f-window maps 1:1 onto the 3
             row offsets — optimal).
    "slim" — fpp ≥ 2 with LS < P, LS = 128·ceil(C/128): [3·P + 6·LS, P].
             The dg = ±1 blocks of the 9-format hold exactly ONE C-wide
             band each (the period-boundary f-offsets o = −1 / o = fpp),
             so instead of two full [P, P] matmuls per dt the kernel reads
             a 128-lane-aligned LS-wide slice of the neighbour row and
             multiplies a slim [LS, P] block: 3 + 6·(LS/P) P-equivalent
             MXU passes instead of 9 (C=96/P=384: 5; C=192/P=384: 7).
             At P == 128 a slim block IS full width, so "9" is used.

    The round-2 [6·P, P] lane-rotated 2-view format was removed: with the
    overhead-free timing protocol (benchmarks/timing.py) its two in-kernel
    roll+select view constructions measure SLOWER than the 3 extra 9-tap
    matmuls it saved (fp32 s0 conv 1.88 ms rolled vs ~1.5 ms 9-tap bare;
    the round-2 numbers that justified it carried ~1.4 ms/op of tunnel
    call overhead)."""
    del mxu  # int8 taps use the same format as float since round 4 (the
    # slim branch accumulates int32 off the requant buffer directly; at
    # C = 96 that halves the 5 P-equivalent passes — "9" int8 did 9/2 =
    # 4.5, no better than slim bf16's 5, which is why int8 lost there
    # until now)
    if fpp == 1:
        return "9"
    return "slim" if _slim_width(p // fpp) < p else "9"


def _slim_width(c: int) -> int:
    """Lane width of a slim carry block: the C-wide boundary band rounded
    up to whole 128-lane slices."""
    return -(-c // LANES) * LANES


def pack_conv_weights(w, dtype=jnp.float32) -> jax.Array:
    """w [3, 3, C, C] (HWIO) → packed MXU tap blocks, P = lcm(C, 128),
    in the `_tap_format` layout for the geometry (same for every float
    storage dtype; int8 taps pack via `pack_conv_weights_int8`).

    Slim layout ([3·P + 6·LS, P], LS = `_slim_width(C)`):
        rows [dt·P, (dt+1)·P): in-row taps, o = fo + df − 1 ∈ [0, fpp):
            W2[dt·P + o·C + ci, fo·C + co] = w[dt, df, ci, co]
        rows 3P + dt·LS …: the o = −1 carry (only (fo=0, df=0); source is
            the PREVIOUS period row's last C lanes, read through the
            aligned lane slice [P−LS, P)): rows [LS−C, LS), cols [0, C)
        rows 3P + 3LS + dt·LS …: the o = fpp carry ((fo=fpp−1, df=2); next
            row's first C lanes via slice [0, LS)): rows [0, C),
            cols [(fpp−1)·C, P)"""
    kh, kw, c, co = w.shape
    assert kh == 3 and kw == 3 and c == co
    p = flat_period(c)
    fpp = p // c
    if _tap_format(fpp, p) == "9":
        return _pack9(w).astype(dtype)
    return _pack_slim(w).astype(dtype)


def _pack_slim(w) -> jax.Array:
    """The slim-layout packing loop (fp32), shared by the float and int8
    packers. jnp (traceable) so packing can run inside jit on live params;
    a handful of static-index block adds, hoisted out of sampler scan
    loops. Every (dt, df, fo) entry lands in a distinct cell (o uniquely
    determines df given fo), so the adds never collide — int8-valued
    inputs survive the cast back."""
    kh, kw, c, _ = w.shape
    p = flat_period(c)
    fpp = p // c
    ls = _slim_width(c)
    w2 = jnp.zeros((3 * p + 6 * ls, p), jnp.float32)
    for dt in range(3):
        for df in range(3):
            for fo in range(fpp):
                o = fo + df - 1
                wv = w[dt, df].astype(jnp.float32)
                cols = slice(fo * c, (fo + 1) * c)
                if 0 <= o < fpp:
                    w2 = w2.at[dt * p + o * c : dt * p + (o + 1) * c,
                               cols].add(wv)
                elif o == -1:
                    r0 = 3 * p + dt * ls + (ls - c)
                    w2 = w2.at[r0 : r0 + c, cols].add(wv)
                else:  # o == fpp
                    r0 = 3 * p + 3 * ls + dt * ls
                    w2 = w2.at[r0 : r0 + c, cols].add(wv)
    return w2


def tap_int8_profitable(c: int) -> bool:
    """Widths where int8 × int8 → int32 taps beat the float tap scheme
    (measured with the overhead-free two-length protocol,
    benchmarks/bench_kernel_matrix): the fused conv at C=32/64 runs
    1.80→1.69 / 0.82→0.73 ms at sampling scale — the lane-padded 9-tap
    matmuls are the binding cost there and int8 halves their MXU time.
    C = 96 joins in round 4: int8 through the SLIM format (the 9-format
    int8 path lost there, 0.413 vs slim-bf16's 0.380 ms, because 9/2 =
    4.5 P-equivalent passes is no better than slim's 5; slim int8 does
    5/2 = 2.5 and measures 0.287 ms). C ≥ 128 (fpp = 1, unpadded) still
    loses (0.046→0.043 noise at C=128, worse at 192/256 — the per-tile
    requant pass exceeds the MXU saving on those small ops)."""
    return c <= 96


def pack_conv_weights_int8(w):
    """w [3, 3, C, C] (HWIO) → (int8 [9·P, P] tap blocks, fp32 [P] per-lane
    dequant scales). Symmetric per-output-channel quantization: output lane
    fo·C + co dequantizes with s_w[co] (periodic over P), so the scale rides
    the kernel's per-lane epilogue multiply. Used by the mxu_int8 conv path
    (int8 × int8 → int32 taps run the MXU at 2× the bf16 rate — measured
    0.82 vs 1.39 ms for the bare s0 conv; ~8% on the full fused chain,
    which is VPU-bound — see conv3x3_flat)."""
    kh, kw, c, co = w.shape
    assert kh == 3 and kw == 3 and c == co
    p = flat_period(c)
    w32 = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=(0, 1, 2))  # [C] per output channel
    s_w = jnp.maximum(amax, 1e-30) / 127.0
    wq = jnp.clip(jnp.round(w32 / s_w[None, None, None, :]), -127.0, 127.0)
    if _tap_format(p // c, p, mxu=True) == "slim":
        w2 = _pack_slim(wq).astype(jnp.int8)
    else:
        w2 = _pack9(wq).astype(jnp.int8)
    return w2, jnp.tile(s_w, p // c)


def _pack9(w) -> jax.Array:
    """The fpp == 1 / gradient-accumulator format: [9·P, P] blocks for taps
    (dt, dg) ∈ 3×3 period-row offsets:
        o = fo + df − 1, dg = 1 + floor(o / fpp), fi = o mod fpp
        W2[(dt·3+dg)·P + fi·C + ci, fo·C + co] = w[dt, df, ci, co].
    `flat_grad.conv_dw_flat` always emits this format (its 9 row-shifted
    tap contractions need no lane rotation); its VJP unpacks to HWIO."""
    kh, kw, c, co = w.shape
    assert kh == 3 and kw == 3 and c == co
    p = flat_period(c)
    fpp = p // c
    w2 = jnp.zeros((9 * p, p), jnp.float32)
    for dt in range(3):
        for df in range(3):
            for fo in range(fpp):
                o = fo + df - 1
                dg = 1 + (o // fpp if o >= 0 else -1)
                fi = o % fpp
                j = dt * 3 + dg
                w2 = w2.at[
                    j * p + fi * c : j * p + (fi + 1) * c,
                    fo * c : (fo + 1) * c,
                ].add(w[dt, df].astype(jnp.float32))
    return w2


def _conv_kernel(refs, *, tile_t, g, p, fpp, fmt, n_t, has_res, has_pre,
                 pre_periodic, pre_silu, has_add, add_periodic, post_silu,
                 want_stats, in_q, res_q, quant_out, mxu_i8):
    it = iter(refs)
    x_ref = next(it)
    top_ref = next(it)
    bot_ref = next(it)
    # per-(tile, lane) dequant scales of the int8 input: three pipelined
    # (1, 1, P) scale-row blocks (cur / prev / next) matching the main and
    # halo data blocks — the 2-time-row halo pieces always lie inside ONE
    # neighbour tile (tile_t is even), so each assembly piece dequantizes
    # with its tile's [P] scale row broadcast over rows
    in_s = (next(it), next(it), next(it)) if in_q else None
    w_ref = next(it)
    # per-lane fp32 dequant scales of the int8 tap weights (mxu_int8)
    wsc_ref = next(it) if mxu_i8 else None
    if has_res:
        rm_ref, rt_ref, rb_ref = next(it), next(it), next(it)
    res_s = (next(it), next(it), next(it)) if res_q else None
    pre_ref = next(it) if has_pre else None
    add_ref = next(it) if has_add else None
    out_ref = next(it)
    out_s_ref = next(it) if quant_out else None
    stats_ref = next(it) if want_stats else None
    scratch = next(it)
    # mxu_i8 taps read int8: the unmasked requant buffer lives separately
    # from the (bf16) staging scratch
    mid_q = next(it) if mxu_i8 else None

    i = pl.program_id(1)
    m = tile_t * g
    h = 2 * g  # halo rows per side (2 time rows — covers shifts up to g+1)

    # [rows, g] indicator of each row's period index — used to expand
    # per-period [g, p] vectors over rows and to reduce rows back to [g, p],
    # both as tiny MXU matmuls (no 3-D reshapes in-kernel).
    def expander(rows):
        gi = jax.lax.broadcasted_iota(jnp.int32, (rows, g), 0) % g
        gj = jax.lax.broadcasted_iota(jnp.int32, (rows, g), 1)
        return (gi == gj).astype(jnp.float32)

    # Assemble the halo-extended input [h + m + h, p]: the optional
    # skip-connection residual sum AND the prologue (GroupNorm affine +
    # SiLU) fuse into the piece-wise stores — no separate full-scratch
    # read-modify-write pass. (Each piece starts at a multiple of g, so the
    # piece-local expander is period-aligned.) T-boundary halos are zeroed
    # after (the reference pads AFTER norm/SiLU, so pad rows are zero
    # post-prologue).
    def prep(v, res_v, s_in=None, s_res=None):
        if in_q:
            v = v.astype(jnp.float32) * s_in  # dequant folds into the pass
        if res_v is not None:
            if res_q:
                res_v = res_v.astype(jnp.float32) * s_res
            v = v + res_v
        if not (has_pre or pre_silu):
            # always land in the staging dtype (fp32 for mxu_i8; a no-op
            # cast when the scratch matches the stream dtype)
            return v.astype(scratch.dtype)
        x32 = v.astype(jnp.float32)
        if has_pre and pre_periodic:
            # period-invariant [P] affine: plain broadcast, no expander
            x32 = x32 * pre_ref[0, 0] + pre_ref[0, 1]
        elif has_pre:
            exp_z = expander(v.shape[0])
            x32 = x32 * jnp.dot(exp_z, pre_ref[0, 0],
                                preferred_element_type=jnp.float32)
            x32 = x32 + jnp.dot(exp_z, pre_ref[0, 1],
                                preferred_element_type=jnp.float32)
        if pre_silu:
            x32 = jax.nn.silu(x32)
        return x32.astype(scratch.dtype)

    # piece k = 1 is the main tile (cur scales = slot 0); k = 0/2 are the
    # top/bottom halos (prev/next scale rows = slots 1/2)
    pieces = (
        (0, h, top_ref, rt_ref if has_res else None, 1),
        (h, m, x_ref, rm_ref if has_res else None, 0),
        (h + m, h, bot_ref, rb_ref if has_res else None, 2),
    )

    def piece_prep(ref, res, k):
        # scale blocks are (1, 1, 8, P) sublane stripes (Mosaic needs the
        # last two block dims (8, 128)-aligned); all 8 rows are identical —
        # row 0 broadcasts over the piece's rows
        return prep(
            ref[0],
            res[0] if res is not None else None,
            in_s[k][0, 0][0:1] if in_q else None,
            res_s[k][0, 0][0:1] if res_q else None,
        )

    # Assembly: ONE unmasked staging store per piece. The f-boundary masks
    # are applied POST-MATMUL: a tap's matmul maps input row r+δ to output
    # row r one-to-one, so zeroing boundary input rows ≡ zeroing the tap
    # result's rows where the SOURCE row index is a period first/last —
    # which saves the two full-tile masked staging buffers (2 extra VMEM
    # stores + reads + where/iota passes per tile) the round-2 kernel
    # materialized.
    if mxu_i8:
        # mxu_i8 stages the prologue output unmasked in bf16 (the int8
        # requant below dwarfs bf16 rounding) with the tile amax
        # accumulated from the registers DURING assembly — no separate
        # amax read pass.
        am = jnp.zeros((), jnp.float32)
        for r0, n, ref, res, k in pieces:
            v = piece_prep(ref, res, k)
            scratch[r0 : r0 + n, :] = v
            am = jnp.maximum(am, jnp.max(jnp.abs(v.astype(jnp.float32))))
    else:
        for r0, n, ref, res, k in pieces:
            scratch[r0 : r0 + n, :] = piece_prep(ref, res, k)

    @pl.when(i == 0)
    def _():
        scratch[0:h, :] = jnp.zeros((h, p), scratch.dtype)

    @pl.when(i == n_t - 1)
    def _():
        scratch[h + m :, :] = jnp.zeros((h, p), scratch.dtype)

    if mxu_i8:
        # Requantize the staged prologue output to a single per-tile
        # symmetric int8 scale (halo rows included — every tap operand must
        # share the scale for the int32 accumulate to be rescalable). The
        # taps then run int8 × int8 → int32 on the MXU at 2× the bf16 rate.
        # (am was accumulated over the pre-zeroed t-edge halos too — a
        # possibly-looser scale there, never a wrong value.)
        amax_t = jnp.maximum(am, 1e-30)
        s_q = amax_t * (1.0 / 127.0)
        v = scratch[:, :].astype(jnp.float32)
        mid_q[:, :] = jnp.clip(jnp.round(v * (127.0 / amax_t)),
                               -127.0, 127.0).astype(jnp.int8)

    acc = (jnp.zeros((m, p), jnp.int32) if mxu_i8
           else jnp.zeros((m, p), jnp.float32))
    if fmt == "slim":
        # Slim-carry scheme (see pack_conv_weights / _tap_format): the
        # in-row taps are 3 dense [P, P] matmuls (no f-boundary exposure —
        # every o ∈ [0, fpp) stays inside its period row, so no masks);
        # the two period-boundary f-offsets read a 128-lane-ALIGNED
        # LS-wide slice of the neighbour row against slim [LS, P] blocks.
        # The f-boundary zeros land post-matmul exactly as in the 9-tap
        # path: the o = −1 carry is invalid iff the output row is a
        # period's first, o = fpp iff it is a period's last.
        ls = _slim_width(p // fpp)
        acc_t = jnp.int32 if mxu_i8 else jnp.float32
        src = mid_q if mxu_i8 else scratch
        for dt in range(3):
            delta = (dt - 1) * g
            acc = acc + jnp.dot(
                src[h + delta : h + delta + m, :],
                w_ref[dt * p : (dt + 1) * p, :],
                preferred_element_type=acc_t,
            )
        lo = jnp.zeros((m, p), acc_t)
        hi = jnp.zeros((m, p), acc_t)
        for dt in range(3):
            delta = (dt - 1) * g
            lo = lo + jnp.dot(
                src[h + delta - 1 : h + delta - 1 + m, p - ls :],
                w_ref[3 * p + dt * ls : 3 * p + (dt + 1) * ls, :],
                preferred_element_type=acc_t,
            )
            hi = hi + jnp.dot(
                src[h + delta + 1 : h + delta + 1 + m, 0:ls],
                w_ref[3 * p + (3 + dt) * ls : 3 * p + (4 + dt) * ls, :],
                preferred_element_type=acc_t,
            )
        ri = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0) % g
        zf = jnp.zeros((), acc_t)
        acc = (acc + jnp.where(ri == 0, zf, lo)
               + jnp.where(ri == g - 1, zf, hi))
    else:
        # 9-tap path (fpp == 1 and the P == 128 geometries — see
        # _tap_format). All taps read the single unmasked staging
        # buffer; the f-boundary zeros land post-matmul: the dg=0 taps read
        # source row r−1, which is a period's LAST row exactly when the
        # OUTPUT row r is a period's first (the dt offset is a multiple of
        # g), so where-masking the tap result's first-period rows is
        # identical — likewise dg=2 masks last-period rows. mxu_i8 reads
        # the int8 requant buffer and accumulates in int32.
        acc_t = jnp.int32 if mxu_i8 else jnp.float32
        mid = mid_q if mxu_i8 else scratch
        ri = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0) % g
        masks = (ri == 0, None, ri == g - 1)
        zero_acc = jnp.zeros((), acc_t)
        for dg in range(3):
            part = jnp.zeros((m, p), acc_t)
            for dt in range(3):
                delta = (dt - 1) * g + (dg - 1)
                rows = mid[h + delta : h + delta + m, :]
                j = dt * 3 + dg
                part = part + jnp.dot(
                    rows, w_ref[j * p : (j + 1) * p, :],
                    preferred_element_type=acc_t,
                )
            if masks[dg] is not None:
                part = jnp.where(masks[dg], zero_acc, part)
            acc = acc + part

    if mxu_i8:
        # int32 → fp32 with the combined activation-tile × per-lane weight
        # scale; every downstream epilogue fusion (add, SiLU, stats,
        # quant_out) then runs on real-valued outputs as usual.
        out = acc.astype(jnp.float32) * (s_q * wsc_ref[0])
    else:
        out = acc
    if add_ref is not None and add_periodic:
        out = out + add_ref[0]  # [1, p] broadcast over rows
    elif add_ref is not None:
        out = out + jnp.dot(expander(m), add_ref[0],
                            preferred_element_type=jnp.float32)
    if post_silu:
        out = jax.nn.silu(out)
    if quant_out:
        # symmetric per-(tile, lane) int8: scale rows [P] = amax/127 per
        # lane, published for the consumer's dequant prologue (its halo
        # pieces read the neighbour tiles' scale rows). Per-lane beats a
        # per-tile scalar by ~10 dB end-to-end: the residual-stream
        # channels have very different ranges. Stats below stay pre-quant
        # fp32 — the folded GN affine is insensitive at quant-noise level.
        amax = jnp.maximum(jnp.max(jnp.abs(out), axis=0, keepdims=True),
                           1e-30)  # [1, P]
        out_s_ref[0, 0] = jnp.broadcast_to(amax * (1.0 / 127.0), (8, p))
        out_ref[0] = jnp.clip(
            jnp.round(out * (127.0 / amax)), -127.0, 127.0
        ).astype(jnp.int8)
    else:
        out_ref[0] = out.astype(out_ref.dtype)

    if stats_ref is not None:
        # per-lane sum / sum² of the fp32 output over the rows of this
        # tile's periods, accumulated across the T grid (the stats block
        # index_map revisits (b, 0, 0, 0), so it lives in VMEM for the
        # whole b-row of the grid)
        @pl.when(i == 0)
        def _():
            stats_ref[0] = jnp.zeros((2, g, p), jnp.float32)

        gi = jax.lax.broadcasted_iota(jnp.int32, (g, m), 0)
        gj = jax.lax.broadcasted_iota(jnp.int32, (g, m), 1) % g
        reducer = (gi == gj).astype(jnp.float32)  # [g, m]
        s1 = jnp.dot(reducer, out, preferred_element_type=jnp.float32)
        s2 = jnp.dot(reducer, out * out, preferred_element_type=jnp.float32)
        stats_ref[0, 0] = stats_ref[0, 0] + s1
        stats_ref[0, 1] = stats_ref[0, 1] + s2


def _res_affine_kernel(refs, *, g, p, n_t, x_q, s_q, has_aff, quant_out,
                       want_stats):
    it = iter(refs)
    x_ref = next(it)
    xs_ref = next(it) if x_q else None
    s_ref = next(it)
    ss_ref = next(it) if s_q else None
    aff_ref = next(it) if has_aff else None
    out_ref = next(it)
    out_s_ref = next(it) if quant_out else None
    stats_ref = next(it) if want_stats else None

    i = pl.program_id(1)
    p = x_ref.shape[-1]
    v = x_ref[0].astype(jnp.float32)
    if x_q:
        v = v * xs_ref[0, 0][0:1]
    sv = s_ref[0].astype(jnp.float32)
    if s_q:
        sv = sv * ss_ref[0, 0][0:1]
    if has_aff:
        out = v + sv * aff_ref[0, 0] + aff_ref[0, 1]
    else:
        out = v + sv

    if quant_out:
        amax = jnp.maximum(jnp.max(jnp.abs(out), axis=0, keepdims=True),
                           1e-30)  # [1, P]
        out_s_ref[0, 0] = jnp.broadcast_to(amax * (1.0 / 127.0), (8, p))
        out_ref[0] = jnp.clip(
            jnp.round(out * (127.0 / amax)), -127.0, 127.0
        ).astype(jnp.int8)
    else:
        out_ref[0] = out.astype(out_ref.dtype)

    if stats_ref is not None:
        @pl.when(i == 0)
        def _():
            stats_ref[0] = jnp.zeros((2, g, p), jnp.float32)

        m = out.shape[0]
        gi = jax.lax.broadcasted_iota(jnp.int32, (g, m), 0)
        gj = jax.lax.broadcasted_iota(jnp.int32, (g, m), 1) % g
        reducer = (gi == gj).astype(jnp.float32)
        stats_ref[0, 0] = stats_ref[0, 0] + jnp.dot(
            reducer, out, preferred_element_type=jnp.float32)
        stats_ref[0, 1] = stats_ref[0, 1] + jnp.dot(
            reducer, out * out, preferred_element_type=jnp.float32)


def residual_affine_flat(x, s, affine=None, *, c: int, f: int,
                         x_scales=None, s_scales=None,
                         quant_out: bool = False, want_stats: bool = False,
                         out_dtype=None, tile_t: int | None = None):
    """Fused elementwise resblock tail over the [B, T·G, P] row view:

        out = deq(x) + deq(s) · scale + shift

    — the reference residual block's ``input + GN3(h)`` (zero-init GN3,
    reference models/diffusion.py:25-26,56) as ONE Pallas pass with int8
    storage on any operand. In the int8 activation-storage regime this is
    the pass that the XLA tail add cannot do: per-tile symmetric dequant of
    both streams, per-lane periodic affine, optional per-tile requant of the
    result (quant_out → (int8 out, [B, n_t] scales)), and the next
    GroupNorm's (sum, sum²) accumulated on the pre-quant fp32 values.

    x, s: [B, T·G, P] rows (int8 with the matching per-(tile, lane) scale
    stripes [B, n_t, 8, P], or a float dtype). affine: (scale, shift)
    per-lane periodic [B, P] fp32 — GN3 folded onto s. All int8 scale rows
    must share one tile grid (the stage passes one tile_t through its whole
    kernel chain)."""
    bsz, rows, p = x.shape
    g = (f * c) // flat_period(c)
    if p != flat_period(c) or rows % g:
        raise ValueError(f"rows view [{rows}, {p}] does not match c={c}, f={f}")
    t = rows // g
    x_q = x.dtype == jnp.dtype(jnp.int8)
    s_q = s.dtype == jnp.dtype(jnp.int8)
    if x_q and x_scales is None:
        raise ValueError("int8 x requires x_scales [B, n_tiles]")
    if s_q and s_scales is None:
        raise ValueError("int8 s requires s_scales [B, n_tiles]")
    for sc in (x_scales if x_q else None, s_scales if s_q else None):
        if sc is not None:
            if sc.ndim != 4 or sc.shape[2] != 8 or sc.shape[3] != p:
                raise ValueError(
                    f"scales must be [B, n_t, 8, {p}] stripes, got {sc.shape}")
            if t % sc.shape[1]:
                raise ValueError(
                    f"T={t} not divisible by n_tiles={sc.shape[1]}")
            tt = t // sc.shape[1]
            if tile_t is not None and tile_t != tt:
                raise ValueError(
                    f"tile_t={tile_t} inconsistent with scales grid {tt}")
            tile_t = tt
    if tile_t is None:
        tile_t = _pick_tile_t(t, g, p, 2)
    if t % tile_t:
        raise ValueError(f"T={t} not tileable by tile_t={tile_t}")
    n_t = t // tile_t

    if out_dtype is None:
        out_dtype = s.dtype if not s_q else (x.dtype if not x_q else jnp.bfloat16)
    out_dtype = jnp.dtype(jnp.int8) if quant_out else jnp.dtype(out_dtype)

    scale_spec = pl.BlockSpec((1, 1, 8, p), lambda b, i: (b, i, 0, 0),
                              memory_space=pltpu.VMEM)
    tile_spec = pl.BlockSpec((1, tile_t * g, p), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM)
    in_specs, args = [tile_spec], [x]
    if x_q:
        in_specs.append(scale_spec)
        args.append(jnp.asarray(x_scales, jnp.float32))
    in_specs.append(tile_spec)
    args.append(s)
    if s_q:
        in_specs.append(scale_spec)
        args.append(jnp.asarray(s_scales, jnp.float32))
    has_aff = affine is not None
    if has_aff:
        sc, sh = affine
        aff = jnp.stack([jnp.asarray(sc, jnp.float32),
                         jnp.asarray(sh, jnp.float32)], axis=1)
        aff = aff.reshape(bsz, 2, 1, p)
        in_specs.append(pl.BlockSpec((1, 2, 1, p), lambda b, i: (b, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(aff)

    out_specs = [tile_spec]
    out_shape = [jax.ShapeDtypeStruct((bsz, rows, p), out_dtype)]
    if quant_out:
        out_specs.append(scale_spec)
        out_shape.append(
            jax.ShapeDtypeStruct((bsz, n_t, 8, p), jnp.float32))
    if want_stats:
        out_specs.append(pl.BlockSpec((1, 2, g, p), lambda b, i: (b, 0, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((bsz, 2, g, p), jnp.float32))

    kern = functools.partial(
        _res_affine_kernel, g=g, p=p, n_t=n_t, x_q=x_q, s_q=s_q,
        has_aff=has_aff, quant_out=quant_out, want_stats=want_stats,
    )
    result = pl.pallas_call(
        lambda *refs: kern(refs),
        grid=(bsz, n_t),
        in_specs=in_specs,
        out_specs=tuple(out_specs) if len(out_specs) > 1 else out_specs[0],
        out_shape=tuple(out_shape) if len(out_shape) > 1 else out_shape[0],
    )(*args)
    if not isinstance(result, (tuple, list)):
        result = (result,)
    out = result[0]
    rest = []
    if quant_out:
        rest.append(result[1])
    if want_stats:
        stats = result[-1]
        rest.extend([stats[:, 0].sum(axis=1), stats[:, 1].sum(axis=1)])
    return (out, *rest) if rest else out


def _pick_tile_t(t: int, g: int, p: int, itemsize: int, tile_t=None, *,
                 m_cap: int | None = None, b_cap: int | None = None) -> int:
    """Largest even tile_t dividing t with block bytes ≲ b_cap and M ≲ m_cap
    (the nine tap operands can live simultaneously on the Mosaic stack, so
    block size bounds scoped-VMEM pressure). 16-bit storage halves the
    bytes, so both default caps double (measured: bf16 s0 conv 1.57 →
    1.43 ms at tile_t 64; tile_t 128 exceeds VMEM). The strided kernels
    pass their own tighter caps."""
    if m_cap is None:
        m_cap = 2048 if itemsize >= 4 else 4096
    if b_cap is None:
        b_cap = (1 << 19) if itemsize >= 4 else (1 << 20)
    if tile_t is None:
        tile_t = 2
        while (
            tile_t * 2 <= t
            and t % (tile_t * 2) == 0
            and (tile_t * 2) * g <= m_cap
            and (tile_t * 2) * g * p * itemsize <= b_cap
        ):
            tile_t *= 2
    while t % tile_t and tile_t > 1:
        tile_t //= 2
    if tile_t % 2 and t % (2 * tile_t) == 0:
        tile_t *= 2  # halo block index arithmetic needs an even tile
    return tile_t


def conv3x3_flat(x, w2, bias_flat=None, *, c: int, tile_t: int | None = None,
                 residual=None, pre=None, pre_silu: bool = False, add=None,
                 post_silu: bool = False, want_stats: bool = False,
                 f: int | None = None, rows_view: bool = False,
                 in_scales=None, res_scales=None, quant_out: bool = False,
                 mxu_int8: bool = False, w_scale=None,
                 compute_dtype=jnp.bfloat16):
    """Fused flat conv. x: [B, T, F·C]; w2: packed [9·P, P] weights.

    residual: optional [B, T, F·C] tensor summed into the input during the
         in-kernel assembly (skip connections fused into the conv that
         consumes them — costs one stream-in, no materialized sum).
    pre: optional (scale, shift) fp32, each [F·C] or [B, F·C] — per-lane
         affine applied to the input (GroupNorm folded to scale/shift),
         before pre_silu.
    add: optional [F·C] or [B, F·C] fp32 added to the conv output (bias or
         per-sample timestep embedding), before post_silu.
    bias_flat: shorthand for add= (kept for the plain-conv call sites).
    want_stats: also return (sum, sum²) of the fp32 output over T per flat
         lane — the next GroupNorm's statistics for free (saves a full HBM
         pass per fused resblock stage). Returns (out, s1 [B, F·C],
         s2 [B, F·C]) instead of just out.
    rows_view: x (and residual) are the kernel's own [B, T·G, P] row view
         and the result/stats stay in it (stats as [B, P] period-folded
         sums). Requires f=. Chained kernels should use this: XLA
         materializes the [B, T, F·C] ↔ [B, T·G, P] reshapes around custom
         calls whenever B > 1 (trace-measured — 39 ms of reshape copies in
         a batch-2 forward).

    int8 activation storage (HBM traffic is the binding roofline —
    BASELINE.md): when x is int8, in_scales [B, n_tiles, 8, P] fp32 holds
    the per-(tile, lane) symmetric quant scales (8 identical sublane rows —
    one aligned fp32 HBM tile each, ~0.8% of the int8 payload) published by
    the producing kernel's quant_out; the consumer's tile grid is forced to
    match (tile_t = T / n_tiles) so each assembly piece dequantizes with
    its tile's scale ROW (halo pieces use the neighbour tiles' rows),
    folded into the existing prologue pass. res_scales does the same for an
    int8 residual stream. quant_out=True emits (int8 out, [B, n_t, 8, P]
    scales) from the per-(tile, lane) amax — per-lane scales beat a
    per-tile scalar by ~10 dB end-to-end since the residual-stream channels
    have very different ranges; conv math runs in compute_dtype (weights)
    with
    fp32 accumulation by default — int8 storage alone doesn't change the
    arithmetic (requires 16 | G on real TPUs: int8 HBM tiles are 32×128
    and the halo blocks are 2·G rows — see supports_flat_int8).

    mxu_int8=True additionally runs the TAPS in int8: the bf16-staged
    prologue output is requantized per tile (symmetric, halos included so
    all tap operands share the scale; the tile amax is accumulated in
    registers during assembly), and the nine taps run int8 × int8 → int32
    on the MXU at 2× the bf16 rate. Measured at s0 full-chain: ~8% over
    the bf16-tap int8-storage kernel — the fused kernel is VPU-bound
    (assembly + requant), so the MXU saving is mostly hidden; kept as an
    opt-in for the compute-bound deep stages. Requires int8 packed weights
    + per-lane w_scale from pack_conv_weights_int8; the int32 accumulator
    rescales by s_tile · w_scale[lane] before the add/SiLU/stats/quant_out
    epilogue."""
    p = flat_period(c)
    if rows_view:
        if f is None:
            raise ValueError("rows_view=True requires f=")
        bsz, rows, p_in = x.shape
        if p_in != p:
            raise ValueError(f"rows view lane dim {p_in} != period {p}")
        fc = f * c
        g = fc // p
        t = rows // g
    else:
        bsz, t, fc = x.shape
        g = fc // p
    if fc % p:
        raise ValueError(f"F·C={fc} is not a multiple of the period {p} (C={c})")
    in_q = x.dtype == jnp.dtype(jnp.int8)
    res_q = residual is not None and residual.dtype == jnp.dtype(jnp.int8)
    if in_q:
        if in_scales is None:
            raise ValueError("int8 x requires in_scales [B, n_tiles]")
        if t % in_scales.shape[1]:
            raise ValueError(
                f"T={t} not divisible by n_tiles={in_scales.shape[1]}")
        tile_t = t // in_scales.shape[1]  # grid must match the producer's
    if res_q and res_scales is None:
        raise ValueError("int8 residual requires res_scales [B, n_tiles]")
    sdtype = jnp.dtype(compute_dtype) if (in_q or res_q) else x.dtype
    if mxu_int8:
        # int8 MXU arithmetic: bf16 prologue staging, per-tile requant,
        # int8 tap buffers; the bf16 tile caps balance VMEM pressure.
        if w_scale is None:
            raise ValueError("mxu_int8 requires w_scale [P] "
                             "(pack_conv_weights_int8)")
        if w2.dtype != jnp.dtype(jnp.int8):
            raise ValueError("mxu_int8 requires int8 packed weights")
    fmt = _tap_format(p // c, p, mxu_int8)
    stage_dt = jnp.dtype(jnp.bfloat16) if mxu_int8 else sdtype
    want_rows = 3 * p + 6 * _slim_width(c) if fmt == "slim" else 9 * p
    if w2.shape[0] != want_rows:
        raise ValueError(
            f"packed weight rows {w2.shape[0]} != {want_rows} ({fmt} format)"
            f" — pack with pack_conv_weights(w, {sdtype})")
    tile_t = _pick_tile_t(t, g, p, 2 if mxu_int8 else sdtype.itemsize, tile_t)
    if t % tile_t or tile_t % 2:
        raise ValueError(f"T={t} not tileable by even tile_t={tile_t}")
    n_t = t // tile_t
    if res_q and res_scales.shape[1] != n_t:
        raise ValueError(
            f"res_scales tiles {res_scales.shape[1]} != grid tiles {n_t}")
    ht = tile_t // 2  # halo block stride in 2-time-row units

    if add is None and bias_flat is not None:
        add = bias_flat
    has_pre = pre is not None
    has_add = add is not None

    # free: row-major split of the minor dim
    xv = x if rows_view else x.reshape(bsz, t * g, p)
    in_specs = [
        pl.BlockSpec((1, tile_t * g, p), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2 * g, p),
                     lambda b, i: (b, jnp.maximum(i * ht - 1, 0), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2 * g, p),
                     lambda b, i: (b, jnp.minimum((i + 1) * ht, t // 2 - 1), 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [xv, xv, xv]

    # per-(tile, lane) scale stripes [B, n_t, 8, P] (8 identical sublane
    # rows — one fp32 HBM tile each; Mosaic requires (8, 128)-aligned block
    # minors): three pipelined (1, 1, 8, P) blocks per quantized stream —
    # cur, prev, next — mirroring the main/halo data blocks; edge clamps
    # are harmless (the t-boundary halo pieces are zeroed after dequant)
    def _scale_specs():
        return [
            pl.BlockSpec((1, 1, 8, p), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, p),
                         lambda b, i: (b, jnp.maximum(i - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, p),
                         lambda b, i: (b, jnp.minimum(i + 1, n_t - 1), 0, 0),
                         memory_space=pltpu.VMEM),
        ]

    def _check_scales(sc, name):
        if sc.ndim != 4 or sc.shape[2] != 8 or sc.shape[3] != p:
            raise ValueError(
                f"{name} must be [B, n_t, 8, {p}] stripes, got {sc.shape}")

    if in_q:
        _check_scales(in_scales, "in_scales")
        in_specs.extend(_scale_specs())
        sarr = jnp.asarray(in_scales, jnp.float32)
        args.extend([sarr, sarr, sarr])
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # weights, resident
    args.append(w2)
    if mxu_int8:
        # per-lane weight dequant scales, resident [1, P] VMEM row
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(jnp.asarray(w_scale, jnp.float32)[None, :])

    has_res = residual is not None
    if has_res:
        rv = residual if rows_view else residual.reshape(bsz, t * g, p)
        if not res_q:
            rv = rv.astype(sdtype)
        in_specs.extend([
            pl.BlockSpec((1, tile_t * g, p), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * g, p),
                         lambda b, i: (b, jnp.maximum(i * ht - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * g, p),
                         lambda b, i: (b, jnp.minimum((i + 1) * ht,
                                                      t // 2 - 1), 0),
                         memory_space=pltpu.VMEM),
        ])
        args.extend([rv, rv, rv])
    if res_q:
        _check_scales(res_scales, "res_scales")
        in_specs.extend(_scale_specs())
        rarr = jnp.asarray(res_scales, jnp.float32)
        args.extend([rarr, rarr, rarr])

    pre_periodic = False
    if has_pre:
        # [FC]/[B, FC] per-lane, or the period-invariant [P]/[B, P] form
        # (per-channel affines repeat every period — no expander matmul)
        scale, shift = pre
        scale = jnp.asarray(scale, jnp.float32)
        shift = jnp.asarray(shift, jnp.float32)
        if scale.ndim == 1:
            scale, shift = scale[None], shift[None]
        pre_periodic = scale.shape[-1] == p
        gg = 1 if pre_periodic else g
        pre_arr = jnp.stack([scale, shift], axis=1).reshape(-1, 2, gg, p)
        pre_pb = pre_arr.shape[0] == bsz and bsz > 1
        pidx = ((lambda b, i: (b, 0, 0, 0)) if pre_pb
                else (lambda b, i: (0, 0, 0, 0)))
        in_specs.append(
            pl.BlockSpec((1, 2, gg, p), pidx, memory_space=pltpu.VMEM)
        )
        args.append(pre_arr)
    add_periodic = False
    if has_add:
        add = jnp.asarray(add, jnp.float32)
        if add.ndim == 1:
            add = add[None]
        add_periodic = add.shape[-1] == p
        ga = 1 if add_periodic else g
        per_batch = add.shape[0] == bsz and bsz > 1
        add = add.reshape(-1, ga, p)
        aidx = ((lambda b, i: (b, 0, 0)) if per_batch
                else (lambda b, i: (0, 0, 0)))
        in_specs.append(
            pl.BlockSpec((1, ga, p), aidx, memory_space=pltpu.VMEM)
        )
        args.append(add)

    kern = functools.partial(
        _conv_kernel, tile_t=tile_t, g=g, p=p, fpp=p // c,
        fmt=fmt, n_t=n_t,
        has_res=has_res, has_pre=has_pre, pre_periodic=pre_periodic,
        pre_silu=pre_silu, has_add=has_add, add_periodic=add_periodic,
        post_silu=post_silu, want_stats=want_stats,
        in_q=in_q, res_q=res_q, quant_out=quant_out, mxu_i8=mxu_int8,
    )

    out_dtype = jnp.int8 if quant_out else (sdtype if in_q else x.dtype)
    out_specs = [pl.BlockSpec(
        (1, tile_t * g, p), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )]
    out_shape = [jax.ShapeDtypeStruct((bsz, t * g, p), out_dtype)]
    if quant_out:
        # per-grid-step (1, 1, 8, P) scale-stripe store → [B, n_t, 8, P]
        out_specs.append(pl.BlockSpec((1, 1, 8, p),
                                      lambda b, i: (b, i, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((bsz, n_t, 8, p), jnp.float32))
    if want_stats:
        # index_map revisits (b, 0, 0, 0) for every i → VMEM accumulator
        out_specs.append(pl.BlockSpec((1, 2, g, p),
                                      lambda b, i: (b, 0, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((bsz, 2, g, p), jnp.float32))

    scratch_shapes = [pltpu.VMEM(((tile_t + 4) * g, p), stage_dt)]
    if mxu_int8:
        scratch_shapes.append(pltpu.VMEM(((tile_t + 4) * g, p), jnp.int8))
    result = pl.pallas_call(
        lambda *refs: kern(refs),
        grid=(bsz, n_t),
        in_specs=in_specs,
        out_specs=tuple(out_specs) if len(out_specs) > 1 else out_specs[0],
        out_shape=tuple(out_shape) if len(out_shape) > 1 else out_shape[0],
        scratch_shapes=scratch_shapes,
        # mxu_int8 carries an extra int8 requant buffer on top of the bf16
        # staging scratch — the fully-fused call (residual + stats) can
        # exceed Mosaic's default 16 MB scoped-vmem bound by ~1.4 MB at the
        # production tile; v5e has 128 MB of VMEM, so raise the bound
        # rather than shrink the (measured-optimal) tile.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
    )(*args)
    if not isinstance(result, (tuple, list)):
        result = (result,)
    out = result[0]
    rest = []
    if quant_out:
        rest.append(result[1])
    if want_stats:
        stats = result[-1]
        if rows_view:
            # period-folded [B, P] sums: the group structure is
            # per-lane-within-period, so GN folds stay exact
            rest.extend([stats[:, 0].sum(axis=1), stats[:, 1].sum(axis=1)])
        else:
            rest.extend([stats[:, 0].reshape(bsz, fc),
                         stats[:, 1].reshape(bsz, fc)])
    if not rows_view:
        out = out.reshape(bsz, t, fc)
    return (out, *rest) if rest else out
