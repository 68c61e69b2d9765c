"""Pallas TPU kernels: strided k4 s2 p1 down-conv and transposed k4 s2 p1
up-conv over flat-packed activations — the reference's Downsample/Upsample
(reference models/diffusion.py:59-78) — for EVERY audio.yml stage
transition, so stage changes never leave the flat layout.

Companions to ``conv_flat.py`` (same design language — see its docstring).

Down (k4, s2, p1), C_in → C_out, (T, F) → (T/2, F/2):
    Output flat rows are periodic with period P (a multiple of
    lcm(C_out, 128)); each output period consumes S = 2·C_in·P/C_out input
    lanes (P chosen so S is a multiple of 128), giving matched views
    out [T/2·R, P] / in [T/2·R, S] per time-parity stream with
    R = FC_out/P = FC_in/S rows per time step. Splitting the input rows by
    time parity (even/odd — a free-to-fuse strided slice in XLA) makes
    every tap (dt ∈ 0..3 time offset × dq ∈ {−1,0,+1} period offset) a
    STATIC row-offset slice + one [M, S] × [S, P] matmul:
        dt = 0 → odd stream,  Δ = −R + dq      dt = 1 → even, Δ = dq
        dt = 2 → odd,  Δ = dq                  dt = 3 → even, Δ = R + dq

Up (transposed k4, s2, p1), C_in → C_out, (T, F) → (2T, 2F):
    Mirror image: the OUTPUT is computed as two time-parity streams
    (out[2m] gets taps dt ∈ {1, 3} ← x[m], x[m−1]; out[2m+1] gets
    dt ∈ {0, 2} ← x[m+1], x[m]), each a [M, Q] × [Q, P_s] matmul per tap
    with Q a multiple of lcm(C_in, 128) such that P_s = 2·Q·C_out/C_in is a
    multiple of 128; the f-doubling (df parity structure) is packed into
    the weights. The streams are written as a [B, 2, T·R, P_s] array and
    interleaved by one (fusible) XLA transpose.

Both match lax.conv_general_dilated / conv_transpose_apply exactly at fp32
(tests/test_pallas_conv.py). Down can accumulate per-lane (sum, sum²) of
its output — the following GroupNorm's statistics for free.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .conv_flat import _slim_width

LANES = 128


# ---------------------------------------------------------------- down ----

def down_plan(c_in: int, c_out: int) -> tuple[int, int]:
    """(P, S): output lane period and input lanes per output period."""
    base = math.lcm(c_out, LANES)
    p = base
    while (2 * c_in * p) % (c_out * LANES):
        p += base
    return p, 2 * c_in * p // c_out


def supports_flat_down(c_in: int, f_in: int, c_out: int | None = None,
                       hw: bool = True) -> bool:
    c_out = 2 * c_in if c_out is None else c_out
    p, s = down_plan(c_in, c_out)
    fc_in = f_in * c_in
    fc_out = (f_in // 2) * c_out
    return (
        f_in % 2 == 0
        and fc_in % s == 0
        and fc_out % p == 0
        and fc_in // s == fc_out // p
        # halo BlockSpecs are (1, 2·R, S): Mosaic needs 2·R % 8 == 0
        # (hw=False: interpret-mode tests on scaled-down geometry)
        and (not hw or (fc_out // p) % 4 == 0)
    )


def pack_down_weights(w, dtype=jnp.float32):
    """w [4, 4, C_in, C_out] (HWIO) → packed tap blocks.

    For output lane q = fo·C_out + co (fo ∈ [0, P/C_out)) and tap (dt, df):
        o = (2·fo + df − 1)·C_in + ci,  dq = −1 | 0 | +1 as o < 0 | < S | ≥ S

    "12" format (LS = `_slim_width(C_in)` ≥ S): [12·S, P] blocks
        j = dt·3 + (dq+1): W2[j·S + (o mod S), q] = w[dt, df, ci, co].

    "slim" format (LS < S): like conv_flat's slim-carry scheme — the
    dq = ±1 blocks hold exactly ONE C_in-wide band (o = −C_in and o = S),
    so they pack as [LS, P] blocks read through 128-lane-aligned slices of
    the neighbour period row: [4·S + 8·LS, P] =
        rows [dt·S, (dt+1)·S):       dq = 0 taps (dense)
        rows 4S + dt·LS …:           dq = −1 (slice [S−LS, S) → band at
                                     [LS−C_in, LS))
        rows 4S + 4LS + dt·LS …:     dq = +1 (slice [0, LS) → band [0, C_in))
    MXU passes drop from 12 S-wide to 4 + 8·(LS/S) (64→96: 12 → 6)."""
    kh, kw, c_in, c_out = w.shape
    assert kh == 4 and kw == 4
    _, s = down_plan(c_in, c_out)
    return _pack_down(w, _slim_width(c_in) < s).astype(dtype)


def pack_down_weights12(w):
    """Always-12-format packer (fp32) — the dw kernels emit their gradient
    in this layout, so the VJP weight unpack goes through THIS packer's
    transpose regardless of which format the forward ran."""
    return _pack_down(w, False)


def strided_int8_profitable(c_in: int, c_out: int, up: bool = False) -> bool:
    """True where int8 × int8 → int32 taps beat the float tap scheme for a
    strided transition: exactly the 12-format geometries (LS ≥ S — no slim
    carry available), where the tap blocks are C_in/S ≤ 50% dense and the
    MXU pays the padding at full width. At audio.yml scale that is the
    s0↔s1 pair (down 32→64, up 64→32) — ~1.5 ms of its measured 2.2 ms is
    tap matmuls, and int8 runs them at 2× the bf16 rate. Slim-format
    transitions (e.g. 64→96) already cut the executed width below what
    int8-on-12-format would run."""
    if up:
        q, _ = up_plan(c_in, c_out)
        return _slim_width(c_in) >= q
    _, s = down_plan(c_in, c_out)
    return _slim_width(c_in) >= s


def pack_down_weights_int8(w):
    """w [4, 4, C_in, C_out] → (int8 [12·S, P] tap blocks, fp32 [P]
    per-lane dequant scales). Symmetric per-output-channel quantization
    (scale rides the kernel's per-lane rescale of the int32 accumulator),
    mirroring conv_flat.pack_conv_weights_int8. 12-format only — see
    strided_int8_profitable."""
    kh, kw, c_in, c_out = w.shape
    assert kh == 4 and kw == 4
    p, _ = down_plan(c_in, c_out)
    w32 = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=(0, 1, 2))  # [C_out]
    s_w = jnp.maximum(amax, 1e-30) / 127.0
    wq = jnp.clip(jnp.round(w32 / s_w[None, None, None, :]), -127.0, 127.0)
    return _pack_down(wq, False).astype(jnp.int8), jnp.tile(s_w, p // c_out)


def pack_up_weights_int8(w):
    """w [4, 4, C_in, C_out] (equivalent-forward-conv layout, see
    pack_up_weights) → (int8 [12·Q, P_s] blocks, fp32 [P_s] per-lane
    scales)."""
    kh, kw, c_in, c_out = w.shape
    assert kh == 4 and kw == 4
    _, p_s = up_plan(c_in, c_out)
    w32 = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=(0, 1, 2))
    s_w = jnp.maximum(amax, 1e-30) / 127.0
    wq = jnp.clip(jnp.round(w32 / s_w[None, None, None, :]), -127.0, 127.0)
    return _pack_up(wq, False).astype(jnp.int8), jnp.tile(s_w, p_s // c_out)


def _pack_down(w, slim: bool):
    kh, kw, c_in, c_out = w.shape
    p, s = down_plan(c_in, c_out)
    fpp = p // c_out
    ls = _slim_width(c_in)
    rows = 4 * s + 8 * ls if slim else 12 * s
    w2 = jnp.zeros((rows, p), jnp.float32)
    for dt in range(4):
        for df in range(4):
            for fo in range(fpp):
                o = (2 * fo + df - 1) * c_in
                dq = -1 if o < 0 else (1 if o >= s else 0)
                fi = o % s
                if not slim:
                    r0 = (dt * 3 + dq + 1) * s + fi
                elif dq == 0:
                    r0 = dt * s + fi
                elif dq == -1:
                    r0 = 4 * s + dt * ls + (fi - (s - ls))
                else:
                    r0 = 4 * s + 4 * ls + dt * ls + fi
                w2 = w2.at[
                    r0 : r0 + c_in,
                    fo * c_out : (fo + 1) * c_out,
                ].add(w[dt, df].astype(jnp.float32))
    return w2


def _down_kernel(refs, *, tile_t, r, s, p, ls, n_t, want_stats, mxu_i8):
    it = iter(refs)
    x_ref, top_ref, bot_ref = next(it), next(it), next(it)
    w_ref = next(it)
    wsc_ref = next(it) if mxu_i8 else None
    b_ref = next(it)
    out_ref = next(it)
    stats_ref = next(it) if want_stats else None
    se = next(it)
    so = next(it)
    # int8 taps: separate requant buffers per time-parity stream (both
    # share ONE per-tile symmetric scale so the int32 accumulators of taps
    # from either stream combine before the single rescale)
    qe = next(it) if mxu_i8 else None
    qo = next(it) if mxu_i8 else None

    i = pl.program_id(1)
    m = tile_t * r
    h = 2 * r

    # De-interleave the time-parity streams with banded in-VMEM copies
    # (each input time row is R contiguous view rows) — the input is read
    # from HBM exactly once, no host-side strided-slice pass.
    for k in range(tile_t):
        se[h + k * r : h + (k + 1) * r, :] = x_ref[0, 2 * k * r : (2 * k + 1) * r, :]
        so[h + k * r : h + (k + 1) * r, :] = x_ref[0, (2 * k + 1) * r : (2 * k + 2) * r, :]
    # halo block holds input time rows (2t0−2, 2t0−1); the deeper halo rows
    # [0, h−r) are only ever read through masked taps.
    se[h - r : h, :] = top_ref[0, 0:r, :]
    so[h - r : h, :] = top_ref[0, r : 2 * r, :]
    se[h + m : h + m + r, :] = bot_ref[0, 0:r, :]
    so[h + m : h + m + r, :] = bot_ref[0, r : 2 * r, :]

    # time-boundary zero padding (the clamped edge halos hold duplicates)
    @pl.when(i == 0)
    def _():
        se[0:h, :] = jnp.zeros((h, s), se.dtype)
        so[0:h, :] = jnp.zeros((h, s), so.dtype)

    @pl.when(i == n_t - 1)
    def _():
        se[h + m :, :] = jnp.zeros((h, s), se.dtype)
        so[h + m :, :] = jnp.zeros((h, s), so.dtype)

    gidx = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0) % r
    first_mask = gidx == 0
    last_mask = gidx == r - 1

    if mxu_i8:
        # per-tile symmetric requant of both streams (halos included so
        # every tap operand shares the scale); taps then run
        # int8 × int8 → int32 at 2× the bf16 MXU rate — the 12-format tap
        # blocks are only C_in/S dense, so the MXU padding tax halves.
        # Only rows [h−r, h+m+r) are ever WRITTEN by the assembly (deeper
        # scratch rows are uninitialized — reading them into the amax
        # would poison the scale); taps READ one row beyond on each side,
        # so quantize [h−r−1, h+m+r+1) — the two unwritten edge rows are
        # garbage-but-finite int8 that only masked partial sums touch.
        ve = se[h - r : h + m + r, :].astype(jnp.float32)
        vo = so[h - r : h + m + r, :].astype(jnp.float32)
        am = jnp.maximum(jnp.max(jnp.abs(ve)), jnp.max(jnp.abs(vo)))
        amax_t = jnp.maximum(am, 1e-30)
        s_q = amax_t * (1.0 / 127.0)
        for src, dst in ((se, qe), (so, qo)):
            v = src[h - r - 1 : h + m + r + 1, :].astype(jnp.float32)
            dst[h - r - 1 : h + m + r + 1, :] = jnp.clip(
                jnp.round(v * (127.0 / amax_t)), -127.0, 127.0
            ).astype(jnp.int8)

    # f-boundary masks land POST-matmul (a tap maps input row r+δ to output
    # row r one-to-one, so zeroing invalid input rows ≡ zeroing the dq = ±1
    # partial sums on period-first/last output rows) — no per-tap masked
    # operand copies.
    acc_t = jnp.int32 if mxu_i8 else jnp.float32
    acc = jnp.zeros((m, p), acc_t)
    lo = jnp.zeros((m, p), acc_t)
    hi = jnp.zeros((m, p), acc_t)
    stream = ({0: qo, 1: qe, 2: qo, 3: qe} if mxu_i8
              else {0: so, 1: se, 2: so, 3: se})
    tshift = {0: -r, 1: 0, 2: 0, 3: r}
    for dt in range(4):
        sc = stream[dt]
        if ls < s:
            # slim-carry format (pack_down_weights): dq = 0 dense + two
            # [LS, P] boundary blocks read through aligned lane slices of
            # the neighbour period row.
            delta = tshift[dt]
            acc = acc + jnp.dot(
                sc[h + delta : h + delta + m, :],
                w_ref[dt * s : (dt + 1) * s, :],
                preferred_element_type=jnp.float32,
            )
            lo = lo + jnp.dot(
                sc[h + delta - 1 : h + delta - 1 + m, s - ls :],
                w_ref[4 * s + dt * ls : 4 * s + (dt + 1) * ls, :],
                preferred_element_type=jnp.float32,
            )
            hi = hi + jnp.dot(
                sc[h + delta + 1 : h + delta + 1 + m, 0:ls],
                w_ref[4 * s + (4 + dt) * ls : 4 * s + (5 + dt) * ls, :],
                preferred_element_type=jnp.float32,
            )
        else:
            for dq in (-1, 0, 1):
                delta = tshift[dt] + dq
                rows = sc[h + delta : h + delta + m, :]
                j = dt * 3 + dq + 1
                tgt = jnp.dot(rows, w_ref[j * s : (j + 1) * s, :],
                              preferred_element_type=acc_t)
                if dq == -1:
                    lo = lo + tgt
                elif dq == 1:
                    hi = hi + tgt
                else:
                    acc = acc + tgt

    zf = jnp.zeros((), acc_t)
    acc = (acc + jnp.where(first_mask, zf, lo)
           + jnp.where(last_mask, zf, hi))
    if mxu_i8:
        # int32 → fp32 with the combined tile × per-lane weight scale
        out = acc.astype(jnp.float32) * (s_q * wsc_ref[0]) + b_ref[0]
    else:
        out = acc + b_ref[0]
    out_ref[0] = out.astype(out_ref.dtype)

    if stats_ref is not None:
        @pl.when(i == 0)
        def _():
            stats_ref[0] = jnp.zeros((2, r, p), jnp.float32)

        gi = jax.lax.broadcasted_iota(jnp.int32, (r, m), 0)
        gj = jax.lax.broadcasted_iota(jnp.int32, (r, m), 1) % r
        reducer = (gi == gj).astype(jnp.float32)
        stats_ref[0, 0] = stats_ref[0, 0] + jnp.dot(
            reducer, out, preferred_element_type=jnp.float32)
        stats_ref[0, 1] = stats_ref[0, 1] + jnp.dot(
            reducer, out * out, preferred_element_type=jnp.float32)


def conv_down_flat(x, w2, bias, *, c_in: int, c_out: int | None = None,
                   tile_t: int | None = None, want_stats: bool = False,
                   mxu_int8: bool = False, w_scale=None):
    """x: [B, T, F·C_in] → [B, T/2, (F/2)·C_out]. w2: packed taps
    (pack_down_weights — [12·S, P] or the slim [4·S + 8·LS, P] format).
    bias: [C_out] fp32 (or a pre-tiled [P] period pattern).

    mxu_int8=True runs the taps as int8 × int8 → int32 on the MXU (per-tile
    symmetric input requant shared across both time-parity streams; int8
    packed weights + per-lane w_scale from pack_down_weights_int8). Only
    the 12-format geometries profit — see strided_int8_profitable."""
    bsz, t, fc_in = x.shape
    c_out = 2 * c_in if c_out is None else c_out
    p, s = down_plan(c_in, c_out)
    ls = _slim_width(c_in)
    if mxu_int8:
        if ls < s:
            raise ValueError("mxu_int8 requires the 12-format geometry "
                             "(strided_int8_profitable)")
        if w_scale is None or w2.dtype != jnp.dtype(jnp.int8):
            raise ValueError("mxu_int8 requires int8 packed weights + "
                             "w_scale (pack_down_weights_int8)")
    want_rows = 4 * s + 8 * ls if ls < s else 12 * s
    if w2.shape[0] != want_rows:
        raise ValueError(
            f"packed weight rows {w2.shape[0]} != {want_rows} — pack with "
            f"pack_down_weights")
    if fc_in % s:
        raise ValueError(f"FC_in={fc_in} not a multiple of S={s}")
    r = fc_in // s
    fc_out = r * p
    t_out = t // 2
    from .conv_flat import _pick_tile_t

    tile_t = _pick_tile_t(t_out, r, s, x.dtype.itemsize, tile_t,
                          m_cap=2048, b_cap=1 << 18)
    if t_out % tile_t or tile_t % 2 or (t_out // 2) % (tile_t // 2):
        raise ValueError(f"T_out={t_out} not tileable by even tile_t={tile_t}")
    n_t = t_out // tile_t
    ht = tile_t // 2

    bias = jnp.asarray(bias, jnp.float32)
    if bias.shape == (c_out,):
        bias = jnp.tile(bias, p // c_out)
    bias = bias.reshape(1, p)

    # full interleaved input view [B, T·R, S]; each tile reads 2·tile_t
    # input time rows, the kernel de-interleaves in VMEM
    xv = x.reshape(bsz, t * r, s)
    main = pl.BlockSpec((1, 2 * tile_t * r, s), lambda b, i: (b, i, 0),
                        memory_space=pltpu.VMEM)
    top = pl.BlockSpec((1, 2 * r, s),
                       lambda b, i: (b, jnp.maximum(i * tile_t - 1, 0), 0),
                       memory_space=pltpu.VMEM)
    bot = pl.BlockSpec((1, 2 * r, s),
                       lambda b, i: (b, jnp.minimum((i + 1) * tile_t,
                                                    t // 2 - 1), 0),
                       memory_space=pltpu.VMEM)
    in_specs = [main, top, bot,
                pl.BlockSpec(memory_space=pltpu.VMEM)]
    args = [xv, xv, xv, w2]
    if mxu_int8:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(jnp.asarray(w_scale, jnp.float32)[None, :])
    in_specs.append(pl.BlockSpec((1, p), lambda b, i: (0, 0),
                                 memory_space=pltpu.VMEM))
    args.append(bias)

    out_specs = pl.BlockSpec((1, tile_t * r, p), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((bsz, t_out * r, p), x.dtype)
    if want_stats:
        out_specs = (out_specs,
                     pl.BlockSpec((1, 2, r, p), lambda b, i: (b, 0, 0, 0),
                                  memory_space=pltpu.VMEM))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((bsz, 2, r, p), jnp.float32))

    scratch_shapes = [
        pltpu.VMEM(((tile_t + 4) * r, s), x.dtype),
        pltpu.VMEM(((tile_t + 4) * r, s), x.dtype),
    ]
    if mxu_int8:
        scratch_shapes += [
            pltpu.VMEM(((tile_t + 4) * r, s), jnp.int8),
            pltpu.VMEM(((tile_t + 4) * r, s), jnp.int8),
        ]
    kern = functools.partial(_down_kernel, tile_t=tile_t, r=r, s=s, p=p,
                             ls=ls, n_t=n_t, want_stats=want_stats,
                             mxu_i8=mxu_int8)
    result = pl.pallas_call(
        lambda *refs: kern(refs),
        grid=(bsz, n_t),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
    )(*args)
    if want_stats:
        out, stats = result
        return (out.reshape(bsz, t_out, fc_out),
                stats[:, 0].reshape(bsz, fc_out),
                stats[:, 1].reshape(bsz, fc_out))
    return result.reshape(bsz, t_out, fc_out)


# ------------------------------------------------------------------ up ----

def up_plan(c_in: int, c_out: int) -> tuple[int, int]:
    """(Q, P_s): input lane period and output-stream lanes per period."""
    base = math.lcm(c_in, LANES)
    q = base
    while (2 * q * c_out) % (c_in * LANES):
        q += base
    return q, 2 * q * c_out // c_in


def supports_flat_up(c_in: int, f_in: int, c_out: int,
                     hw: bool = True) -> bool:
    q, p_s = up_plan(c_in, c_out)
    fc_in = f_in * c_in
    return (
        fc_in % q == 0
        and (2 * f_in * c_out) % p_s == 0
        and fc_in // q == (2 * f_in * c_out) // p_s
        # halo BlockSpecs are (1, 2·R, Q): Mosaic needs 2·R % 8 == 0
        # (hw=False: interpret-mode tests on scaled-down geometry)
        and (not hw or (fc_in // q) % 4 == 0)
    )


def pack_up_weights(w, dtype=jnp.float32):
    """w [4, 4, C_in, C_out] — the *equivalent-forward-conv* kernel stored
    by conv_transpose_init (flipped/IO-swapped torch weight, see
    models/layers.py docstring) → packed tap blocks; stream 0 = even output
    rows (torch taps dt ∈ {1, 3}), stream 1 = odd (dt ∈ {0, 2}).

    "12" format (LS = `_slim_width(C_in)` ≥ Q): [12·Q, P_s] blocks
        j = stream·6 + local_dt·3 + (dq+1).
    "slim" format (LS < Q): the dq = ±1 blocks hold one C_in-wide band
    (f_i = −1 / f_i = FQ), packed as [LS, P_s] blocks for aligned-slice
    reads: [4·Q + 8·LS, P_s] with j2 = stream·2 + local_dt:
        rows [j2·Q, (j2+1)·Q):     dq = 0 (dense)
        rows 4Q + j2·LS …:         dq = −1 (slice [Q−LS, Q))
        rows 4Q + 4LS + j2·LS …:   dq = +1 (slice [0, LS))"""
    kh, kw, c_in, c_out = w.shape
    assert kh == 4 and kw == 4
    q, _ = up_plan(c_in, c_out)
    return _pack_up(w, _slim_width(c_in) < q).astype(dtype)


def pack_up_weights12(w):
    """Always-12-format packer (fp32) — see pack_down_weights12."""
    return _pack_up(w, False)


def _pack_up(w, slim: bool):
    kh, kw, c_in, c_out = w.shape
    q, p_s = up_plan(c_in, c_out)
    fq = q // c_in  # input f positions per period
    ls = _slim_width(c_in)
    w2 = jnp.zeros((4 * q + 8 * ls if slim else 12 * q, p_s), jnp.float32)
    # torch tap coefficient K[dt, df] = stored w[3−dt, 3−df]
    for stream, dts in ((0, (1, 3)), (1, (0, 2))):
        for local_dt, dt in enumerate(dts):
            for fo_p in range(2 * fq):  # output f position within period
                if fo_p % 2 == 0:
                    pairs = (((fo_p // 2), 1), ((fo_p // 2) - 1, 3))
                else:
                    pairs = (((fo_p + 1) // 2), 0), ((fo_p // 2), 2)
                for f_i, df in pairs:
                    o = f_i * c_in
                    dq = -1 if o < 0 else (1 if o >= q else 0)
                    fi = o % q
                    j2 = stream * 2 + local_dt
                    if not slim:
                        r0 = (stream * 6 + local_dt * 3 + dq + 1) * q + fi
                    elif dq == 0:
                        r0 = j2 * q + fi
                    elif dq == -1:
                        r0 = 4 * q + j2 * ls + (fi - (q - ls))
                    else:
                        r0 = 4 * q + 4 * ls + j2 * ls + fi
                    w2 = w2.at[
                        r0 : r0 + c_in,
                        fo_p * c_out : (fo_p + 1) * c_out,
                    ].add(w[3 - dt, 3 - df].astype(jnp.float32))
    return w2


def _up_kernel(refs, *, tile_t, r, q, p_s, ls, n_t, has_res, want_stats,
               mxu_i8):
    it = iter(refs)
    x_ref, top_ref, bot_ref = next(it), next(it), next(it)
    w_ref = next(it)
    wsc_ref = next(it) if mxu_i8 else None
    b_ref = next(it)
    res_ref = next(it) if has_res else None
    out_ref = next(it)
    stats_ref = next(it) if want_stats else None
    sc = next(it)
    qsc = next(it) if mxu_i8 else None

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

    if mxu_i8:
        # per-tile symmetric input requant (halos included); both output
        # streams read the same int8 operand, one rescale each
        v = sc[:, :].astype(jnp.float32)
        amax_t = jnp.maximum(jnp.max(jnp.abs(v)), 1e-30)
        s_q = amax_t * (1.0 / 127.0)
        qsc[:, :] = jnp.clip(jnp.round(v * (127.0 / amax_t)),
                             -127.0, 127.0).astype(jnp.int8)

    gidx = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0) % r
    first_mask = gidx == 0
    last_mask = gidx == r - 1

    tshift = {0: (0, -r), 1: (r, 0)}  # stream → (Δ_t of local_dt 0, 1)
    if stats_ref is not None:
        s1_acc = jnp.zeros((r, p_s), jnp.float32)
        s2_acc = jnp.zeros((r, p_s), jnp.float32)
    acc_t = jnp.int32 if mxu_i8 else jnp.float32
    operand = qsc if mxu_i8 else sc
    for stream in (0, 1):
        # f-boundary masks land POST-matmul (one-to-one row mapping per
        # tap); slim format (ls < q) reads the dq = ±1 bands through
        # aligned lane slices against [LS, P_s] blocks — see
        # pack_up_weights.
        acc = jnp.zeros((m, p_s), acc_t)
        lo = jnp.zeros((m, p_s), acc_t)
        hi = jnp.zeros((m, p_s), acc_t)
        for local_dt in (0, 1):
            delta0 = tshift[stream][local_dt]
            j2 = stream * 2 + local_dt
            if ls < q:
                acc = acc + jnp.dot(
                    sc[h + delta0 : h + delta0 + m, :],
                    w_ref[j2 * q : (j2 + 1) * q, :],
                    preferred_element_type=jnp.float32,
                )
                lo = lo + jnp.dot(
                    sc[h + delta0 - 1 : h + delta0 - 1 + m, q - ls :],
                    w_ref[4 * q + j2 * ls : 4 * q + (j2 + 1) * ls, :],
                    preferred_element_type=jnp.float32,
                )
                hi = hi + jnp.dot(
                    sc[h + delta0 + 1 : h + delta0 + 1 + m, 0:ls],
                    w_ref[4 * q + (4 + j2) * ls : 4 * q + (5 + j2) * ls, :],
                    preferred_element_type=jnp.float32,
                )
            else:
                for dq in (-1, 0, 1):
                    delta = delta0 + dq
                    rows = operand[h + delta : h + delta + m, :]
                    j = stream * 6 + local_dt * 3 + dq + 1
                    part = jnp.dot(rows, w_ref[j * q : (j + 1) * q, :],
                                   preferred_element_type=acc_t)
                    if dq == -1:
                        lo = lo + part
                    elif dq == 1:
                        hi = hi + part
                    else:
                        acc = acc + part
        zf = jnp.zeros((), acc_t)
        acc = (acc + jnp.where(first_mask, zf, lo)
               + jnp.where(last_mask, zf, hi))
        if mxu_i8:
            out = acc.astype(jnp.float32) * (s_q * wsc_ref[0]) + b_ref[0]
        else:
            out = acc + b_ref[0]
        # interleave the time-parity streams with banded in-VMEM writes
        # (output time row 2m+stream is R contiguous view rows) — no
        # host-side transpose pass. The skip-connection residual (the
        # U-Net's `up(h) + hidden`) fuses into the same banded store:
        # zero extra HBM traffic beyond streaming the residual in. The
        # next GroupNorm's (sum, sum²) accumulate per chunk in registers —
        # each chunk's rows ARE one period set [r, p_s], so no reducer
        # matmul and no output read-back.
        for k in range(tile_t):
            lo, hi = (2 * k + stream) * r, (2 * k + stream + 1) * r
            chunk = out[k * r : (k + 1) * r, :]
            if has_res:
                chunk = chunk + res_ref[0, lo:hi, :].astype(jnp.float32)
            if stats_ref is not None:
                s1_acc = s1_acc + chunk
                s2_acc = s2_acc + chunk * chunk
            out_ref[0, lo:hi, :] = chunk.astype(out_ref.dtype)

    if stats_ref is not None:
        @pl.when(i == 0)
        def _():
            stats_ref[0] = jnp.zeros((2, r, p_s), jnp.float32)

        stats_ref[0, 0] = stats_ref[0, 0] + s1_acc
        stats_ref[0, 1] = stats_ref[0, 1] + s2_acc


def conv_up_flat(x, w2, bias, *, c_in: int, c_out: int,
                 tile_t: int | None = None, residual=None,
                 want_stats: bool = False,
                 mxu_int8: bool = False, w_scale=None):
    """x: [B, T, F·C_in] → [B, 2T, (2F)·C_out] (torch ConvTranspose2d k4 s2
    p1 semantics). w2: packed taps (pack_up_weights — [12·Q, P_s] or the
    slim [4·Q + 8·LS, P_s] format); bias: [C_out] fp32 (or [P_s]).

    residual: optional [B, 2T, (2F)·C_out] skip tensor added to the output
    inside the kernel (the U-Net up-path `up(h) + hidden` fused for free).
    want_stats: also return per-lane (sum, sum²) of the fp32 (summed)
    output — the next GroupNorm's statistics with no extra HBM pass.
    mxu_int8: int8 × int8 → int32 taps (12-format geometries only — see
    strided_int8_profitable; weights from pack_up_weights_int8)."""
    bsz, t, fc_in = x.shape
    q, p_s = up_plan(c_in, c_out)
    ls = _slim_width(c_in)
    if mxu_int8:
        if ls < q:
            raise ValueError("mxu_int8 requires the 12-format geometry "
                             "(strided_int8_profitable)")
        if w_scale is None or w2.dtype != jnp.dtype(jnp.int8):
            raise ValueError("mxu_int8 requires int8 packed weights + "
                             "w_scale (pack_up_weights_int8)")
    want_rows = 4 * q + 8 * ls if ls < q else 12 * q
    if w2.shape[0] != want_rows:
        raise ValueError(
            f"packed weight rows {w2.shape[0]} != {want_rows} — pack with "
            f"pack_up_weights")
    if fc_in % q:
        raise ValueError(f"FC_in={fc_in} not a multiple of Q={q}")
    r = fc_in // q
    fc_out = r * p_s
    from .conv_flat import _pick_tile_t

    # bound by P_s (the 2·tile_t·r × P_s OUTPUT block is the larger one)
    tile_t = _pick_tile_t(t, r, p_s, x.dtype.itemsize, tile_t,
                          m_cap=2048, b_cap=1 << 18)
    if t % tile_t or tile_t % 2 or (t // 2) % (tile_t // 2):
        raise ValueError(f"T={t} not tileable by even tile_t={tile_t}")
    n_t = t // tile_t
    ht = tile_t // 2

    bias = jnp.asarray(bias, jnp.float32)
    if bias.shape == (c_out,):
        bias = jnp.tile(bias, p_s // c_out)
    bias = bias.reshape(1, p_s)

    xv = x.reshape(bsz, t * r, q)
    in_specs = [
        pl.BlockSpec((1, tile_t * r, q), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2 * r, q),
                     lambda b, i: (b, jnp.maximum(i * ht - 1, 0), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2 * r, q),
                     lambda b, i: (b, jnp.minimum((i + 1) * ht, t // 2 - 1), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    args = [xv, xv, xv, w2]
    if mxu_int8:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(jnp.asarray(w_scale, jnp.float32)[None, :])
    in_specs.append(pl.BlockSpec((1, p_s), lambda b, i: (0, 0),
                                 memory_space=pltpu.VMEM))
    args.append(bias)
    if residual is not None:
        in_specs.append(
            pl.BlockSpec((1, 2 * tile_t * r, p_s), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(residual.reshape(bsz, 2 * t * r, p_s))
    kern = functools.partial(_up_kernel, tile_t=tile_t, r=r, q=q, p_s=p_s,
                             ls=ls, n_t=n_t, has_res=residual is not None,
                             want_stats=want_stats, mxu_i8=mxu_int8)
    out_specs = pl.BlockSpec((1, 2 * tile_t * r, p_s),
                             lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((bsz, 2 * t * r, p_s), x.dtype)
    if want_stats:
        out_specs = (
            out_specs,
            pl.BlockSpec((1, 2, r, p_s), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        )
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((bsz, 2, r, p_s), jnp.float32))
    scratch_shapes = [pltpu.VMEM(((tile_t + 4) * r, q), x.dtype)]
    if mxu_int8:
        scratch_shapes.append(pltpu.VMEM(((tile_t + 4) * r, q), jnp.int8))
    result = pl.pallas_call(
        lambda *refs: kern(refs),
        grid=(bsz, n_t),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
    )(*args)
    if want_stats:
        out, stats = result
        return (out.reshape(bsz, 2 * t, fc_out),
                stats[:, 0].reshape(bsz, fc_out),
                stats[:, 1].reshape(bsz, fc_out))
    return result.reshape(bsz, 2 * t, fc_out)
