"""Pallas TPU kernel: strided k4 s2 p1 down-conv over flat-packed
activations (the reference's Downsample, models/diffusion.py:70-78).

Companion to ``conv_flat.py`` (same layout philosophy and Mosaic workarounds
— see its docstring). C → 2C and (T, F) → (T/2, F/2), so the flat row width
F·C is UNCHANGED: down-sampling never leaves the flat layout.

Taps: 4 input-row offsets {2t_o−1 … 2t_o+2} realized as selection-matrix
matmuls over a 2·TT-row input tile (with halo patches from the neighbor
8-row blocks), × 3 lane-group offsets — the stride-2 f-window
{2f_o−1 … 2f_o+2} spans exactly the neighboring 128-lane groups, with the
sub-group f/stride structure packed into the [12·128, 128] weights:

    o = 2·fo − 1 + df,  dg = 1 + floor(o / fpg_in),  fi = o mod fpg_in
    W2[(dt·3+dg)·128 + fi·C + ci, fo·2C + co] = w[dt, df, ci, co]

Matches lax.conv_general_dilated(k4, s2, p1) exactly (tested). Interpret-
verified; TPU integration (model wiring + up-conv twin) is the round-2 item
— see ARCHITECTURE.md roadmap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .conv_flat import _shift_groups

LANES = 128


def supports_flat_down(c_in: int, f_in: int) -> bool:
    return (
        LANES % c_in == 0
        and LANES % (2 * c_in) == 0
        and (f_in * c_in) % LANES == 0
        and f_in % 2 == 0
    )


def pack_down_weights(w, dtype=jnp.float32):
    """w [4, 4, C, 2C] (HWIO) → [12·128, 128] for taps (dt ∈ 0..3, dg ∈ 0..2)."""
    kh, kw, c, c2 = w.shape
    assert kh == 4 and kw == 4 and c2 == 2 * c and LANES % c2 == 0
    fpg_out = LANES // (2 * c)
    fpg_in = LANES // c
    w2 = jnp.zeros((12 * LANES, LANES), jnp.float32)
    for dt in range(4):
        for df in range(4):
            for fo in range(fpg_out):
                o = 2 * fo - 1 + df
                dg = 1 + (o // fpg_in if o >= 0 else -1)
                fi = o % fpg_in
                j = dt * 3 + dg
                w2 = w2.at[
                    j * LANES + fi * c : j * LANES + (fi + 1) * c,
                    fo * 2 * c : (fo + 1) * 2 * c,
                ].add(w[dt, df].astype(jnp.float32))
    return w2.astype(dtype)


def _down_kernel(refs, *, tile_t, fc, n_t):
    x_hbm, w_ref, b_ref, out_ref, main_buf, top_buf, bot_buf, sem = refs

    b = pl.program_id(0)
    i = pl.program_id(1)
    in_t0 = pl.multiple_of(i * 2 * tile_t, 8)  # input rows [in_t0, in_t0+2TT)

    main = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(in_t0, 2 * tile_t)], main_buf, sem.at[0]
    )
    main.start()

    @pl.when(i > 0)
    def _():
        top = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(pl.multiple_of(in_t0 - 8, 8), 8)], top_buf,
            sem.at[1],
        )
        top.start()
        top.wait()

    @pl.when(i == 0)
    def _():
        top_buf[:, :] = jnp.zeros((8, fc), top_buf.dtype)

    @pl.when(i < n_t - 1)
    def _():
        bot = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(pl.multiple_of(in_t0 + 2 * tile_t, 8), 8)],
            bot_buf, sem.at[2],
        )
        bot.start()
        bot.wait()

    @pl.when(i == n_t - 1)
    def _():
        bot_buf[:, :] = jnp.zeros((8, fc), bot_buf.dtype)

    main.wait()
    mid = main_buf[:]  # [2TT, fc]

    # strided row selections: rows_dt[to] = in[2·to + dt − 1]
    r = jax.lax.broadcasted_iota(jnp.int32, (tile_t, 2 * tile_t), 0)
    s = jax.lax.broadcasted_iota(jnp.int32, (tile_t, 2 * tile_t), 1)
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (tile_t, fc), 0)
    rows_by_dt = []
    for dt in range(4):
        sel = (s == 2 * r + dt - 1).astype(mid.dtype)
        rows = jnp.dot(sel, mid, preferred_element_type=jnp.float32).astype(
            mid.dtype
        )
        if dt == 0:  # to = 0 reads input row −1 → top halo
            rows = jnp.where(
                row_idx == 0,
                jnp.broadcast_to(top_buf[7:8, :], (tile_t, fc)),
                rows,
            )
        if dt == 3:  # to = TT−1 reads input row 2TT → bottom halo
            rows = jnp.where(
                row_idx == tile_t - 1,
                jnp.broadcast_to(bot_buf[0:1, :], (tile_t, fc)),
                rows,
            )
        rows_by_dt.append(rows)

    groups = fc // LANES
    cols = []
    for rows in rows_by_dt:
        for dg in range(3):
            cols.append(_shift_groups(rows, dg).reshape(tile_t * groups, LANES))
    im2col = jnp.concatenate(cols, axis=1)  # [TT·groups, 12·128]

    acc = jnp.dot(im2col, w_ref[:], preferred_element_type=jnp.float32)
    out = acc.reshape(tile_t, fc) + b_ref[0, 0, :]
    out_ref[0] = out.astype(out_ref.dtype)


def conv_down_flat(x, w2, bias_flat, *, c_in: int, tile_t: int = 16):
    """x: [B, T, F·C] (C = c_in) → [B, T/2, (F/2)·2C] (same flat width).
    w2: packed [12·128, 128]; bias_flat: [(F/2)·2C] (= F·C) fp32."""
    bsz, t, fc = x.shape
    if t % 2 or fc % LANES or LANES % (2 * c_in):
        raise ValueError(f"bad shapes: T={t}, FC={fc}, C={c_in}")
    t_out = t // 2
    while t_out % tile_t:
        tile_t //= 2
    n_t = t_out // tile_t

    kern = functools.partial(_down_kernel, tile_t=tile_t, fc=fc, n_t=n_t)
    return pl.pallas_call(
        lambda *refs: kern(refs),
        grid=(bsz, n_t),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, fc), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_t, fc), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, t_out, fc), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * tile_t, fc), x.dtype),
            pltpu.VMEM((8, fc), x.dtype),
            pltpu.VMEM((8, fc), x.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )(x, w2, jnp.asarray(bias_flat, jnp.float32).reshape(1, 1, fc))
