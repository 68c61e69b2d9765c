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

The resblock chains — where the FLOPs and bytes are — run on the flat
Pallas kernels PER SHARD when the geometry supports them and
``cfg.conv_impl`` selects the Pallas path (the same gate as the
single-device forward): each stride-1 conv halo-exchanges one t-step of
raw rows in the kernels' [B, T·G, P] row view, runs the fused kernel over
the haloed block, and crops; GroupNorm statistics are psum'd per-lane sums
(the in-kernel fused stats would double-count halo rows, so the SP path
computes them as one XLA pass per conv output instead). At the global
boundary the halo t-step is filled with the per-lane value the kernel's
prologue maps to exactly zero (pre_scale·v + pre_shift = 0), so a missing
neighbor contributes precisely what the reference's zero padding would.
Head/tail convs and the strided transitions stay XLA per-shard (they carry
<10% of the forward's work; their halo protocol is the same but their
kernels assume whole-T grids).

``apply_model_sp`` matches ``apply_model`` exactly (tested on the virtual
8-device CPU mesh against the single-device forward, both XLA and
interpret-mode Pallas). GSPMD (jit with sharding constraints) is the
zero-effort alternative exercised by ``__graft_entry__.dryrun_multichip``;
this module is the explicit, collective-controlled path the sampling
runner uses for sp>1 meshes (runners/diffusion_runner._denoise_for).
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


def _psum_lane_sums(xv):
    """Global per-lane (sum, sum²) over the sharded rows axis: [B, P] fp32."""
    xf = xv.astype(jnp.float32)
    return (
        jax.lax.psum(jnp.sum(xf, axis=1), SP_AXIS),
        jax.lax.psum(jnp.einsum("brk,brk->bk", xf, xf), SP_AXIS),
    )


def _halo_rows(xv, g: int, hp: int, vpad):
    """Rows-view halo for the flat conv kernels: prepend/append ``hp``
    t-steps (g rows each) so the haloed block stays tileable by the kernel's
    even tile_t (hp = tile_t/2; T_loc + 2·hp = T_loc + tile_t). The adjacent
    t-step is the neighbor's real edge rows via ppermute; at the global
    boundary it is ``vpad`` — the per-lane value the consuming kernel's
    prologue maps to exactly 0 (pre_scale·v + pre_shift = 0), so a missing
    neighbor contributes what zero padding of the post-prologue conv input
    would. The hp−1 outer t-steps are read only by cropped outputs."""
    n = jax.lax.axis_size(SP_AXIS)
    b, _, p = xv.shape
    idx = _axis_index()
    pad = jnp.broadcast_to(vpad[:, None, :], (b, g, p)).astype(xv.dtype)
    left = jax.lax.ppermute(
        xv[:, -g:], SP_AXIS, perm=[(i, i + 1) for i in range(n - 1)]
    )
    right = jax.lax.ppermute(
        xv[:, :g], SP_AXIS, perm=[(i + 1, i) for i in range(n - 1)]
    )
    left = jnp.where(idx == 0, pad, left)
    right = jnp.where(idx == n - 1, pad, right)
    parts = [left, xv, right]
    if hp > 1:
        outer = jnp.tile(pad, (1, hp - 1, 1))
        parts = [outer, *parts, outer]
    return jnp.concatenate(parts, axis=1)


def _zero_pad_row(scale, shift):
    """Per-lane input value v with scale·v + shift == 0 (ridge-regularized:
    degrades to v = 0 where scale ≈ 0, where the prologue output is the
    constant ``shift`` for every row anyway)."""
    return -shift * scale / (jnp.square(scale) + 1e-30)


def _resblock_rows_sp(p, packed, xv, temb, in_sums, *, f: int, c: int,
                      tile_t: int):
    """One residual block on the flat Pallas kernels over sharded-T rows.

    xv: [B, T_loc·G, P] row view; packed: the per-block dict from
    ``_pack_sp_weights`` (tap blocks packed OUTSIDE the shard_map body —
    and outside the sampler's scan, see ``sp_sampling_bundle``; int8 MXU
    taps when the production ``tap_int8`` knob selected them); in_sums:
    global [B, P] per-lane (sum, sum²) of xv. Mirrors
    ops.flat_resblock.resblock_flat with three differences: halo exchange
    (+ boundary pad rows) around each conv, GroupNorm affines from psum'd
    global sums (n = T_global·F·C/G elements per group), and stats computed
    as XLA passes on the cropped outputs instead of in-kernel (fused stats
    would count halo rows). Returns (out, out_sums).

    Reference math: Residual_Block (reference models/diffusion.py:12-56),
    time-sharded."""
    from ..ops.flat_resblock import GROUPS, _affine_c_from_sums_p
    from ..ops.pallas.conv_flat import conv3x3_flat, flat_period

    dtype = xv.dtype
    pp = flat_period(c)
    fpp = pp // c
    g = (f * c) // pp
    b, rows, _ = xv.shape
    t_loc = rows // g
    n = t_loc * jax.lax.axis_size(SP_AXIS) * f * (c // GROUPS)
    hp = tile_t // 2
    crop = (slice(None), slice(hp * g, (hp + t_loc) * g))

    w1, w2 = packed["w1"], packed["w2"]
    kw1 = kw2 = {}
    if "ws1" in packed:
        kw1 = {"mxu_int8": True, "w_scale": packed["ws1"]}
        kw2 = {"mxu_int8": True, "w_scale": packed["ws2"]}
    temb_p = jnp.tile(temb.astype(jnp.float32), (1, fpp))
    bias2_p = jnp.tile(p["conv2"]["b"].astype(jnp.float32), fpp)

    def pre_of(s1, s2, norm):
        sc, sh = _affine_c_from_sums_p(s1, s2, n, norm, c)
        return jnp.tile(sc, (1, fpp)), jnp.tile(sh, (1, fpp))

    pre1 = pre_of(*in_sums, p["norm1"])
    hv = conv3x3_flat(
        _halo_rows(xv, g, hp, _zero_pad_row(*pre1)), w1,
        c=c, f=f, rows_view=True, tile_t=tile_t,
        pre=pre1, pre_silu=True, add=temb_p, post_silu=True, **kw1,
    )[crop]
    pre2 = pre_of(*_psum_lane_sums(hv), p["norm2"])
    sv = conv3x3_flat(
        _halo_rows(hv, g, hp, _zero_pad_row(*pre2)), w2,
        c=c, f=f, rows_view=True, tile_t=tile_t,
        pre=pre2, pre_silu=False, add=bias2_p, post_silu=True, **kw2,
    )[crop]
    scale3, shift3 = _affine_c_from_sums_p(
        *_psum_lane_sums(sv), n, p["norm3"], c
    )
    out = (
        xv.astype(jnp.float32)
        + sv.astype(jnp.float32) * jnp.tile(scale3, (1, fpp))[:, None, :]
        + jnp.tile(shift3, (1, fpp))[:, None, :]
    ).astype(dtype)
    return out, _psum_lane_sums(out)


def _stage_blocks_sp_flat(stage, packed_stage, h, temb_iter, *, f: int,
                          c: int):
    """Run a stage's resblock chain on the flat kernels over sharded rows:
    one NHWC↔rows conversion pair per stage visit, global stats threaded
    between blocks like the single-device chain."""
    from ..ops.pallas.conv_flat import _pick_tile_t, flat_period

    b, t_loc, _, _ = h.shape
    pp = flat_period(c)
    g = (f * c) // pp
    tile_t = _pick_tile_t(t_loc, g, pp, jnp.dtype(h.dtype).itemsize)
    xv = h.reshape(b, t_loc * g, pp)
    sums = _psum_lane_sums(xv)
    for block, packed in zip(stage["blocks"], packed_stage):
        xv, sums = _resblock_rows_sp(
            block, packed, xv, next(temb_iter), sums, f=f, c=c, tile_t=tile_t
        )
    return xv.reshape(b, t_loc, f, c)


def _flat_stage_flags(cfg: ModelConfig, t_total: int, sp: int):
    """Per-stage static gate for the flat SP path: kernel size 3, local T
    even, geometry supported by the flat kernels on this backend."""
    from ..ops.pallas.conv_flat import supports_flat

    hw = jax.default_backend() == "tpu"
    flags = []
    for i, (c, krn) in enumerate(zip(cfg.ch, cfg.krn)):
        f_i = cfg.f_size >> i
        t_loc = t_total // (sp * (1 << i))
        flags.append(
            krn == 3 and t_loc % 2 == 0 and supports_flat(c, f_i, hw=hw)
        )
    return flags


def _pack_sp_weights(params, cfg: ModelConfig, flags):
    """Pre-pack the flat-stage conv tap blocks OUTSIDE the shard_map body
    (the packers' scatter chains inflate shard_map compile time by ~10×;
    packing is replicated-param work with no sharded inputs). Returns
    {"down": [stage_packs | None], "up": [...]}, each stage pack a list of
    per-block dicts {"w1", "w2"} in the compute dtype — plus {"ws1", "ws2"}
    per-lane dequant scales when ``cfg.tap_int8`` selects int8 MXU taps for
    the stage's width (the same production knob the single-device flat path
    applies; sp>1 sampling used to silently ignore it).

    Samplers should pack ONCE per params via ``sp_sampling_bundle`` and
    pass the result through ``apply_model_sp(packed=)`` — packing inside a
    sampler's scan body re-emits (and, unless XLA hoists it, re-executes)
    the scatter chains every step."""
    from ..ops.pallas.conv_flat import (
        pack_conv_weights,
        pack_conv_weights_int8,
        tap_int8_profitable,
    )

    dtype = cfg.dtype

    def pack_block(b, c):
        if bool(getattr(cfg, "tap_int8", False)) and tap_int8_profitable(c):
            w1, ws1 = pack_conv_weights_int8(b["conv1"]["w"])
            w2, ws2 = pack_conv_weights_int8(b["conv2"]["w"])
            return {"w1": w1, "w2": w2, "ws1": ws1, "ws2": ws2}
        return {"w1": pack_conv_weights(b["conv1"]["w"], dtype),
                "w2": pack_conv_weights(b["conv2"]["w"], dtype)}

    def pack_side(stages):
        side = []
        for i, stage in enumerate(stages):
            if not flags[i]:
                side.append(None)
                continue
            side.append([pack_block(b, cfg.ch[i]) for b in stage["blocks"]])
        return side

    return {
        "down": pack_side(params["down_modules"]["stages"]),
        "up": pack_side(params["up_modules"]["stages"]),
    }


# --------------------------------------------------------------- training
# Differentiable SP building blocks. Collectives inside gradient paths are
# wrapped in custom VJPs that EXECUTE their backward collectives directly:
# autodiff's own transpose of a raw ``psum`` over-counts by the axis size
# under shard_map(check_vma=False) (measured: exactly n× grads on the
# virtual mesh). The convention throughout is that per-device parameter
# cotangents are PARTIAL sums — the SP train step psums them exactly once
# at the end (training/train_step.py). ``ppermute``/slice/concat transpose
# correctly on their own (verified against single-device grads).


@jax.custom_vjp
def psum_keep_sp(v):
    """psum over sp whose backward treats the cotangent as replicated
    (identity) — downstream grads are per-device partials."""
    return jax.lax.psum(v, SP_AXIS)


def _pk_fwd(v):
    return psum_keep_sp(v), None


def _pk_bwd(_, g):
    return (g,)


psum_keep_sp.defvjp(_pk_fwd, _pk_bwd)


@jax.custom_vjp
def _gather_tokens_sp(z):
    """all_gather the (tiny) bottleneck token axis; backward sums every
    device's cotangent contribution at my token positions (psum + slice,
    executed — the replicated-transformer consumer gives each device a
    DIFFERENT full-length cotangent: only its own loss paths)."""
    return jax.lax.all_gather(z, SP_AXIS, axis=1, tiled=True)


def _gt_fwd(z):
    return _gather_tokens_sp(z), None


def _gt_bwd(_, g):
    n = jax.lax.axis_size(SP_AXIS)
    tt = g.shape[1] // n
    gsum = jax.lax.psum(g, SP_AXIS)
    i = _axis_index()
    return (jax.lax.dynamic_slice_in_dim(gsum, i * tt, tt, axis=1),)


_gather_tokens_sp.defvjp(_gt_fwd, _gt_bwd)


def _conv3x3_flat_sp_t(xf, w, add, *, c: int, f: int):
    """Differentiable stride-1 SAME conv over sharded T on the flat Pallas
    kernels: halo-exchange one t-step of rows (zeros at the global boundary
    — the conv input here is the post-GN/SiLU activation, which the
    reference zero-pads), run the whole-array custom-VJP conv
    (ops/flat_grad.conv3x3_flat_t) on the halo-extended block, crop. The
    halo plumbing (ppermute / where / concatenate / crop) is plain linear
    JAX that autodiff transposes correctly; one exchanged t-step suffices
    because the kernel's f-boundary masks kill the corner taps that would
    reach further (same argument as the inference path, _halo_rows)."""
    from ..ops.flat_grad import conv3x3_flat_t
    from ..ops.pallas.conv_flat import _pick_tile_t, flat_period

    b, t_loc, fc = xf.shape
    pp = flat_period(c)
    g = fc // pp
    tile_t = _pick_tile_t(t_loc, g, pp, jnp.dtype(xf.dtype).itemsize)
    hp = tile_t // 2
    xv = xf.reshape(b, t_loc * g, pp)
    xh = _halo_rows(xv, g, hp, jnp.zeros((b, pp), jnp.float32))
    out = conv3x3_flat_t(xh.reshape(b, t_loc + 2 * hp, fc), w, add, c=c)
    return out[:, hp : hp + t_loc]


def _resblock_sp_t(p, x, temb, *, krn: int, f: int, c: int, flat: bool):
    """Differentiable (train) residual block over sharded T. x: [B, T_loc,
    F, C] NHWC. GroupNorm runs the analytic custom VJP with globally psum'd
    statistics (ops/flat_grad.gn_flat sp_axis=); convs run the flat Pallas
    custom-VJP kernels with halo exchange when ``flat`` (else XLA halo
    convs). Mirrors ops.flat_grad.resblock_flat_train, time-sharded
    (reference Residual_Block, models/diffusion.py:12-56)."""
    from ..ops.flat_grad import gn_flat

    b, t_loc, _, _ = x.shape
    fc = f * c
    xf = x.reshape(b, t_loc, fc)
    temb_flat = jnp.tile(temb.astype(jnp.float32), (1, f))
    bias2_flat = jnp.tile(p["conv2"]["b"].astype(jnp.float32), f)

    def conv(pc_w, hf, add):
        if flat and krn == 3:
            return _conv3x3_flat_sp_t(hf, pc_w, add, c=c, f=f)
        h4 = hf.reshape(b, t_loc, f, c)
        out = _conv_same_sp({"w": pc_w}, h4, krn).reshape(b, t_loc, fc)
        add2 = add[None] if add.ndim == 1 else add
        return (out.astype(jnp.float32) + add2[:, None, :]).astype(hf.dtype)

    h = gn_flat(p["norm1"], xf, f=f, c=c, sp_axis=SP_AXIS)
    h = jax.nn.silu(h)
    h = conv(p["conv1"]["w"], h, temb_flat)
    h = jax.nn.silu(h)
    h = gn_flat(p["norm2"], h, f=f, c=c, sp_axis=SP_AXIS)
    h = conv(p["conv2"]["w"], h, bias2_flat)
    h = jax.nn.silu(h)
    h = gn_flat(p["norm3"], h, f=f, c=c, sp_axis=SP_AXIS)
    return (xf + h).reshape(b, t_loc, f, c)


def flat_train_flags(cfg: ModelConfig, t_total: int, sp: int):
    """Static per-stage gates for the flat-kernel SP TRAIN path — the same
    conv_impl gate as the single-device forward composed with the SP
    geometry checks (kernel 3, even local T, flat-supported width)."""
    use_flat = cfg.conv_impl == "pallas" or (
        cfg.conv_impl == "auto" and jax.default_backend() == "tpu"
    )
    if not use_flat:
        return tuple(False for _ in cfg.ch)
    return tuple(_flat_stage_flags(cfg, t_total, sp))


def sp_local_train_forward(params, x, t, rng, *, cfg: ModelConfig, flags):
    """Per-shard TRAIN forward (runs inside the SP train step's shard_map,
    training/train_step.py): x [B_loc, C, T_loc, F] → eps [B_loc, C, T_loc,
    F], differentiable end-to-end over sharded T. flags: per-stage static
    bools selecting the flat Pallas kernel path (``_flat_stage_flags``).
    Every collective in a gradient path is either transpose-safe (ppermute)
    or wrapped in a custom VJP; parameter grads come back as per-device
    partials. Reference train forward being scaled:
    runners/diffusion.py:130-199 + models/diffusion.py Model.forward."""
    compute_dtype = cfg.dtype
    x = jnp.transpose(x, (0, 2, 3, 1)).astype(compute_dtype)

    temb = beta_embedding_apply(
        params["temb"], t, num_timesteps=cfg.num_timesteps, dtype=jnp.float32
    )
    temb_iter = iter(jnp.split(temb, _split_points(cfg.embedding_sizes), axis=-1))

    def run_blocks(stage, krn, h, flat_ok):
        _, _, f_, c_ = h.shape
        block_fn = functools.partial(
            _resblock_sp_t, krn=krn, f=f_, c=c_, flat=flat_ok
        )
        if cfg.remat:
            block_fn = jax.checkpoint(block_fn)
        for block in stage["blocks"]:
            h = block_fn(block, h, next(temb_iter))
        return h

    hidden = []
    h = _conv_same_sp(params["down_modules"]["head"], x, 3)
    hidden.append(h)
    for stage, flat_ok, krn in zip(
        params["down_modules"]["stages"], flags, cfg.krn
    ):
        if "down" in stage:
            h = _down_conv_sp(stage["down"], h)
        h = run_blocks(stage, krn, h, flat_ok)
        hidden.append(h)

    b, tt, ff, cc = h.shape
    z = jnp.transpose(h, (0, 1, 3, 2)).reshape(b, tt, cc * ff)
    z_full = _gather_tokens_sp(z)
    z_full = transformer_module_apply(
        params["transformer"], z_full.astype(jnp.float32),
        tcfg=cfg.transformers, train=True, rng=rng,
    )
    idx = _axis_index()
    z = jax.lax.dynamic_slice_in_dim(z_full, idx * tt, tt, axis=1)
    h = jnp.transpose(
        z.reshape(b, tt, cc, ff), (0, 1, 3, 2)
    ).astype(compute_dtype)

    for stage, flat_ok, krn in zip(
        reversed(params["up_modules"]["stages"]),
        reversed(list(flags)),
        reversed(cfg.krn),
    ):
        h = h + hidden.pop()
        h = run_blocks(stage, krn, h, flat_ok)
        if "up" in stage:
            h = _up_conv_sp(stage["up"], h)
    h = h + hidden.pop()
    h = _conv_same_sp(params["up_modules"]["tail"], h, 3)

    return jnp.transpose(h, (0, 3, 1, 2)).astype(jnp.float32)


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


def _apply_model_sp_local(params, packed, x, t, cfg: ModelConfig):
    """Per-shard body (runs inside shard_map). x: [B, C, T_loc, F];
    packed: _pack_sp_weights output (None per stage ⇒ XLA resblocks)."""
    compute_dtype = cfg.dtype
    x = jnp.transpose(x, (0, 2, 3, 1)).astype(compute_dtype)

    temb = beta_embedding_apply(
        params["temb"], t, num_timesteps=cfg.num_timesteps, dtype=jnp.float32
    )
    temb_iter = iter(jnp.split(temb, _split_points(cfg.embedding_sizes), axis=-1))

    def run_blocks(stage, packed_stage, krn, h):
        _, _, f_, c_ = h.shape
        if packed_stage is not None:
            return _stage_blocks_sp_flat(
                stage, packed_stage, h, temb_iter, f=f_, c=c_
            )
        for block in stage["blocks"]:
            h = _resblock_sp(block, h, next(temb_iter), kernel_size=krn)
        return h

    hidden = []
    h = _conv_same_sp(params["down_modules"]["head"], x, 3)
    hidden.append(h)
    for stage, pstage, krn in zip(
        params["down_modules"]["stages"], packed["down"], cfg.krn
    ):
        if "down" in stage:
            h = _down_conv_sp(stage["down"], h)
        h = run_blocks(stage, pstage, krn, h)
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

    for stage, pstage, krn in zip(
        reversed(params["up_modules"]["stages"]),
        reversed(packed["up"]),
        reversed(cfg.krn),
    ):
        h = h + hidden.pop()
        h = run_blocks(stage, pstage, krn, h)
        if "up" in stage:
            h = _up_conv_sp(stage["up"], h)
    h = h + hidden.pop()
    h = _conv_same_sp(params["up_modules"]["tail"], h, 3)

    return jnp.transpose(h, (0, 3, 1, 2)).astype(jnp.float32)


def _sampling_flags(cfg: ModelConfig, t_total: int, sp: int):
    use_flat = cfg.conv_impl == "pallas" or (
        cfg.conv_impl == "auto" and jax.default_backend() == "tpu"
    )
    if use_flat:
        return _flat_stage_flags(cfg, t_total, sp)
    return [False] * len(cfg.ch)


def sp_sampling_bundle(params, cfg: ModelConfig, mesh, t_total: int):
    """Pack the SP forward's tap blocks ONCE per weight set, eagerly.

    Sampler loops call the denoise fn inside a ``lax.scan`` body; packing
    there re-emits the packers' scatter chains into every chunk program and
    re-executes them per scan step unless XLA's loop-invariant code motion
    hoists them. The runner packs here and threads the result through
    ``apply_model_sp(packed=)`` as an explicit scan-invariant argument."""
    flags = _sampling_flags(cfg, t_total, mesh.shape[SP_AXIS])
    return jax.jit(
        lambda p: _pack_sp_weights(p, cfg, flags)
    )(params)


def apply_model_sp(params, x, t, cfg: ModelConfig, mesh, *, packed=None,
                   train: bool = False, rng=None):
    """Sequence-parallel forward: x [B, C, T, F] sharded over T across the
    mesh's ``sp`` axis (and the batch over a ``dp`` axis when the mesh has
    one that divides B). T must divide evenly into sp × total-stride blocks.

    The resblock chains run on the flat Pallas kernels per shard when
    ``cfg.conv_impl`` selects them (same gate as the single-device forward:
    "pallas", or "auto" on a TPU backend). ``packed``: pre-packed tap
    blocks from ``sp_sampling_bundle`` (samplers MUST pass this — see its
    docstring). ``cfg.tap_int8`` is honored through the packs;
    ``cfg.act_store`` is NOT available on sp meshes (the int8 scale-stripe
    grids don't compose with halo exchange) — logged, activations stay in
    ``cfg.dtype``.

    ``train=True`` runs the differentiable SP forward instead
    (``sp_local_train_forward``: unfused custom-VJP kernels, psum'd
    GroupNorm, dropout rng) — used standalone for tests; the train STEP
    hosts the local forward inside its own shard_map
    (training/train_step.py)."""
    sp = mesh.shape[SP_AXIS]
    stride_total = 2 ** (len(cfg.ch) - 1)
    if x.shape[2] % (sp * stride_total) != 0:
        raise ValueError(
            f"T={x.shape[2]} must be divisible by sp×stride = "
            f"{sp * stride_total}"
        )
    if getattr(cfg, "act_store", None) and not globals().get("_as_warned"):
        import logging

        globals()["_as_warned"] = True
        logging.getLogger(__name__).warning(
            "sampling.act_store=%s is ignored on sp>1 meshes (no int8 "
            "activation storage across halo exchanges); running %s "
            "activations", cfg.act_store, cfg.dtype)
    dp = mesh.shape.get("dp", 1)
    bspec = "dp" if (dp > 1 and x.shape[0] % dp == 0) else None

    if train:
        flags = tuple(flat_train_flags(cfg, x.shape[2], sp))
        if rng is None:
            rng = jax.random.key(0)
        fn = jax.shard_map(
            functools.partial(
                lambda p, xx, tt, rr, cfg, flags: sp_local_train_forward(
                    p, xx, tt, rr, cfg=cfg, flags=flags),
                cfg=cfg, flags=flags),
            mesh=mesh,
            in_specs=(P(), P(bspec, None, SP_AXIS, None), P(bspec), P()),
            out_specs=P(bspec, None, SP_AXIS, None),
            check_vma=False,
        )
        return fn(params, x, t, rng)

    if packed is None:
        flags = _sampling_flags(cfg, x.shape[2], sp)
        packed = _pack_sp_weights(params, cfg, flags)

    fn = jax.shard_map(
        functools.partial(_apply_model_sp_local, cfg=cfg),
        mesh=mesh,
        in_specs=(P(), P(), P(bspec, None, SP_AXIS, None), P(bspec)),
        out_specs=P(bspec, None, SP_AXIS, None),
        check_vma=False,
    )
    return fn(params, packed, x, t)
