#!/usr/bin/env python
"""PRODUCTION-path per-part forward profile at sampling scale
[1, 2, 8192, 256]: times every op exactly as `_apply_model_flat_core`
dispatches it under the audio.yml production config (bf16 compute,
tap_int8 where profitable, rows_io resblock chaining, asymmetric
head/tail, slim strided transitions with fused residual+stats).

Unlike bench_model_parts.py (which times the plain float kernels), the
sums here should reconcile with the measured ~29.5 ms production forward
(benchmarks/bench_prod_matrix.py) to within the per-stage glue.

Overhead-free two-length slope protocol (benchmarks/timing.py); the
renorm pass is included per op (subtract renorm_ms for the op alone —
printed per geometry).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from benchmarks.timing import op_ms, renorm_ms
from ddim_audio_tpu.config import load_config
from ddim_audio_tpu.models.fnet import transformer_module_apply
from ddim_audio_tpu.models.unet import ModelConfig, init_model
from ddim_audio_tpu.ops.flat_resblock import resblock_flat
from ddim_audio_tpu.ops.pallas.conv_flat import (
    flat_period,
    pack_conv_weights,
    tap_int8_profitable,
)
from ddim_audio_tpu.ops.pallas.conv_head_tail import (
    conv_head_flat,
    conv_tail_flat,
    pack_head_weights,
    pack_tail_weights,
)
from ddim_audio_tpu.ops.pallas.conv_strided import (
    conv_down_flat,
    conv_up_flat,
    pack_down_weights,
    pack_up_weights,
)


# Achieved 1r+1w HBM bandwidth on this chip (slope protocol, BASELINE.md
# round 3 — ~80% of the v5e's 819 GB/s paper number).
ACHIEVED_BW = 650e9


def row(name, ms, mult, acc, nbytes=None, mech=""):
    """One table line. nbytes = the op's INTRINSIC HBM traffic (kernel
    reads + writes, excluding the harness renorm pass — subtract the
    printed renorm_ms from `ms` before comparing against the floor);
    mech = the named mechanism that binds when measured ≫ floor."""
    acc.append(ms * mult)
    if nbytes is None:
        print(f"{name:46s} {ms:8.3f} ms  x{mult:<3d} = {ms * mult:7.3f} ms",
              flush=True)
        return
    floor = nbytes / ACHIEVED_BW * 1e3
    acc_floor.append(floor * mult)
    print(
        f"{name:46s} {ms:8.3f} ms  x{mult:<3d} = {ms * mult:7.3f} ms"
        f" | floor {floor:6.3f} ms ({nbytes / 2**20:6.1f} MiB)"
        f"  x{ms / floor:4.1f}  {mech}",
        flush=True,
    )


def main():
    config = load_config(os.path.join(os.path.dirname(__file__), "..",
                                      "configs", "audio.yml"))
    cfg = ModelConfig.from_config(config)
    # production sampling overrides (config.production_eval_cfg applies
    # sampling.dtype/tap_int8 onto the model cfg; audio.yml defaults)
    compute_dtype = jnp.bfloat16
    cfg = cfg.replace(dtype=compute_dtype) if hasattr(cfg, "replace") else cfg
    try:
        import dataclasses

        cfg = dataclasses.replace(cfg, dtype=compute_dtype, tap_int8=True)
    except TypeError:
        pass
    params = init_model(jax.random.key(0), cfg)
    key = jax.random.key(1)
    bsz = 1
    print(f"backend={jax.default_backend()} dtype=bf16 tap_int8=True",
          flush=True)

    parts = []
    global acc_floor
    acc_floor = []

    # --- head (production asymmetric kernel, want_stats) ---------------
    f, c0, cin, t = cfg.f_size, cfg.ch[0], cfg.channels, 8192
    head = params["down_modules"]["head"]
    xh = jax.random.normal(key, (bsz, t, f * cin), compute_dtype)
    wh = pack_head_weights(head["w"], compute_dtype)
    hb = head["b"].astype(jnp.float32)

    def head_op(x):
        o, _, _ = conv_head_flat(x, wh, hb, c_in=cin, c0=c0, f=f,
                                 want_stats=True)
        return o.reshape(bsz, t, f * c0)[:, :, : f * cin]

    head_bytes = 2 * t * f * (cin + c0)
    row("head conv 2->32 (asym, stats)", op_ms(head_op, xh, renorm=True),
        1, parts, nbytes=head_bytes,
        mech="sparse wide-contraction taps (alignment-padded)")

    # --- tail (production asymmetric kernel, fused residual) -----------
    tail = params["up_modules"]["tail"]
    xt = jax.random.normal(key, (bsz, t, f * c0), compute_dtype)
    res_t = jax.random.normal(jax.random.key(3), (bsz, t, f * c0),
                              compute_dtype)
    wt = pack_tail_weights(tail["w"], f, compute_dtype)
    tb = tail["b"].astype(jnp.float32)

    def tail_op(x):
        o = conv_tail_flat(x, wt, tb, c0=c0, c_out=cin, f=f, residual=res_t)
        return jnp.tile(o, (1, 1, c0 // cin))

    tail_bytes = 2 * t * f * (2 * c0 + cin)
    row("tail conv 32->2 (asym, +res, incl tile)",
        op_ms(tail_op, xt, renorm=True), 1, parts, nbytes=tail_bytes,
        mech="sparse 2048-wide tap dots (0.2% dense) + in-VMEM "
             "assembly adds; harness tile adds +2S")

    # --- per-stage resblocks (production: rows_io + tap_int8) ----------
    ff, tt = cfg.f_size, 8192
    for i, (c, res) in enumerate(zip(cfg.ch, cfg.res)):
        if i:
            tt //= 2
            ff //= 2
        block = params["down_modules"]["stages"][i]["blocks"][0]
        temb = jax.random.normal(key, (bsz, c), jnp.float32)
        p = flat_period(c)
        g = ff * c // p
        xv = jax.random.normal(key, (bsz, tt * g, p), compute_dtype)
        tap8 = bool(cfg.tap_int8) and tap_int8_profitable(c)

        def rb_op(x, block=block, temb=temb, ff=ff, c=c, tap8=tap8):
            o, _ = resblock_flat(block, x, temb, f=ff, c=c, in_stats=None,
                                 want_out_stats=True, rows_io=True,
                                 tap_int8=tap8)
            return o

        ms = op_ms(rb_op, xv, renorm=True)
        rn = renorm_ms(xv)
        s_bytes = 2 * tt * ff * c  # one full activation pass, bf16
        # 2*res resblocks per stage (res down + res up)
        row(f"s{i} resblock [t={tt} f={ff} c={c}] int8={int(tap8)} "
            f"(renorm {rn:.3f})", ms, 2 * res, parts, nbytes=7 * s_bytes,
            mech=("padded 9-tap MXU passes + in-kernel VPU (prologue/"
                  "epilogue)" if flat_period(c) > c
                  else "small-op latency; MXU taps"))

    # --- strided transitions (production: slim + stats, up has residual)
    ff, tt = cfg.f_size, 8192
    prev = cfg.ch[0]
    for i, c in enumerate(cfg.ch[1:], start=1):
        stage_d = params["down_modules"]["stages"][i]
        stage_u = params["up_modules"]["stages"][i]
        x = jax.random.normal(key, (bsz, tt, ff * prev), compute_dtype)
        w2d = pack_down_weights(stage_d["down"]["w"], compute_dtype)
        w2u = pack_up_weights(stage_u["up"]["w"], compute_dtype)
        bd, bu = stage_d["down"]["b"], stage_u["up"]["b"]

        def dn_op(xx, w2d=w2d, bd=bd, prev=prev, c=c):
            o, _, _ = conv_down_flat(xx, w2d, bd, c_in=prev, c_out=c,
                                     want_stats=True)
            # restore the carry shape: double t (contiguous concat copy —
            # lane-dimension jnp.tile measured ~1.9 ms of pure harness cost
            # here), then slice/pad lanes when c_out/c_in ≠ 2 changes the
            # lane count (e.g. 64→96)
            o = jnp.concatenate([o, o], axis=1)
            lanes = xx.shape[2]
            if o.shape[2] >= lanes:
                o = o[:, :, :lanes]
            else:
                o = jnp.concatenate(
                    [o, o[:, :, : lanes - o.shape[2]]], axis=2)
            return o

        dn_bytes = 2 * tt * ff * prev + 2 * (tt // 2) * (ff // 2) * c
        row(f"down {prev}->{c} [t={tt}] (stats, incl fold)",
            op_ms(dn_op, x, renorm=True), 1, parts, nbytes=dn_bytes,
            mech="12-tap banded de-interleave; harness fold adds +2S_out")

        xu = jax.random.normal(key, (bsz, tt // 2, (ff // 2) * c),
                               compute_dtype)
        res_u = jax.random.normal(jax.random.key(4), (bsz, tt, ff * prev),
                                  compute_dtype)

        def up_op(xx, w2u=w2u, bu=bu, prev=prev, c=c, res_u=res_u):
            o, _, _ = conv_up_flat(xx, w2u, bu, c_in=c, c_out=prev,
                                   residual=res_u, want_stats=True)
            return o[:, : xx.shape[1], : xx.shape[2]]

        up_bytes = (2 * (tt // 2) * (ff // 2) * c
                    + 2 * 2 * tt * ff * prev)
        row(f"up {c}->{prev} [t={tt // 2}] (+res, stats, incl slice)",
            op_ms(up_op, xu, renorm=True), 1, parts, nbytes=up_bytes,
            mech="residual read+write dominate; banded interleave")
        tt //= 2
        ff //= 2
        prev = c

    # --- bottleneck: transposes + FNet ----------------------------------
    cc = cfg.ch[-1]
    zf = jax.random.normal(key, (bsz, tt, ff * cc), compute_dtype)

    def mid_op(hf):
        z = hf.reshape(bsz, tt, ff, cc).transpose(0, 1, 3, 2)
        z = z.reshape(bsz, tt, cc * ff).astype(jnp.float32)
        z = transformer_module_apply(params["transformer"], z,
                                     tcfg=cfg.transformers, train=False,
                                     rng=None)
        return (z.reshape(bsz, tt, cc, ff).transpose(0, 1, 3, 2)
                .reshape(bsz, tt, ff * cc).astype(compute_dtype))

    n_layers = int(cfg.transformers.kwargs.num_hidden_layers)
    act = 4 * tt * cc * ff
    mlp_ratio = (cfg.transformers.kwargs.intermediate_size
                 / cfg.transformers.kwargs.hidden_size)
    fnet_bytes = int(27.3e6 * 4 + n_layers * act * (4 + 2 * mlp_ratio)
                     + 4 * act)
    row(f"bottleneck FNet x12 + transposes [t={tt}]",
        op_ms(mid_op, zf, renorm=True), 1, parts, nbytes=fnet_bytes,
        mech="weight read + small-matmul latency (fp32, 2048-dim)")

    print(f"\nsum of production parts: {sum(parts):.2f} ms "
          f"(vs measured full forward ~29.5 ms; gap = skip adds at "
          f"bottleneck scale + sampler-side glue + renorm inflation)",
        flush=True)
    print(f"sum of bytes floors: {sum(acc_floor):.2f} ms at 650 GB/s "
          f"(intrinsic kernel reads+writes only; measured rows include "
          f"the renorm pass + harness glue)", flush=True)


if __name__ == "__main__":
    main()
