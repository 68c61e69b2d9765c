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


def row(name, ms, mult, acc):
    acc.append(ms * mult)
    print(f"{name:46s} {ms:8.3f} ms  x{mult:<3d} = {ms * mult:7.3f} ms",
          flush=True)


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

    row("head conv 2->32 (asym, stats)", op_ms(head_op, xh, renorm=True),
        1, parts)

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

    row("tail conv 32->2 (asym, +res, incl tile)",
        op_ms(tail_op, xt, renorm=True), 1, parts)

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
        # 2*res resblocks per stage (res down + res up)
        row(f"s{i} resblock [t={tt} f={ff} c={c}] int8={int(tap8)} "
            f"(renorm {rn:.3f})", ms, 2 * res, parts)

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
            # [B, t/2, (f/2)·c_out] has the same lane count as xx: fold
            # by doubling t (one contiguous concat copy — lane-dimension
            # jnp.tile measured ~1.9 ms of pure harness cost here)
            return jnp.concatenate([o, o], axis=1)

        row(f"down {prev}->{c} [t={tt}] (stats, incl fold)",
            op_ms(dn_op, x, renorm=True), 1, parts)

        xu = jax.random.normal(key, (bsz, tt // 2, (ff // 2) * c),
                               compute_dtype)
        res_u = jax.random.normal(jax.random.key(4), (bsz, tt, ff * prev),
                                  compute_dtype)

        def up_op(xx, w2u=w2u, bu=bu, prev=prev, c=c, res_u=res_u):
            o, _, _ = conv_up_flat(xx, w2u, bu, c_in=c, c_out=prev,
                                   residual=res_u, want_stats=True)
            return o[:, : xx.shape[1], : xx.shape[2]]

        row(f"up {c}->{prev} [t={tt // 2}] (+res, stats, incl slice)",
            op_ms(up_op, xu, renorm=True), 1, parts)
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

    row(f"bottleneck FNet x12 + transposes [t={tt}]",
        op_ms(mid_op, zf, renorm=True), 1, parts)

    print(f"\nsum of production parts: {sum(parts):.2f} ms "
          f"(vs measured full forward ~29.5 ms; gap = skip adds at "
          f"bottleneck scale + sampler-side glue + renorm inflation)",
        flush=True)


if __name__ == "__main__":
    main()
