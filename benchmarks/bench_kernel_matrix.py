#!/usr/bin/env python
"""Overhead-free kernel matrix: every stage geometry x every conv variant,
measured with the two-length slope protocol (benchmarks/timing.py) so the
axon tunnel's per-call constant cannot pollute per-op numbers.

Variants per stage (production-fused conv: GN prologue + SiLU + add +
post-SiLU + stats epilogue):
  bf16      9-tap taps, bf16 storage           (production sampling dtype)
  fp32      6-pass rolled taps, fp32 storage   (fpp >= 2 stages)
  mxu_int8  int8 x int8 -> int32 taps, bf16 storage
  int8rb    whole resblock with int8 activation storage (per-tile scales)

Plus: bf16 resblock, strided transitions, head conv, raw copy bandwidth.

Usage: python benchmarks/bench_kernel_matrix.py [section ...]
  sections: copy conv resblock strided   (default: all)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from benchmarks.timing import copy_bandwidth_gbps, op_ms
from ddim_audio_tpu.ops.flat_resblock import resblock_flat, resblock_flat_int8
from ddim_audio_tpu.ops.pallas.conv_flat import (
    conv3x3_flat,
    flat_period,
    pack_conv_weights,
    pack_conv_weights_int8,
    supports_flat_int8,
)
from ddim_audio_tpu.ops.pallas.conv_strided import (
    conv_down_flat,
    conv_up_flat,
    pack_down_weights,
    pack_up_weights,
)

STAGES = [  # (t, f, c) of every audio.yml stage at sampling scale
    (8192, 256, 32),
    (4096, 128, 64),
    (2048, 64, 96),
    (1024, 32, 128),
    (512, 16, 192),
    (256, 8, 256),
]


def stage_x(t, f, c, dtype):
    p = flat_period(c)
    g = f * c // p
    key = jax.random.key(t + c)
    return jax.random.normal(key, (1, t * g, p), dtype), p, g


def fused_conv_op(wp, c, f, p, **kw):
    pre = (jnp.ones((1, p), jnp.float32) * 0.98,
           jnp.zeros((1, p), jnp.float32))
    add = jnp.zeros((1, p), jnp.float32)

    def op(v):
        return conv3x3_flat(v, wp, c=c, f=f, rows_view=True, pre=pre,
                            pre_silu=True, add=add, post_silu=True,
                            want_stats=True, **kw)
    return op


def section_copy():
    for dt, nm in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        print(f"copy {nm} 256MB: {copy_bandwidth_gbps(dtype=dt):.0f} GB/s",
              flush=True)


def section_conv():
    print(f"{'stage':26s} {'bf16':>8s} {'fp32':>8s} {'mxu_int8':>9s}"
          f"  (ms, fused conv; GB/s-eq of 2x bf16 bytes)", flush=True)
    for t, f, c in STAGES:
        w = jax.random.normal(jax.random.key(c), (3, 3, c, c),
                              jnp.float32) * (0.3 / c) ** 0.5
        xb, p, g = stage_x(t, f, c, jnp.bfloat16)
        row = {}
        row["bf16"] = op_ms(fused_conv_op(
            pack_conv_weights(w, jnp.bfloat16), c, f, p), xb)
        x32 = xb.astype(jnp.float32)
        row["fp32"] = op_ms(fused_conv_op(
            pack_conv_weights(w, jnp.float32), c, f, p), x32)
        wq, ws = pack_conv_weights_int8(w)
        row["mxu_int8"] = op_ms(fused_conv_op(
            wq, c, f, p, mxu_int8=True, w_scale=ws), xb)
        gbps = 2 * xb.nbytes / row["bf16"] * 1e3 / 1e9
        print(f"s[c={c:3d} t={t:4d} f={f:3d}]       "
              f"{row['bf16']:8.3f} {row['fp32']:8.3f} {row['mxu_int8']:9.3f}"
              f"  ({gbps:.0f} GB/s bf16)", flush=True)


def section_resblock():
    import time

    from benchmarks.timing import _fetch, _time_call

    print("resblocks (ms):", flush=True)
    for t, f, c in STAGES:
        key = jax.random.key(c)
        blk = {
            "norm1": {"g": jnp.ones((c,)), "b": jnp.zeros((c,))},
            "norm2": {"g": jnp.ones((c,)), "b": jnp.zeros((c,))},
            "norm3": {"g": jnp.ones((c,)) * 0.1},
            "conv1": {"w": jax.random.normal(key, (3, 3, c, c)) * 0.02,
                      "b": jnp.zeros((c,))},
            "conv2": {"w": jax.random.normal(key, (3, 3, c, c)) * 0.02,
                      "b": jnp.zeros((c,))},
        }
        temb = jax.random.normal(key, (1, c), jnp.float32)
        xb, p, g = stage_x(t, f, c, jnp.bfloat16)
        ms_b = op_ms(lambda v: resblock_flat(blk, v, temb, f=f, c=c,
                                             rows_io=True), xb)

        # int8-storage resblock: carry (int8 x, scales, stats) through scan
        if supports_flat_int8(c, f):
            def chain_i8(n):
                def body(carry, _):
                    xq, sc, st = carry
                    o, osc, ost = resblock_flat_int8(
                        blk, xq, temb, f=f, c=c, in_stats=st, in_scales=sc,
                        quant_out=True, want_out_stats=True)
                    return (o, osc, ost), None

                def run(x0):
                    xf = x0.astype(jnp.float32)
                    st = (jnp.sum(xf, axis=1),
                          jnp.einsum("brk,brk->bk", xf, xf))
                    o, osc, ost = resblock_flat_int8(
                        blk, x0, temb, f=f, c=c, in_stats=st,
                        quant_out=True, want_out_stats=True)
                    (o, osc, ost), _ = jax.lax.scan(
                        body, (o, osc, ost), None, length=n)
                    return o
                return jax.jit(run)

            t1 = _time_call(chain_i8(10), xb, 5)
            t2 = _time_call(chain_i8(50), xb, 5)
            ms_i = (t2 - t1) / 40 * 1e3
            i8 = f"{ms_i:8.3f}"
        else:
            i8 = "     n/a"
        print(f"s[c={c:3d}] bf16 {ms_b:8.3f}  int8 {i8}", flush=True)


def section_strided():
    print("strided transitions (ms, bf16, fused stats/residual):", flush=True)
    chs = [32, 64, 96, 128, 192, 256]
    t, f = 8192, 256
    for i in range(1, len(chs)):
        ci, co = chs[i - 1], chs[i]
        w_d = jax.random.normal(jax.random.key(i), (4, 4, ci, co)) * 0.02
        w_u = jax.random.normal(jax.random.key(i), (4, 4, co, ci)) * 0.02
        b_d = jnp.zeros((co,))
        b_u = jnp.zeros((ci,))
        w2d = pack_down_weights(w_d, jnp.bfloat16)
        w2u = pack_up_weights(w_u, jnp.bfloat16)
        x = jax.random.normal(jax.random.key(7), (1, t, f * ci), jnp.bfloat16)
        xu = jax.random.normal(jax.random.key(8), (1, t // 2, (f // 2) * co),
                               jnp.bfloat16)
        res = jax.random.normal(jax.random.key(9), (1, t, f * ci),
                                jnp.bfloat16)

        def dn_up(v):
            h, s1, s2 = conv_down_flat(v, w2d, b_d, c_in=ci, c_out=co,
                                       want_stats=True)
            return conv_up_flat(h, w2u, b_u, c_in=co, c_out=ci, residual=v)

        ms_pair = op_ms(dn_up, x)
        bytes_pair = (2 * x.nbytes  # down r+w approx (in + half out)
                      + 2 * x.nbytes)  # up r+w + residual
        print(f"down+up {ci:3d}<->{co:3d} [t={t}]: {ms_pair:8.3f} ms "
              f"(~{bytes_pair / ms_pair * 1e3 / 1e9:.0f} GB/s eq)", flush=True)
        t //= 2
        f //= 2


if __name__ == "__main__":
    sections = sys.argv[1:] or ["copy", "conv", "resblock", "strided"]
    for s in sections:
        print(f"== {s} ==", flush=True)
        {"copy": section_copy, "conv": section_conv,
         "resblock": section_resblock, "strided": section_strided}[s]()
