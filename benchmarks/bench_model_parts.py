#!/usr/bin/env python
"""Where does the forward go? Times each part of the full-flat forward at
the sampling scale [1, 2, 8192, 256] fp32: head/tail convs, per-stage fused
flat resblocks, every strided transition kernel, and the FNet bottleneck.

Tunnel-safe timing: chained lax.scan inside one jit, host-fetch sync,
measured per-call overhead subtracted (see ARCHITECTURE.md).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ddim_audio_tpu.config import load_config
from ddim_audio_tpu.models.layers import conv_apply
from ddim_audio_tpu.models.unet import ModelConfig, init_model
from ddim_audio_tpu.ops.flat_resblock import resblock_flat
from ddim_audio_tpu.ops.pallas.conv_strided import (
    conv_down_flat,
    conv_up_flat,
    pack_down_weights,
    pack_up_weights,
)

def time_op(name, op, x, iters=30):
    """op: x → same-shape x. Overhead-free two-length slope protocol
    (benchmarks/timing.py) with unit-RMS renormalized chaining; the renorm
    pass itself (~1 extra r+w of x) is included — subtract renorm_ms(x) for
    the op alone."""
    del iters
    from benchmarks.timing import op_ms

    ms = op_ms(op, x, renorm=True)
    print(f"{name:42s} {ms:8.3f} ms", flush=True)
    return ms


def main():
    dtype = jnp.float32 if len(sys.argv) < 2 else jnp.bfloat16
    dname = "fp32" if dtype == jnp.float32 else "bf16"
    print(f"dtype={dname} backend={jax.default_backend()}", flush=True)
    config = load_config(os.path.join(os.path.dirname(__file__), "..",
                                      "configs", "audio.yml"))
    cfg = ModelConfig.from_config(config)
    params = init_model(jax.random.key(0), cfg)
    key = jax.random.key(1)

    total = 0.0
    # head conv: [1, 8192, 256, 2] → C=32 (XLA NHWC)
    xh = jax.random.normal(key, (1, 8192, 256, 2), dtype)
    head_w = params["down_modules"]["head"]

    def head_op(x):
        o = conv_apply(head_w, x, padding=1)  # [1,8192,256,32]
        # fold back to input shape so the op chains: cheap slice
        return o[..., :2]

    total += time_op("head conv k3 2->32 (XLA, incl slice)", head_op, xh)

    # tail conv: C=32 → 2 then expand back
    xt = jax.random.normal(key, (1, 8192, 256, 32), dtype)
    tail_w = params["up_modules"]["tail"]

    def tail_op(x):
        o = conv_apply(tail_w, x, padding=1)  # [1,8192,256,2]
        return jnp.tile(o, (1, 1, 1, 16))

    total += time_op("tail conv k3 32->2 (XLA, incl tile)", tail_op, xt)

    # per-stage fused resblock (the model runs res[i]×2 of these per stage)
    f = cfg.f_size
    t = 8192
    blocks_ms = []
    for i, (c, res) in enumerate(zip(cfg.ch, cfg.res)):
        if i:
            t //= 2
            f //= 2
        stage = params["down_modules"]["stages"][i]
        block = stage["blocks"][0]
        temb = jax.random.normal(key, (1, c), jnp.float32)
        x = jax.random.normal(key, (1, t, f * c), dtype)

        def rb_op(x, block=block, temb=temb, f=f, c=c):
            return resblock_flat(block, x, temb, f=f, c=c)

        ms = time_op(f"s{i} resblock_flat [t={t} f={f} c={c}]", rb_op, x)
        blocks_ms.append(ms)
        total += ms * 2 * res

    # transitions
    f = cfg.f_size
    t = 8192
    prev = cfg.ch[0]
    for i, c in enumerate(cfg.ch[1:], start=1):
        stage_d = params["down_modules"]["stages"][i]
        stage_u = params["up_modules"]["stages"][i]
        x = jax.random.normal(key, (1, t, f * prev), dtype)
        w2d = pack_down_weights(stage_d["down"]["w"], dtype)
        w2u = pack_up_weights(stage_u["up"]["w"], dtype)
        bd, bu = stage_d["down"]["b"], stage_u["up"]["b"]

        def dn_op(xx, w2d=w2d, bd=bd, prev=prev, c=c, t=t):
            o = conv_down_flat(xx, w2d, bd, c_in=prev, c_out=c)
            # fold back to input shape so the op chains (fc_out ≤ fc_in ≤ 2·fc_out)
            return jnp.tile(o, (1, 2, 2))[:, :, : xx.shape[2]]

        total += time_op(
            f"down {prev}->{c} [t={t}] (incl retile)", dn_op, x)

        xu = jax.random.normal(key, (1, t // 2, (f // 2) * c), dtype)

        def up_op(xx, w2u=w2u, bu=bu, prev=prev, c=c):
            o = conv_up_flat(xx, w2u, bu, c_in=c, c_out=prev)
            return o[:, : xx.shape[1], : xx.shape[2]]

        total += time_op(
            f"up {c}->{prev} [t={t // 2}] (incl slice)", up_op, xu)
        t //= 2
        f //= 2
        prev = c

    # bottleneck transformer at [1, 256, 2048]
    from ddim_audio_tpu.models.fnet import transformer_module_apply

    z = jax.random.normal(key, (1, 256, 2048), jnp.float32)

    def tf_op(z):
        return transformer_module_apply(
            params["transformer"], z, tcfg=cfg.transformers, train=False,
            rng=None)

    total += time_op("FNet bottleneck [1,256,2048] ×12", tf_op, z)

    print(f"\nsum of parts (approx fwd, excl. skip adds/stats glue): "
          f"{total:.1f} ms")


if __name__ == "__main__":
    main()
