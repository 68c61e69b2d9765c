#!/usr/bin/env python
"""A/B the s0-scale transition + tail kernels: where do the measured
~3.1 ms (down 32->64 @ t=8192), ~1.7 ms (up 64->32) and ~1.4 ms (tail)
go?  Variants isolate want_stats, the fused residual, and the harness
glue (retile/renorm) so the kernel cost is read directly.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from benchmarks.timing import op_ms, renorm_ms
from ddim_audio_tpu.config import load_config
from ddim_audio_tpu.models.unet import ModelConfig, init_model
from ddim_audio_tpu.ops.pallas.conv_head_tail import (
    conv_tail_flat,
    pack_tail_weights,
)
from ddim_audio_tpu.ops.pallas.conv_strided import (
    conv_down_flat,
    conv_up_flat,
    pack_down_weights,
    pack_up_weights,
)


def main():
    config = load_config(os.path.join(os.path.dirname(__file__), "..",
                                      "configs", "audio.yml"))
    cfg = ModelConfig.from_config(config)
    import dataclasses

    cfg = dataclasses.replace(cfg, dtype=jnp.bfloat16)
    params = init_model(jax.random.key(0), cfg)
    key = jax.random.key(1)
    dt = jnp.bfloat16
    t, f, c0, c1 = 8192, 256, 32, 64
    print(f"backend={jax.default_backend()}", flush=True)

    x = jax.random.normal(key, (1, t, f * c0), dt)
    print(f"renorm [8192x8192]: {renorm_ms(x):.3f} ms", flush=True)

    sd = params["down_modules"]["stages"][1]
    su = params["up_modules"]["stages"][1]
    w2d = pack_down_weights(sd["down"]["w"], dt)
    w2u = pack_up_weights(su["up"]["w"], dt)

    # down, no stats, fold via cheap pad-reshape instead of tile
    def dn(xx, stats):
        r = conv_down_flat(xx, w2d, sd["down"]["b"], c_in=c0, c_out=c1,
                           want_stats=stats)
        o = r[0] if stats else r
        # [1, t/2, (f/2)·c1] has the same lane count as x: fold by
        # doubling t (one concat copy, identical for both variants)
        return jnp.concatenate([o, o], axis=1)

    for stats in (False, True):
        print(f"down 32->64 stats={stats}: "
              f"{op_ms(lambda v, s=stats: dn(v, s), x, renorm=True):.3f} ms",
              flush=True)

    xu = jax.random.normal(key, (1, t // 2, (f // 2) * c1), dt)
    res = jax.random.normal(jax.random.key(2), (1, t, f * c0), dt)

    def up(xx, stats, residual):
        r = conv_up_flat(xx, w2u, su["up"]["b"], c_in=c1, c_out=c0,
                         residual=res if residual else None,
                         want_stats=stats)
        o = r[0] if stats else r
        return o[:, : t // 2, : (f // 2) * c1]

    for stats, residual in ((False, False), (True, False), (True, True)):
        print(f"up 64->32 stats={stats} res={residual}: "
              f"{op_ms(lambda v, s=stats, r=residual: up(v, s, r), xu, renorm=True):.3f} ms",
              flush=True)

    # tail with/without residual
    tail = params["up_modules"]["tail"]
    wt = pack_tail_weights(tail["w"], f, dt)
    tb = tail["b"].astype(jnp.float32)

    def tl(xx, residual):
        o = conv_tail_flat(xx, wt, tb, c0=c0, c_out=2, f=f,
                           residual=res if residual else None)
        return jnp.tile(o, (1, 1, 16))

    for residual in (False, True):
        print(f"tail 32->2 res={residual}: "
              f"{op_ms(lambda v, r=residual: tl(v, r), x, renorm=True):.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
