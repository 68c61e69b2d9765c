#!/usr/bin/env python
"""Per-op benchmark: flat-layout Pallas conv vs XLA NHWC conv, per stage.

Runs every audio.yml stage geometry at the [1, 2, 8192, 256] sampling scale
(T_i = 8192/2^i, F_i = 256/2^i, C_i = ch[i]) and reports ms per conv for
the XLA NHWC conv and the flat kernel, fp32 and bf16, after verifying
numerics vs lax.conv_general_dilated.

Timing rules for the axon tunnel (see ARCHITECTURE.md): chain REPS
data-dependent applications inside one jit and sync with a host fetch.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ddim_audio_tpu.models.layers import conv_apply
from ddim_audio_tpu.ops.pallas.conv_flat import (
    conv3x3_flat,
    flat_period,
    pack_conv_weights,
)

STAGES = [  # (T, F, C) at sampling scale
    (8192, 256, 32),
    (4096, 128, 64),
    (2048, 64, 96),
    (1024, 32, 128),
    (512, 16, 192),
    (256, 8, 256),
]
REPS = 60
_OVERHEAD = None


def call_overhead():
    """Measured fixed cost of one jit call + scalar host fetch through the
    axon tunnel (dispatch + RPC round trips) — subtracted from chain times."""
    global _OVERHEAD
    if _OVERHEAD is None:
        f = jax.jit(lambda x: jnp.sum(x * 1.000001))
        x = jnp.ones((8, 128), jnp.float32)
        float(f(x))
        ts = []
        for _ in range(5):
            t0 = time.time()
            float(f(x))
            ts.append(time.time() - t0)
        _OVERHEAD = min(ts)
        print(f"per-call tunnel overhead: {_OVERHEAD * 1e3:.1f} ms")
    return _OVERHEAD


def timed(fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(lambda o: o.block_until_ready(), out)
    best = float("inf")
    for _ in range(2):
        # host fetch to defeat early-return/elision through the tunnel
        t0 = time.time()
        out = fn(*args)
        float(jnp.sum(jnp.abs(out[0] if isinstance(out, tuple) else out)))
        best = min(best, time.time() - t0)
    return max(best - call_overhead(), 0.0), 0.0


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    for t, f, c in STAGES:
        p = flat_period(c)
        key = jax.random.key(c)
        for dtype in (jnp.float32, jnp.bfloat16):
            x = jax.random.normal(key, (1, t, f, c), dtype)
            w = (jax.random.normal(jax.random.key(1), (3, 3, c, c),
                                   jnp.float32) * 0.05).astype(dtype)
            bias = jnp.zeros((c,), jnp.float32)

            @jax.jit
            def xla_chain(x, w):
                def body(h, _):
                    h = conv_apply({"w": w}, h, padding=1)
                    return h * jax.lax.rsqrt(jnp.mean(h * h) + 1e-6), None
                return jax.lax.scan(body, x, None, length=REPS)[0]

            @jax.jit
            def flat_chain(xf, w):
                w2 = pack_conv_weights(w, dtype)
                def body(h, _):
                    h = conv3x3_flat(h, w2, c=c)
                    return h * jax.lax.rsqrt(jnp.mean(h * h) + 1e-6), None
                return jax.lax.scan(body, xf, None, length=REPS)[0]

            # numerics (single application, fp32 only)
            if dtype == jnp.float32:
                ref = conv_apply({"w": w}, x, padding=1)
                got = conv3x3_flat(
                    x.reshape(1, t, f * c), pack_conv_weights(w, dtype), c=c
                ).reshape(1, t, f, c)
                err = float(jnp.max(jnp.abs(ref - got)))
            else:
                err = float("nan")

            xf = x.reshape(1, t, f * c)
            dt_x, _ = timed(xla_chain, x, w)
            dt_f, _ = timed(flat_chain, xf, w)
            name = "fp32" if dtype == jnp.float32 else "bf16"
            print(
                f"T={t:5d} F={f:3d} C={c:3d} P={p:3d} {name}: "
                f"xla {dt_x / REPS * 1e3:7.2f} ms  flat {dt_f / REPS * 1e3:7.2f} ms "
                f"({dt_x / dt_f:4.2f}x)  maxerr={err:.2e}",
                flush=True,
            )


if __name__ == "__main__":
    main()
