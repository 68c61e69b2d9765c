"""Overhead-free TPU timing for this repo's benchmarks.

The axon tunnel adds a LARGE fixed cost to every jit invocation + host
fetch (measured ~1.5-3 ms, occasionally tens of ms) — any per-op number
derived from `total / iters` of a single chained call is polluted by
overhead/iters. Round-2 micro-benchmarks divided by 10-30 iters and were
off by ~1.4 ms/op, which mis-ranked every optimization (they concluded
"memory-bound at ~300 GB/s"; the true copy bandwidth is ~640 GB/s and the
hot convs are MXU/VPU-bound — see BASELINE.md round-3 revision).

Protocol here: time the SAME op chained at two lengths inside one jit and
take the slope (t(n2) - t(n1)) / (n2 - n1). The per-call constant cancels
exactly; elision is prevented because each iteration's input is the
previous output (data dependence) and the final value is host-fetched.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def _first_leaf(tree):
    return jax.tree_util.tree_leaves(tree)[0]


def _fetch(tree) -> float:
    leaf = _first_leaf(tree)
    return float(jnp.sum(jnp.abs(jnp.ravel(leaf)[:1])))


def _time_call(fn, x, reps: int) -> float:
    _fetch(fn(x))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        _fetch(fn(x))
        best = min(best, time.time() - t0)
    return best


def op_ms(op, x, *, n1: int = 10, n2: int = 50, reps: int = 5,
          renorm: bool = False) -> float:
    """Milliseconds per application of ``op`` (carry -> same shape/dtype
    carry, or a tuple whose FIRST element is the carry).

    renorm=True rescales the carry to unit RMS each iteration (use when
    ``op`` is not contraction-stable over ~n2 steps); the renormalize pass
    is timed too, so subtract `renorm_ms(x)` if you need the op alone.
    """
    def body(c, _):
        o = op(c)
        if isinstance(o, (tuple, list)):
            o = o[0]
        if renorm:
            o = o * jax.lax.rsqrt(jnp.mean(jnp.square(o.astype(jnp.float32)))
                                  + 1e-8).astype(o.dtype)
        return o, None

    def chain(n):
        return jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=n)[0])

    t1 = _time_call(chain(n1), x, reps)
    t2 = _time_call(chain(n2), x, reps)
    return (t2 - t1) / (n2 - n1) * 1e3


def renorm_ms(x, **kw) -> float:
    """Cost of the renorm pass alone (one read + one write of x)."""
    return op_ms(
        lambda v: v * jax.lax.rsqrt(
            jnp.mean(jnp.square(v.astype(jnp.float32))) + 1e-8
        ).astype(v.dtype),
        x, **kw)


def copy_bandwidth_gbps(nbytes: int = 256 << 20, dtype=jnp.float32) -> float:
    """Achieved HBM bandwidth of a 1r+1w elementwise pass."""
    n = nbytes // jnp.dtype(dtype).itemsize // 256
    x = jnp.ones((n, 256), dtype)
    mult = jnp.asarray(1.0078125, dtype)  # exactly representable in bf16
    ms = op_ms(lambda v: v * mult, x)
    return 2 * x.nbytes / ms * 1e3 / 1e9
