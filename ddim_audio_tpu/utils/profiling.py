"""Profiling / timing harness (SURVEY.md §5: the reference has no tracing at
all — its only signal is a tqdm bar; here: jax.profiler traces + a timing
harness that is correct on remote-TPU tunnels).

Two hard-won rules for this environment (see .claude/skills/verify/SKILL.md):
``block_until_ready`` can return early through the axon tunnel, and repeated
byte-identical executions may be elided — so timings must (a) chain work
inside one jit or make successive calls data-dependent and (b) synchronize
with a host fetch.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


def sync(tree) -> float:
    """Honest device sync: host-fetch a reduction over every leaf."""
    total = 0.0
    for leaf in jax.tree_util.tree_leaves(tree):
        total += float(jnp.sum(jnp.abs(jnp.ravel(leaf)[:1])))
    return total


def time_chained(op, x0, *, iters: int = 10, iters2: int = 50) -> float:
    """Milliseconds per application of ``op`` (x → x, same shape/dtype),
    measured as the SLOPE between two jitted lax.scan chain lengths:
    (t(iters2) − t(iters)) / (iters2 − iters). The per-call tunnel constant
    (measured at ~1.5-30 ms on axon — large enough to have mis-ranked
    whole optimization rounds when amortized as total/iters) cancels
    exactly; elision cannot occur because each iteration consumes the
    previous output and the result is host-fetched."""
    def chain(n):
        return jax.jit(
            lambda x: jax.lax.scan(lambda c, _: (op(c), None), x, None,
                                   length=n)[0]
        )

    def best_of(fn, reps=3):
        sync(fn(x0))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            out = fn(x0)
            sync(out)
            best = min(best, time.time() - t0)
        return best

    t1 = best_of(chain(iters))
    t2 = best_of(chain(iters2))
    return (t2 - t1) / (iters2 - iters) * 1e3


def time_fn(fn, *args, iters: int = 5) -> float:
    """Milliseconds per call for non-chainable functions; runs are made
    data-independent of each other only through their (identical) args, so
    the first timed call follows a sync and each run host-fetches."""
    out = fn(*args)
    sync(out)
    times = []
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        sync(out)
        times.append(time.time() - t0)
    return min(times) * 1e3


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace"):
    """jax.profiler trace context; view with tensorboard or xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
