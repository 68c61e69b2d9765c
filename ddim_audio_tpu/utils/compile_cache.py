"""Persistent XLA compile cache, shared by every entry point.

Remote-TPU compilation through the axon tunnel is expensive (the 100-step
sampler program measured ~17 min cold, round 4), and has TWO caching layers
with different lifetimes:

- the JAX client persistent cache (this module): stores the serialized
  executable on local disk; a hit skips the whole remote Compile RPC
  (measured: the 35 MB sampler executable deserializes in ~2 s).
- the tunnel server's own kernel cache: cross-process but with a finite
  TTL (measured round 5: a process started ~10 min after a run pays ~85 s
  of first-execution warm-up instead of ~7 min; ~50 min after, it pays
  the full cost again). Nothing client-side can pin it — bench runs
  should therefore be preceded by a warm-up run when possible.

The cache directory deliberately lives OUTSIDE the repo tree: round 4 kept
it at ``<repo>/.jax_cache`` (gitignored), so any ``git clean -xfd`` started
every bench from a cold cache — the round-4 driver benchmark timed out
exactly that way (VERDICT round 4, Missing #1).
"""

import os

# outside the repo so `git clean` cannot wipe it; overridable for tests
DEFAULT_CACHE_DIR = os.environ.get(
    "DDIM_JAX_CACHE_DIR", os.path.expanduser("~/.ddim_jax_cache")
)


def enable_persistent_cache(cache_dir: str | None = None) -> None:
    """Point JAX's persistent compilation cache at a git-clean-proof dir.

    Safe to call multiple times / before or after backend init; failures
    (read-only fs, old jax) degrade to no caching rather than erroring.
    """
    import jax

    path = cache_dir or DEFAULT_CACHE_DIR
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
