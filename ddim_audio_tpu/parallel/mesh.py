"""Device mesh + sharding helpers.

The reference is strictly single-device (SURVEY.md §2: no DP/TP/PP/SP, only
commented-out DataParallel); every parallel capability here is new and
TPU-first: a ``jax.sharding.Mesh`` over ICI with

- **dp**: batch sharding — training batches and batched sampling shard their
  leading axis; XLA inserts the gradient psum automatically from sharding
  constraints (no hand-written collectives),
- **sp**: time-axis sharding for long clips (shard_map halo-exchange convs +
  gathered FNet bottleneck — see parallel/sp.py).

Params are replicated across the mesh; with 47M params that is the right
trade (DP gradients ride one psum over ICI).
"""

from __future__ import annotations

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(parallel_cfg=None):
    """Mesh from config.parallel {dp, sp}; None when 1×1 (single device)."""
    dp = int(getattr(parallel_cfg, "dp", 1) or 1) if parallel_cfg else 1
    sp = int(getattr(parallel_cfg, "sp", 1) or 1) if parallel_cfg else 1
    if dp * sp <= 1:
        return None
    n = jax.device_count()
    if dp * sp > n:
        raise ValueError(f"mesh dp×sp = {dp}×{sp} needs {dp*sp} devices, have {n}")
    devices = mesh_utils.create_device_mesh((dp, sp), jax.devices()[: dp * sp])
    return Mesh(devices, ("dp", "sp"))


def shard_batch(mesh, x, *, time_axis=None):
    """Shard the leading (batch) axis over dp; with ``time_axis`` also
    shard that axis over sp (the explicit SP train step's input layout).
    Axes that don't divide evenly stay replicated."""
    if mesh is None:
        return x
    spec = [None] * x.ndim
    if "dp" in mesh.shape and x.shape[0] % mesh.shape["dp"] == 0:
        spec[0] = "dp"
    if (
        time_axis is not None
        and mesh.shape.get("sp", 1) > 1
        and x.shape[time_axis] % mesh.shape["sp"] == 0
    ):
        spec[time_axis] = "sp"
    while spec and spec[-1] is None:  # canonical form (P("dp") == target)
        spec.pop()
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def shard_params(mesh, params):
    """Replicate parameters across the whole mesh."""
    if mesh is None:
        return params
    spec = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda p: jax.device_put(p, spec), params)
