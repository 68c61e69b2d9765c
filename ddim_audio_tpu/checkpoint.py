"""Checkpoint / resume.

Capability parity with the reference's snapshot protocol
(``runners/diffusion.py:185-199,239-254,293-313``): a rolling ``ckpt`` plus
step-tagged ``ckpt_{step}`` every ``snapshot_freq`` steps and at step 1, and
a resume path — with the reference's resume bugs fixed by design (SURVEY.md
§2.20b/c: it saves only the *last* optimizer's state and reads a nonexistent
config section on resume; here the full TrainState pytree — params, every
optimizer state, EMA, step — round-trips losslessly).

Format: a single ``.npz`` whose keys are jax tree paths (via
``tree_flatten_with_path``), so any pytree — including optax namedtuple
states — serializes without pickling; loading requires a template with the
same structure (built by re-initializing model+optimizer) and fills its
leaves, validating shapes/dtypes.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def _flatten(tree):
    leaves, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {jax.tree_util.keystr(path): leaf for path, leaf in leaves}


def save_checkpoint(log_path: str, state, step: int, *, epoch: int = 0,
                    tag: str | None = None) -> str:
    """Writes ckpt_{step}.npz (or ckpt_{tag}.npz) and the rolling ckpt.npz."""
    os.makedirs(log_path, exist_ok=True)
    flat = _flatten(state)
    arrays = {k: np.asarray(v) for k, v in flat.items()}
    meta = {
        "step": int(step),
        "epoch": int(epoch),
        "num_leaves": len(arrays),
        "format": 1,
    }
    name = f"ckpt_{tag if tag is not None else step}.npz"
    path = os.path.join(log_path, name)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, __meta__=json.dumps(meta), **arrays)
    os.replace(tmp, path)

    rolling = os.path.join(log_path, "ckpt.npz")
    tmp = rolling + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, __meta__=json.dumps(meta), **arrays)
    os.replace(tmp, rolling)
    return path


def load_checkpoint(path: str, template):
    """Returns (state_like_template, meta_dict). Leaves are filled from the
    file by tree path; shape/dtype mismatches raise."""
    with np.load(path, allow_pickle=False) as data:
        meta = json.loads(str(data["__meta__"]))
        arrays = {k: data[k] for k in data.files if k != "__meta__"}

    leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    filled = []
    for key_path, leaf in leaves:
        key = jax.tree_util.keystr(key_path)
        if key not in arrays:
            raise KeyError(f"checkpoint missing leaf {key}")
        arr = arrays[key]
        want = np.shape(leaf)
        if tuple(arr.shape) != tuple(want):
            raise ValueError(
                f"checkpoint leaf {key} shape {arr.shape} != template {want}"
            )
        filled.append(jax.numpy.asarray(arr, dtype=np.asarray(leaf).dtype))
    extra = set(arrays) - {jax.tree_util.keystr(p) for p, _ in leaves}
    if extra:
        raise ValueError(f"checkpoint has unexpected leaves: {sorted(extra)[:5]}")
    return jax.tree_util.tree_unflatten(treedef, filled), meta


def checkpoint_path(log_path: str, ckpt_id=None) -> str:
    """Resolve the checkpoint file the reference would load
    (runners/diffusion.py:293-304): rolling by default, step-tagged when
    sampling.ckpt_id is set."""
    if ckpt_id is None:
        return os.path.join(log_path, "ckpt.npz")
    return os.path.join(log_path, f"ckpt_{ckpt_id}.npz")
