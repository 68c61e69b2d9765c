"""Config loading.

Same YAML schema as the reference ``configs/audio.yml`` (anchors included),
loaded with ``yaml.safe_load`` and converted to nested namespaces
(reference ``main.py:97-100`` + ``utils.py:4-12``). Differences, by design:

- no executable config strings — the reference instantiates its transformer
  via ``exec``/``eval`` (``models/diffusion.py:153-155``); here encoders and
  optimizers are selected from explicit registries by name.
- dtypes are jax dtype names ("float32"/"bfloat16"), not torch tensor types.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import yaml

from .utils.namespace import dict2namespace, namespace2dict

_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
    # Accept the reference's torch spellings for drop-in configs
    # (configs/audio.yml:26,42 use torch.cuda.FloatTensor).
    "torch.cuda.FloatTensor": jnp.float32,
    "torch.FloatTensor": jnp.float32,
    "torch.float": jnp.float32,
    None: jnp.float32,
}


def resolve_dtype(name):
    if name in _DTYPES:
        return _DTYPES[name]
    return jnp.dtype(name)


def production_eval_cfg(config, model_cfg):
    """Apply the sampling-section inference-only overrides to a ModelConfig.

    THE single code path that builds the production eval config — the runner
    (``runners/diffusion_runner.py``), ``bench.py``, ``benchmarks/run_all.py``
    and the slope benchmarks all call this, so the measured path can never
    silently diverge from the served path again. Overrides (all inference
    only; training numerics untouched):

    - ``sampling.dtype``: compute dtype for the denoiser (bf16 production);
      sampler update math stays fp32.
    - ``sampling.act_store``: activation storage precision for the flat
      Pallas path ("int8" stores stage activations as int8 + per-tile
      scales — the forward is bandwidth-sensitive).
    - ``sampling.tap_int8``: int8×int8→int32 conv taps on the MXU for the
      lane-padded C ≤ 64 resblocks.
    """
    import dataclasses

    cfg = model_cfg
    sdtype = getattr(config.sampling, "dtype", None)
    if sdtype:
        cfg = dataclasses.replace(cfg, dtype=resolve_dtype(sdtype))
    astore = getattr(config.sampling, "act_store", None)
    if astore:
        cfg = dataclasses.replace(cfg, act_store=str(astore))
    if bool(getattr(config.sampling, "tap_int8", False)):
        cfg = dataclasses.replace(cfg, tap_int8=True)
    # measured near-dead-end (−0.15 ms for −1.3 dB, BASELINE.md round 4);
    # off by default, available for compute-bound geometries
    if bool(getattr(config.sampling, "strided_int8", False)):
        cfg = dataclasses.replace(cfg, strided_int8=True)
    return cfg


def load_config(path: str):
    with open(path, "r") as f:
        raw = yaml.safe_load(f)
    return dict2namespace(raw)


def dump_config(config, path: str):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        yaml.dump(namespace2dict(config), f, default_flow_style=False)
