"""Golden-parity harness: load the PyTorch reference model and convert its
weights into ddim_audio_tpu's param pytree.

The reference lives read-only at /root/reference; its External/ submodules are
empty, so the unused-but-imported UPU GroupNorm1D (reference
models/diffusion.py:9) is stubbed before import. Weight conversion rules:

- Conv2d [out,in,kh,kw]            → HWIO [kh,kw,in,out]
- ConvTranspose2d [in,out,kh,kw]   → equivalent-forward-conv HWIO:
                                     spatial-flip then [kh,kw,in,out]
- Linear [out,in]                  → [in,out]
- GroupNorm/LayerNorm weight/bias  → g/b
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

REFERENCE = "/root/reference"


def _install_stubs():
    """Stub the empty External submodules the reference imports."""
    if "UPU" in sys.modules:
        return
    import torch.nn as nn

    upu = types.ModuleType("UPU")
    layers = types.ModuleType("UPU.layers")
    normalize = types.ModuleType("UPU.layers.normalize")
    groupnorm = types.ModuleType("UPU.layers.normalize.groupnorm")
    groupnorm.GroupNorm1D = nn.GroupNorm  # imported but never used by the model
    upu.layers = layers
    layers.normalize = normalize
    normalize.groupnorm = groupnorm
    for name, mod in [
        ("UPU", upu),
        ("UPU.layers", layers),
        ("UPU.layers.normalize", normalize),
        ("UPU.layers.normalize.groupnorm", groupnorm),
    ]:
        sys.modules[name] = mod


def reference_available() -> bool:
    return os.path.isdir(REFERENCE)


def build_reference_model(ch, krn, res, f_size, channels, num_timesteps, tkwargs):
    """Instantiate the reference Model (models/diffusion.py:170) on CPU."""
    _install_stubs()
    if REFERENCE not in sys.path:
        sys.path.append(REFERENCE)
    from models.diffusion import Model as RefModel  # reference module

    from ddim_audio_tpu.utils.namespace import dict2namespace

    config = dict2namespace(
        {
            "model": {
                "dtype": None,
                "channels": channels,
                "f_size": f_size,
                "ch": list(ch),
                "krn": list(krn),
                "res": list(res),
                "transformers": {
                    "imports": (
                        "import transformers; "
                        "from transformers.models.fnet.modeling_fnet import FNetEncoder"
                    ),
                    "module": "FNetEncoder",
                    "config": "transformers.FNetConfig",
                    "kwargs": dict(tkwargs),
                    "channels": tkwargs["hidden_size"],
                    "dtype": None,
                },
            },
            "diffusion": {"num_diffusion_timesteps": num_timesteps},
        }
    )
    model = RefModel(config)
    model.eval()
    return model


def _conv(m):
    w = m.weight.detach().numpy().transpose(2, 3, 1, 0)
    p = {"w": np.ascontiguousarray(w)}
    if m.bias is not None:
        p["b"] = m.bias.detach().numpy()
    return p


def _conv_transpose(m):
    # torch [in,out,kh,kw] → flip spatial → HWIO [kh,kw,in,out]
    w = m.weight.detach().numpy()[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
    p = {"w": np.ascontiguousarray(w)}
    if m.bias is not None:
        p["b"] = m.bias.detach().numpy()
    return p


def _linear(m):
    p = {"w": np.ascontiguousarray(m.weight.detach().numpy().T)}
    if m.bias is not None:
        p["b"] = m.bias.detach().numpy()
    return p


def _norm(m):
    p = {"g": m.weight.detach().numpy()}
    if m.bias is not None:
        p["b"] = m.bias.detach().numpy()
    return p


def torch_to_params(model) -> dict:
    """Reference Model → ddim_audio_tpu param pytree."""
    import torch.nn as nn

    params = {}
    params["temb"] = {"mlp": [_linear(m) for m in model.temb.weight]}

    ref_down = list(model.down_modules)
    down = {"head": _conv(ref_down[0]), "stages": []}
    for stage_mods in ref_down[1:]:
        mods = list(stage_mods)
        stage = {}
        if not hasattr(mods[0], "norm"):  # Downsample, not Residual_Block
            stage["down"] = _conv(mods[0].conv)
            mods = mods[1:]
        stage["blocks"] = [
            {
                "norm1": _norm(b.norm[0]),
                "conv1": _conv(b.conv[0]),
                "norm2": _norm(b.norm[1]),
                "conv2": _conv(b.conv[1]),
                "norm3": _norm(b.norm[2]),
            }
            for b in mods
        ]
        down["stages"].append(stage)
    params["down_modules"] = down

    ref_up = list(model.up_modules)  # [stage_{n-1}, ..., stage_0, tail conv]
    up = {"tail": _conv(ref_up[-1]), "stages": []}
    n_stages = len(ref_up) - 1
    for k, stage_mods in enumerate(ref_up[:-1]):
        mods = list(stage_mods)  # [res, ..., res, Upsample?] per reference :226
        stage = {}
        if hasattr(mods[-1], "conv") and not hasattr(mods[-1], "norm"):
            stage["up"] = _conv_transpose(mods[-1].conv)
            mods = mods[:-1]
        stage["blocks"] = [
            {
                "norm1": _norm(b.norm[0]),
                "conv1": _conv(b.conv[0]),
                "norm2": _norm(b.norm[1]),
                "conv2": _conv(b.conv[1]),
                "norm3": _norm(b.norm[2]),
            }
            for b in mods
        ]
        up["stages"].append(stage)
    up["stages"] = up["stages"][::-1]  # torch list is reversed (stage n-1 first)
    params["up_modules"] = up

    t = model.transformer
    params["transformer"] = {
        "embedding": {
            "ln": _norm(t.embedding.LayerNorm),
            "projection": _linear(t.embedding.projection),
        },
        "encoder": {
            "layers": [
                {
                    "ln_fourier": _norm(layer.fourier.output.LayerNorm),
                    "dense_in": _linear(layer.intermediate.dense),
                    "dense_out": _linear(layer.output.dense),
                    "ln_out": _norm(layer.output.LayerNorm),
                }
                for layer in t.encoder.layer
            ]
        },
        "compute_out": _linear(t.compute_out),
    }
    return params
