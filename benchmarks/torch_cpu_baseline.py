#!/usr/bin/env python
"""Measure (not extrapolate) the torch-CPU reference 100-step DDIM clip.

Runs the actual reference sampler (`/root/reference/functions/denoising.py:10`
generalized_steps) end-to-end with the reference Model at the BASELINE.json
row-1 workload: eta=0, --timesteps 100, batch 1, [1, 2, 8192, 256]. The only
modification is mapping the hard-coded "torch.cuda.*" tensor types to CPU
(the reference cannot run at all otherwise — SURVEY.md §2.20i).

Writes the result JSON to benchmarks/torch_cpu_baseline.json. Expected
duration ~3 h on this host's single vCPU (104.5 s per forward × 100); run it
niced in the background.
"""

from __future__ import annotations

import json
import os
import sys
import time

REFERENCE = "/root/reference"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "torch_cpu_baseline.json")


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import numpy as np
    import torch

    torch.set_num_threads(1)  # the host has exactly 1 vCPU

    from tests.torch_ref import build_reference_model

    if REFERENCE not in sys.path:
        sys.path.append(REFERENCE)

    # cuda literals → cpu (functions/denoising.py:18-19)
    _orig_type = torch.Tensor.type

    def _cpu_type(self, t=None, **kw):
        if isinstance(t, str):
            t = t.replace("torch.cuda.", "torch.")
        return _orig_type(self, t, **kw) if t is not None else _orig_type(self)

    torch.Tensor.type = _cpu_type

    from functions.denoising import generalized_steps  # reference module

    tkwargs = {
        "hidden_size": 512,
        "num_hidden_layers": 12,
        "intermediate_size": 2048,
        "hidden_act": "gelu_new",
        "hidden_dropout_prob": 0.1,
        "layer_norm_eps": 1e-6,
    }
    model = build_reference_model(
        ch=[32, 64, 96, 128, 192, 256],
        krn=[3, 3, 3, 3, 3, 3],
        res=[2, 2, 3, 3, 3, 3],
        f_size=256,
        channels=2,
        num_timesteps=1000,
        tkwargs=tkwargs,
    )
    model.eval()

    # reference schedule (runners/diffusion.py:46-49,109-116)
    betas = np.linspace(1e-4, 0.02, 1000, dtype=np.float64)
    alphas = torch.from_numpy(
        np.concatenate([[1.0], 1.0 - betas]).cumprod(axis=0)[1:].astype(np.float32)
    )

    timesteps = 100
    skip = 1000 // timesteps
    seq = list(range(0, 1000, skip))  # reference runners/diffusion.py:482-484

    torch.manual_seed(0)
    x = torch.randn(1, 2, 8192, 256)

    t0 = time.time()
    xs, x0_preds = generalized_steps(
        x, seq, model, alphas, select_index=[-1], eta=0.0
    )
    wall = time.time() - t0

    result = {
        "metric": "torch_cpu_ddim_100step_b1_t8192_per_clip_wall_clock",
        "value": round(wall, 1),
        "unit": "s",
        "steps": timesteps,
        "threads": 1,
        "measured": True,
        "final_abs_sum": float(xs[-1].abs().sum()),
    }
    with open(OUT, "w") as f:
        json.dump(result, f)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
