#!/usr/bin/env python
"""Bisect the full-flat forward at sampling scale [1,2,8192,256]: time
truncated prefixes of `_apply_model_flat`'s pipeline to localize glue cost
(skip adds, bottleneck transposes, layout passes) vs kernel cost.

Tunnel-safe timing: chained lax.scan inside one jit, host-fetch sync
(see ARCHITECTURE.md)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ddim_audio_tpu.config import load_config
from ddim_audio_tpu.models.fnet import transformer_module_apply
from ddim_audio_tpu.models.unet import ModelConfig, init_model
from ddim_audio_tpu.ops.flat_resblock import resblock_flat
from ddim_audio_tpu.ops.pallas.conv_flat import conv3x3_flat, pack_conv_weights
from ddim_audio_tpu.ops.pallas.conv_strided import (
    conv_down_flat,
    conv_up_flat,
    pack_down_weights,
    pack_up_weights,
)

_OVERHEAD = None


def call_overhead():
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
    return _OVERHEAD


def fwd_variant(params, x, temb_chunks, cfg, *, stop, skip_adds=True):
    """stop: 'head' | 'down' | 'mid' | 'up' | 'full'."""
    compute_dtype = cfg.dtype or jnp.float32
    temb_iter = iter(temb_chunks)

    def run_blocks_flat(stage, hf, f, c, in_stats):
        stats = in_stats
        for k, block in enumerate(stage["blocks"]):
            last = k == len(stage["blocks"]) - 1
            res = resblock_flat(
                block, hf, next(temb_iter), f=f, c=c,
                in_stats=stats, want_out_stats=not last,
            )
            hf, stats = res if not last else (res, None)
        return hf

    bsz, t, f, cin = x.shape
    c0 = cfg.ch[0]
    head = params["down_modules"]["head"]
    w_head = jnp.zeros((3, 3, c0, c0), jnp.float32).at[:, :, :cin, :].set(
        head["w"].astype(jnp.float32))
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, c0 - cin)))
    hf = conv3x3_flat(
        xp.reshape(bsz, t, f * c0),
        pack_conv_weights(w_head, compute_dtype),
        add=jnp.tile(head["b"].astype(jnp.float32), f),
        c=c0,
    )
    if stop == "head":
        return hf

    hidden = []
    hidden.append(hf)
    prev = None
    for stage, c in zip(params["down_modules"]["stages"], cfg.ch):
        stats = None
        if "down" in stage:
            w2 = pack_down_weights(stage["down"]["w"], compute_dtype)
            hf, s1, s2 = conv_down_flat(
                hf, w2, stage["down"]["b"], c_in=prev, c_out=c,
                want_stats=True,
            )
            stats = (s1, s2)
            t //= 2
            f //= 2
        hf = run_blocks_flat(stage, hf, f, c, stats)
        hidden.append(hf)
        prev = c
    if stop == "down":
        return hf

    cc = cfg.ch[-1]
    z = hf.reshape(bsz, t, f, cc).transpose(0, 1, 3, 2)
    z = z.reshape(bsz, t, cc * f).astype(jnp.float32)
    z = transformer_module_apply(
        params["transformer"], z, tcfg=cfg.transformers, train=False, rng=None
    )
    hf = (z.reshape(bsz, t, cc, f).transpose(0, 1, 3, 2)
          .reshape(bsz, t, f * cc).astype(compute_dtype))
    if stop == "mid":
        return hf

    up_stages = list(params["up_modules"]["stages"])
    chs = list(cfg.ch)
    for idx in range(len(up_stages) - 1, -1, -1):
        stage, c = up_stages[idx], chs[idx]
        if skip_adds:
            hf = hf + hidden[idx + 1]
        hf = run_blocks_flat(stage, hf, f, c, None)
        if "up" in stage:
            w2 = pack_up_weights(stage["up"]["w"], compute_dtype)
            hf = conv_up_flat(
                hf, w2, stage["up"]["b"], c_in=c, c_out=chs[idx - 1]
            )
            t *= 2
            f *= 2
    if skip_adds:
        hf = hf + hidden[0]
    if stop == "up":
        return hf

    tail = params["up_modules"]["tail"]
    cout = tail["w"].shape[3]
    w_tail = jnp.zeros((3, 3, c0, c0), jnp.float32).at[:, :, :, :cout].set(
        tail["w"].astype(jnp.float32))
    b_tail = jnp.zeros((c0,), jnp.float32).at[:cout].set(
        tail["b"].astype(jnp.float32))
    of = conv3x3_flat(
        hf, pack_conv_weights(w_tail, compute_dtype),
        add=jnp.tile(b_tail, f), c=c0,
    )
    h = of.reshape(bsz, t, f, c0)[..., :cout]
    return jnp.transpose(h, (0, 3, 1, 2)).astype(jnp.float32)


def time_variant(name, params, temb_chunks, cfg, stop, skip_adds=True,
                 iters=10):
    x0 = jax.random.normal(jax.random.key(1), (1, 2, 8192, 256), jnp.float32)

    @jax.jit
    def chain(p, x):
        def body(h, _):
            # NCHW chain carry → NHWC model input (as apply_model does)
            o = fwd_variant(p, jnp.transpose(h, (0, 2, 3, 1)), temb_chunks,
                            cfg, stop=stop, skip_adds=skip_adds)
            # fold to the input shape so the op chains
            flat = o.reshape(-1)
            n = 2 * 8192 * 256
            reps = -(-n // flat.shape[0])
            folded = jnp.tile(flat, reps)[:n].reshape(1, 2, 8192, 256)
            return folded * jax.lax.rsqrt(jnp.mean(folded * folded) + 1e-8), None
        return jax.lax.scan(body, x, None, length=iters)[0]

    out = chain(params, x0)
    out.block_until_ready()
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        float(jnp.sum(jnp.abs(chain(params, x0))))
        best = min(best, time.time() - t0)
    ms = max(best - call_overhead(), 0.0) / iters * 1e3
    print(f"{name:32s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    config = load_config(os.path.join(os.path.dirname(__file__), "..",
                                      "configs", "audio.yml"))
    cfg = ModelConfig.from_config(config)
    params = init_model(jax.random.key(0), cfg)
    from ddim_audio_tpu.models.embeddings import beta_embedding_apply
    from ddim_audio_tpu.models.unet import _split_points
    temb = beta_embedding_apply(
        params["temb"], jnp.full((1,), 500, jnp.int32),
        num_timesteps=cfg.num_timesteps, dtype=jnp.float32)
    temb_chunks = list(jnp.split(temb, _split_points(cfg.embedding_sizes),
                                 axis=-1))

    which = sys.argv[1:] or ["head", "down", "mid", "up", "full", "noskip"]
    for w in which:
        if w == "noskip":
            time_variant("full (skip adds removed)", params, temb_chunks,
                         cfg, "full", skip_adds=False)
        else:
            time_variant(f"prefix:{w}", params, temb_chunks, cfg, w)


if __name__ == "__main__":
    main()
