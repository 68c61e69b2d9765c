"""The denoiser: conv U-Net with an FNet transformer bottleneck.

Capability parity with the reference ``Model`` (``models/diffusion.py:170-294``):

- head Conv C→ch[0] k3s1p1; 6 down stages (Downsample k4s2p1 between stages +
  ``res[i]`` residual blocks of width ``ch[i]``); skip state appended after
  *every* down entry (7 tensors including the head conv output)
- residual block (``models/diffusion.py:12-56``): pre-norm
  GN→SiLU→Conv3×3(no bias)+temb → SiLU→GN→Conv3×3(bias) → SiLU→GN(zero-init
  weight, **no bias**) → input + x  (identity at init)
- bottleneck at (T/32, F/32): flatten (C, F) → tokens of ch[-1]·F/32 = 2048
  features, FNet transformer, unflatten
- up path mirrors down with **additive** skips ``x = x + skip`` before every
  up entry (including before the tail conv), Upsample = ConvTranspose k4s2p1
- timestep embedding split into one chunk per resblock, down order then
  reversed for the up path (``models/diffusion.py:178-184,248-250``)

TPU-first design choices (not translations): NHWC layout throughout the conv
stack (channels minor → lane dimension), the external API stays the
reference's [B, C, T, F]; the positional/DFT tables are compile-time
constants; optional bf16 compute with fp32 params.

Param pytree top-level keys ("temb", "down_modules", "up_modules",
"transformer") deliberately match the reference's top-level module names so
per-group optimizer classification by top-level name
(``runners/diffusion.py:65-87``) works on config untouched.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Sequence

import jax
import jax.numpy as jnp

from .embeddings import beta_embedding_apply, beta_embedding_init
from .fnet import transformer_module_apply, transformer_module_init
from .layers import (
    conv_apply,
    conv_init,
    conv_transpose_apply,
    conv_transpose_init,
    group_norm_apply,
    group_norm_init,
)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Static hyperparameters (hashable → usable as a jit static arg)."""

    channels: int = 2
    f_size: int = 256
    ch: Sequence[int] = (32, 64, 96, 128, 192, 256)
    krn: Sequence[int] = (3, 3, 3, 3, 3, 3)
    res: Sequence[int] = (2, 2, 3, 3, 3, 3)
    num_timesteps: int = 1000
    dtype: Any = jnp.float32
    transformers: Any = None  # namespace: module/kwargs/channels/fourier_impl
    # Rematerialize each resblock in the backward pass: the fp32 batch-14
    # train step needs ~25 GB of HLO temps without it vs ~16 GB of HBM on a
    # v5e chip (jax.checkpoint trades ~30% flops for activation memory).
    remat: bool = True
    # Resblock conv implementation: "auto" uses the fused flat-layout
    # Pallas kernels (ops/flat_resblock.py) on TPU — XLA lane-pads the
    # narrow stages 2-4× per byte; "xla" forces lax convs everywhere.
    # The flat kernels are differentiable (custom VJPs in ops/flat_grad.py,
    # whole-model grads parity-tested vs XLA), so "auto" applies to both
    # sampling and training.
    conv_impl: str = "auto"
    # Activation storage precision for the flat SAMPLING path: "int8" keeps
    # each stage's resblock chain quantized in HBM with per-tile symmetric
    # scales (ops/flat_resblock.resblock_flat_int8) — the forward is
    # HBM-bandwidth-bound (BASELINE.md), so storage precision IS the perf
    # axis. Conv math stays in cfg.dtype with fp32 accumulation. Applies to
    # the stages whose geometry meets the int8 HBM tiling (C = 32…128 —
    # ~98% of the forward's bytes); others stay in cfg.dtype. None = store
    # activations in cfg.dtype.
    act_store: str | None = None
    # int8 × int8 → int32 conv taps on the MXU for the flat SAMPLING path
    # (2× the bf16 matmul rate): per-tile symmetric activation requant in
    # VMEM + per-output-channel weight quant. The hot convs are MXU-bound
    # (the flat layout's tap blocks are lane-padded 2-4× at C ≤ 96 —
    # overhead-free measurements in BASELINE.md), so tap precision is the
    # perf axis at those widths; C ≥ 128 stages keep cfg.dtype taps (fpp=1
    # is unpadded and the requant pass costs more than it saves).
    tap_int8: bool = False
    # int8 taps for the 12-format STRIDED transitions (the s0↔s1 pair).
    # Measured near-dead-end on v5e (round 4, BASELINE.md): −0.15 ms
    # forward for −1.3 dB (the per-tile requant VPU passes eat the halved
    # MXU time) — off by default, kept for compute-bound future geometries.
    strided_int8: bool = False

    @classmethod
    def from_config(cls, config):
        """Build from a loaded audio.yml namespace (config.model/.diffusion)."""
        from ..config import resolve_dtype

        m = config.model
        return cls(
            channels=m.channels,
            f_size=m.f_size,
            ch=tuple(m.ch),
            krn=tuple(m.krn),
            res=tuple(m.res),
            num_timesteps=config.diffusion.num_diffusion_timesteps,
            dtype=resolve_dtype(getattr(m, "dtype", None)),
            transformers=m.transformers,
            conv_impl=getattr(m, "conv_impl", "auto"),
            act_store=getattr(m, "act_store", None),
            tap_int8=bool(getattr(m, "tap_int8", False)),
            strided_int8=bool(getattr(m, "strided_int8", False)),
        )

    def __hash__(self):
        # transformers is an argparse.Namespace (unhashable); fold in its
        # repr so configs differing only in transformer settings don't
        # collide as jit static args.
        return hash((self.channels, self.f_size, self.ch, self.krn, self.res,
                     self.num_timesteps, str(self.dtype), self.remat,
                     self.conv_impl, self.act_store, self.tap_int8,
                     self.strided_int8,
                     repr(vars(self.transformers)) if self.transformers else ""))

    def __eq__(self, other):
        return isinstance(other, ModelConfig) and hash(self) == hash(other)

    @property
    def embedding_sizes(self) -> tuple:
        down = [c for c, r in zip(self.ch, self.res) for _ in range(r)]
        return tuple(down + down[::-1])

    @property
    def bottleneck_io(self) -> int:
        return self.ch[-1] * (self.f_size // (2 ** (len(self.ch) - 1)))


def _resblock_init(key, channels: int, kernel_size: int, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "norm1": group_norm_init(channels, dtype=dtype),
        "conv1": conv_init(k1, kernel_size, kernel_size, channels, channels,
                           bias=False, dtype=dtype),
        "norm2": group_norm_init(channels, dtype=dtype),
        "conv2": conv_init(k2, kernel_size, kernel_size, channels, channels,
                           bias=True, dtype=dtype),
        "norm3": group_norm_init(channels, bias=False, zero_weight=True, dtype=dtype),
    }


def _resblock_apply(p, x, temb, *, kernel_size: int):
    """x: [B,T,F,C]; temb: [B,C]. Identity at init (zero-weight final GN)."""
    pad = kernel_size // 2
    h = group_norm_apply(p["norm1"], x)
    h = jax.nn.silu(h)
    h = conv_apply(p["conv1"], h, padding=pad) + temb[:, None, None, :].astype(x.dtype)
    h = jax.nn.silu(h)
    h = group_norm_apply(p["norm2"], h)
    h = conv_apply(p["conv2"], h, padding=pad)
    h = jax.nn.silu(h)
    h = group_norm_apply(p["norm3"], h)
    return x + h


def init_model(key, cfg: ModelConfig):
    """Returns the parameter pytree. ~47.2M params at the audio.yml config
    (verified against the executed reference: 47,155,266)."""
    dtype = jnp.float32  # master params are always fp32; cfg.dtype is compute
    n_keys = 4 + 2 * len(cfg.ch)
    keys = iter(jax.random.split(key, n_keys + sum(cfg.res) * 2))

    params = {}
    params["temb"] = beta_embedding_init(
        next(keys), cfg.num_timesteps, sum(cfg.embedding_sizes), dtype=dtype
    )

    down = {"head": conv_init(next(keys), 3, 3, cfg.channels, cfg.ch[0], dtype=dtype)}
    up = {"tail": conv_init(next(keys), 3, 3, cfg.ch[0], cfg.channels, dtype=dtype)}
    down_stages, up_stages = [], []
    prev = -1
    for ch, krn, res in zip(cfg.ch, cfg.krn, cfg.res):
        dstage, ustage = {}, {}
        if prev != -1:
            dstage["down"] = conv_init(next(keys), 4, 4, prev, ch, dtype=dtype)
            ustage["up"] = conv_transpose_init(next(keys), 4, 4, ch, prev, dtype=dtype)
        dstage["blocks"] = [_resblock_init(next(keys), ch, krn, dtype) for _ in range(res)]
        ustage["blocks"] = [_resblock_init(next(keys), ch, krn, dtype) for _ in range(res)]
        down_stages.append(dstage)
        up_stages.append(ustage)
        prev = ch
    down["stages"] = down_stages
    up["stages"] = up_stages
    params["down_modules"] = down
    params["up_modules"] = up

    params["transformer"] = transformer_module_init(
        next(keys), cfg.bottleneck_io, cfg.transformers, dtype=dtype
    )
    return params


def apply_model(params, x, t, cfg: ModelConfig, *, train: bool = False, rng=None):
    """Denoiser forward: x [B, C, T, F], t int [B] → eps_hat [B, C, T, F].

    T must be divisible by 2^(len(ch)-1) (=32 for audio.yml), as in the
    reference (stride-2 stages).
    """
    stride_total = 2 ** (len(cfg.ch) - 1)
    if x.ndim != 4 or x.shape[1] != cfg.channels or x.shape[3] != cfg.f_size:
        raise ValueError(
            f"expected x of shape [B, {cfg.channels}, T, {cfg.f_size}], got {x.shape}"
        )
    if x.shape[2] % stride_total != 0:
        raise ValueError(
            f"T={x.shape[2]} must be divisible by the total stride {stride_total}"
        )
    compute_dtype = cfg.dtype
    x = jnp.transpose(x, (0, 2, 3, 1)).astype(compute_dtype)  # NCHW-ish → NHWC

    temb = beta_embedding_apply(
        params["temb"], t, num_timesteps=cfg.num_timesteps, dtype=jnp.float32
    )
    temb_chunks = list(jnp.split(temb, _split_points(cfg.embedding_sizes), axis=-1))
    temb_iter = iter(temb_chunks)

    if cfg.remat:
        block_apply = {
            k: jax.checkpoint(functools.partial(_resblock_apply, kernel_size=k))
            for k in set(cfg.krn)
        }
    else:
        block_apply = {
            k: functools.partial(_resblock_apply, kernel_size=k)
            for k in set(cfg.krn)
        }

    # Fused flat-layout Pallas path (forward-only). When every stage and
    # stage transition is expressible in the flat layout (true for
    # audio.yml), the whole conv stack — resblocks AND the strided
    # down/transposed-up convs — runs flat end-to-end; otherwise individual
    # flat-capable stages still use the fused resblocks.
    use_flat = (
        not train
        and (cfg.conv_impl == "pallas"
             or (cfg.conv_impl == "auto" and jax.default_backend() == "tpu"))
    )
    if use_flat and _supports_full_flat(cfg):
        return _apply_model_flat(params, x, temb_chunks, cfg)

    # Training on TPU: resblocks, head/tail, and the strided stage
    # transitions all run on the flat Pallas kernels through their custom
    # VJPs (ops/flat_grad.py) — forward AND backward convs are unpadded.
    use_flat_train = (
        train
        and (cfg.conv_impl == "pallas"
             or (cfg.conv_impl == "auto" and jax.default_backend() == "tpu"))
    )
    hw_backend = jax.default_backend() == "tpu"
    from ..ops.pallas.conv_flat import supports_flat

    def run_blocks(stage, krn, h):
        b_, t_, f_, c_ = h.shape
        hw = hw_backend
        if use_flat and krn == 3 and supports_flat(c_, f_, hw=hw):
            from ..ops.flat_resblock import resblock_flat

            hf = h.reshape(b_, t_, f_ * c_)
            stats = None
            for k, block in enumerate(stage["blocks"]):
                last = k == len(stage["blocks"]) - 1
                res = resblock_flat(
                    block, hf, next(temb_iter), f=f_, c=c_,
                    in_stats=stats, want_out_stats=not last,
                )
                hf, stats = res if not last else (res, None)
            return hf.reshape(b_, t_, f_, c_)
        if use_flat_train and krn == 3 and supports_flat(c_, f_, hw=hw):
            from ..ops.flat_grad import resblock_flat_train

            block_fn = functools.partial(resblock_flat_train, f=f_, c=c_)
            if cfg.remat:
                block_fn = jax.checkpoint(block_fn)
            hf = h.reshape(b_, t_, f_ * c_)
            for block in stage["blocks"]:
                hf = block_fn(block, hf, next(temb_iter))
            return hf.reshape(b_, t_, f_, c_)
        for block in stage["blocks"]:
            h = block_apply[krn](block, h, next(temb_iter))
        return h

    # Trainable flat head/tail and stage transitions: in the flat-train
    # regime the XLA NHWC convs at these sites pay up to a 9.1× padded-
    # layout expansion (C = 2 pads 64×) — route them through the custom-VJP
    # flat kernels instead (ops/flat_grad).
    def _flat_head(ph, x):
        b_, t_, f_, cin_ = x.shape
        c0 = cfg.ch[0]
        if not (use_flat_train and supports_flat(c0, f_, hw=hw_backend)):
            return conv_apply(ph, x, padding=1)
        from ..ops.flat_grad import conv3x3_flat_t

        w_pad = jnp.zeros((3, 3, c0, c0), jnp.float32).at[:, :, :cin_, :].set(
            ph["w"].astype(jnp.float32))
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, c0 - cin_)))
        hf = conv3x3_flat_t(
            xp.reshape(b_, t_, f_ * c0), w_pad,
            jnp.tile(ph["b"].astype(jnp.float32), f_), c=c0)
        return hf.reshape(b_, t_, f_, c0)

    def _flat_tail(pt, x):
        b_, t_, f_, c0 = x.shape
        cout_ = pt["w"].shape[3]
        if not (use_flat_train and supports_flat(c0, f_, hw=hw_backend)):
            return conv_apply(pt, x, padding=1)
        from ..ops.flat_grad import conv3x3_flat_t

        w_pad = jnp.zeros((3, 3, c0, c0), jnp.float32).at[:, :, :, :cout_].set(
            pt["w"].astype(jnp.float32))
        b_pad = jnp.zeros((c0,), jnp.float32).at[:cout_].set(
            pt["b"].astype(jnp.float32))
        of = conv3x3_flat_t(
            x.reshape(b_, t_, f_ * c0), w_pad, jnp.tile(b_pad, f_), c=c0)
        return of.reshape(b_, t_, f_, c0)[..., :cout_]

    def _down_conv(pd, h):
        b_, t_, f_, ci_ = h.shape
        co_ = pd["w"].shape[3]
        from ..ops.pallas.conv_strided import supports_flat_down

        if not (use_flat_train
                and supports_flat_down(ci_, f_, co_, hw=hw_backend)):
            return conv_apply(pd, h, stride=2, padding=1)
        from ..ops.flat_grad import conv_down_flat_t

        hf = conv_down_flat_t(
            h.reshape(b_, t_, f_ * ci_), pd["w"], pd["b"], c_in=ci_, c_out=co_)
        return hf.reshape(b_, t_ // 2, f_ // 2, co_)

    def _up_conv(pu, h):
        b_, t_, f_, ci_ = h.shape
        co_ = pu["w"].shape[3]
        from ..ops.pallas.conv_strided import supports_flat_up

        if not (use_flat_train
                and supports_flat_up(ci_, f_, co_, hw=hw_backend)):
            return conv_transpose_apply(pu, h, stride=2, padding=1)
        from ..ops.flat_grad import conv_up_flat_t

        hf = conv_up_flat_t(
            h.reshape(b_, t_, f_ * ci_), pu["w"], pu["b"], c_in=ci_, c_out=co_)
        return hf.reshape(b_, 2 * t_, 2 * f_, co_)

    # Down path; skip state captured after every entry (7 tensors).
    hidden = []
    h = _flat_head(params["down_modules"]["head"], x)
    hidden.append(h)
    for stage, krn in zip(params["down_modules"]["stages"], cfg.krn):
        if "down" in stage:
            h = _down_conv(stage["down"], h)
        h = run_blocks(stage, krn, h)
        hidden.append(h)

    # Bottleneck: [B,T',F',C] → tokens [B,T',C·F'] with (C,F) flatten order
    # matching the reference's NCHW permute+reshape (models/diffusion.py:273-275).
    b, tt, ff, cc = h.shape
    tdtype = jnp.float32
    if getattr(cfg.transformers, "dtype", None) is not None:
        from ..config import resolve_dtype

        tdtype = resolve_dtype(cfg.transformers.dtype)
    z = jnp.transpose(h, (0, 1, 3, 2)).reshape(b, tt, cc * ff).astype(tdtype)
    z = transformer_module_apply(
        params["transformer"], z, tcfg=cfg.transformers, train=train, rng=rng
    )
    h = jnp.transpose(z.reshape(b, tt, cc, ff), (0, 1, 3, 2)).astype(compute_dtype)

    # Up path: additive skip before every entry, including the tail conv.
    for stage, krn in zip(
        reversed(params["up_modules"]["stages"]), reversed(cfg.krn)
    ):
        h = h + hidden.pop()
        h = run_blocks(stage, krn, h)
        if "up" in stage:
            h = _up_conv(stage["up"], h)
    h = h + hidden.pop()
    h = _flat_tail(params["up_modules"]["tail"], h)

    return jnp.transpose(h, (0, 3, 1, 2)).astype(jnp.float32)  # NHWC → [B,C,T,F]


def _supports_full_flat(cfg: ModelConfig) -> bool:
    """True when every stage (k=3, C/F geometry) and every down/up stage
    transition can run in the flat layout (see ops/pallas). The Mosaic
    block-shape constraints (hw=) only bind when lowering to a real TPU;
    CPU runs are interpret-mode tests on scaled-down geometry."""
    from ..ops.pallas.conv_flat import supports_flat
    from ..ops.pallas.conv_strided import supports_flat_down, supports_flat_up

    hw = jax.default_backend() == "tpu"
    f = cfg.f_size
    prev = None
    for i, (c, krn) in enumerate(zip(cfg.ch, cfg.krn)):
        if krn != 3:
            return False
        if i:
            if not supports_flat_down(prev, f, c, hw=hw):
                return False
            if not supports_flat_up(c, f // 2, prev, hw=hw):
                return False
            f //= 2
        if not supports_flat(c, f, hw=hw):
            return False
        prev = c
    return True


def apply_model_flat_io(params, xf, t, cfg: ModelConfig):
    """Flat-io denoiser for sampler loops: xf [B, T, F·channels] UNPADDED
    flat (row-major (f, c) lanes); returns the ε-prediction in the same
    layout.

    Rationale: carrying NCHW through the sampler costs ~8.6 ms/step at
    [1,2,8192,256] in entry/exit glue (NCHW↔NHWC transposes, dtype-convert
    materializations — profiled); converting once per sample call removes
    all of it. Round-3 revision: the carried state used to be channel-
    padded to ch[0] (16× the real bytes at C=2) because the head/tail
    kernels were square — the asymmetric conv_head_flat/conv_tail_flat
    pair (ops/pallas/conv_head_tail.py) consumes and emits the unpadded
    layout, so every sampler update op now touches only real data."""
    if xf.ndim != 3 or xf.shape[2] != cfg.f_size * cfg.channels:
        raise ValueError(
            f"expected flat x [B, T, {cfg.f_size * cfg.channels}],"
            f" got {xf.shape}")
    stride_total = 2 ** (len(cfg.ch) - 1)
    if xf.shape[1] % stride_total != 0:
        raise ValueError(
            f"T={xf.shape[1]} must be divisible by the total stride"
            f" {stride_total}")
    temb = beta_embedding_apply(
        params["temb"], t, num_timesteps=cfg.num_timesteps, dtype=jnp.float32
    )
    temb_chunks = list(jnp.split(temb, _split_points(cfg.embedding_sizes),
                                 axis=-1))
    return _apply_model_flat_core(params, xf.astype(cfg.dtype), temb_chunks,
                                  cfg)


def flat_io_adapters(cfg: ModelConfig):
    """(to_flat, from_flat, noise_builder) for the flat-io sampling state —
    the ONE definition of the carried-layout contract (runner, bench, and
    tests must all agree on it):

    - to_flat:  [B, C, T, F] fp32 → unpadded flat [B, T, F·C]
    - from_flat: flat → [B, C, T, F] fp32
    - noise_builder(key, xf): per-step noise drawn CHANNEL-shaped then
      reshaped, so flat trajectories are bit-identical to the NCHW sampler
      path (same RNG stream)."""
    cin, f = cfg.channels, cfg.f_size

    def to_flat(xn):
        b, _, t, ff = xn.shape
        return jnp.transpose(xn, (0, 2, 3, 1)).reshape(b, t, ff * cin)

    def from_flat(xf):
        b, t, _ = xf.shape
        h = xf.reshape(b, t, f, cin)
        return jnp.transpose(h, (0, 3, 1, 2)).astype(jnp.float32)

    def noise_builder(key, xf):
        b, t, _ = xf.shape
        return to_flat(jax.random.normal(key, (b, cin, t, f), xf.dtype))

    return to_flat, from_flat, noise_builder


def _apply_model_flat(params, x, temb_chunks, cfg: ModelConfig):
    """NHWC wrapper around the flat-io core (same contract as the XLA
    branch of apply_model): flatten → core → unflatten/transpose."""
    bsz, t, f, cin = x.shape
    of = _apply_model_flat_core(params, x.reshape(bsz, t, f * cin),
                                temb_chunks, cfg)
    h = of.reshape(bsz, t, f, -1)
    return jnp.transpose(h, (0, 3, 1, 2)).astype(jnp.float32)


def _apply_model_flat_core(params, xf, temb_chunks, cfg: ModelConfig):
    """Flat-layout forward: activations stay in the unpadded [B, T, F·C]
    layout through the head conv, every resblock, and every strided stage
    transition (Pallas kernels); only the tiny bottleneck tokens use XLA's
    dense path. xf: [B, T, F·channels] UNPADDED flat, compute dtype;
    returns [B, T, F·channels] (the ε-prediction, same layout)."""
    from ..ops.flat_resblock import resblock_flat, resblock_flat_int8
    from ..ops.pallas.conv_flat import (
        conv3x3_flat,
        pack_conv_weights,
        pack_conv_weights_int8,
        supports_flat_int8,
        tap_int8_profitable,
    )
    from ..ops.pallas.conv_head_tail import (
        conv_head_flat,
        conv_tail_flat,
        pack_head_weights,
        pack_tail_weights,
        supports_head_tail,
    )
    from ..ops.pallas.conv_strided import (
        conv_down_flat,
        conv_up_flat,
        pack_down_weights,
        pack_down_weights_int8,
        pack_up_weights,
        pack_up_weights_int8,
        strided_int8_profitable,
    )

    compute_dtype = cfg.dtype
    temb_iter = iter(temb_chunks)
    hw = jax.default_backend() == "tpu"

    def run_blocks_flat(stage, hf, f, c, in_stats):
        # chain the stage's resblocks in the kernels' row view — one
        # reshape pair per stage visit instead of per block (XLA copies
        # these reshapes around custom calls when B > 1)
        from ..ops.pallas.conv_flat import flat_period

        b_, t_, fc_ = hf.shape
        g_ = fc_ // flat_period(c)
        hv = hf.reshape(b_, t_ * g_, flat_period(c))
        stats = in_stats
        if cfg.act_store == "int8" and supports_flat_int8(c, f, hw=hw):
            # int8 activation storage through the stage's chain: interior
            # block outputs live in HBM as int8 + per-tile scales; the
            # stage entry arrives float from the transition kernel and the
            # last block's tail emits float for the transition/skip/
            # bottleneck consumers.
            scales = None
            for k, block in enumerate(stage["blocks"]):
                last = k == len(stage["blocks"]) - 1
                hv, scales, stats = resblock_flat_int8(
                    block, hv, next(temb_iter), f=f, c=c,
                    in_stats=stats, in_scales=scales,
                    quant_out=not last, want_out_stats=not last,
                    compute_dtype=compute_dtype,
                )
            return hv.reshape(b_, t_, fc_)
        for k, block in enumerate(stage["blocks"]):
            last = k == len(stage["blocks"]) - 1
            res = resblock_flat(
                block, hv, next(temb_iter), f=f, c=c,
                in_stats=stats, want_out_stats=not last, rows_io=True,
                tap_int8=cfg.tap_int8 and tap_int8_profitable(c),
            )
            hv, stats = res if not last else (res, None)
        return hv.reshape(b_, t_, fc_)

    # Head conv in the INPUT's own flat layout (C_in → ch0 asymmetric
    # kernel, ops/pallas/conv_head_tail.py): the padded square conv paid
    # 9 full s0-geometry tap passes (~1.8 ms) for a 2→32-channel window.
    # Geometries the specialized pair doesn't cover (tiny test configs)
    # fall back to channel-padding + the square kernel.
    bsz, t, _ = xf.shape
    c0 = cfg.ch[0]
    f = cfg.f_size
    cin = cfg.channels
    head = params["down_modules"]["head"]
    ht_kernels = supports_head_tail(cin, c0, f, hw=hw)
    if ht_kernels:
        hf, hs1, hs2 = conv_head_flat(
            xf, pack_head_weights(head["w"], compute_dtype),
            head["b"].astype(jnp.float32),
            c_in=cin, c0=c0, f=f, want_stats=True,
        )
        hf = hf.reshape(bsz, t, f * c0)
    else:
        xp = xf.reshape(bsz, t, f, cin)
        xp = jnp.pad(xp, ((0, 0),) * 3 + ((0, c0 - cin),)).reshape(
            bsz, t, f * c0)
        w_head = jnp.zeros((3, 3, c0, c0), jnp.float32).at[
            :, :, :cin, :].set(head["w"].astype(jnp.float32))
        tap8_0 = cfg.tap_int8 and tap_int8_profitable(c0)
        if tap8_0:
            wh, wh_s = pack_conv_weights_int8(w_head)
            head_kw = {"mxu_int8": True, "w_scale": wh_s}
        else:
            wh = pack_conv_weights(w_head, compute_dtype)
            head_kw = {}
        hf, hs1, hs2 = conv3x3_flat(
            xp, wh,
            add=jnp.tile(head["b"].astype(jnp.float32), f),
            c=c0, want_stats=True, **head_kw,
        )

    hidden = []
    hidden.append(hf)
    prev = None
    stats = (hs1, hs2)  # stage 0 seeds its GN stats from the head conv
    for i, (stage, c) in enumerate(
        zip(params["down_modules"]["stages"], cfg.ch)
    ):
        if i > 0 and "down" not in stage:
            # stats would be stale (previous stage's exit stats are for a
            # different width); init_model always emits 'down' for i > 0 —
            # fail loudly if a future architecture change breaks that.
            raise NotImplementedError(
                "flat path: stage > 0 without a 'down' transition has no "
                "fused GroupNorm-stats source"
            )
        if "down" in stage:
            # int8 MXU taps for the 12-format transitions (the s0↔s1 pair:
            # ~1.5 ms of its 2.2 ms is 25%-dense tap matmuls) under the
            # same production knob as the resblock taps
            if cfg.strided_int8 and strided_int8_profitable(prev, c):
                w2, ws = pack_down_weights_int8(stage["down"]["w"])
                dkw = {"mxu_int8": True, "w_scale": ws}
            else:
                w2 = pack_down_weights(stage["down"]["w"], compute_dtype)
                dkw = {}
            hf, s1, s2 = conv_down_flat(
                hf, w2, stage["down"]["b"], c_in=prev, c_out=c,
                want_stats=True, **dkw,
            )
            stats = (s1, s2)
            t //= 2
            f //= 2
        hf = run_blocks_flat(stage, hf, f, c, stats)
        hidden.append(hf)
        prev = c

    # Bottleneck: flat [B,T',F'·C] → tokens [B,T',C·F'] ((C,F) flatten order
    # matching the reference's NCHW permute+reshape, models/diffusion.py:273).
    cc = cfg.ch[-1]
    tdtype = jnp.float32
    if getattr(cfg.transformers, "dtype", None) is not None:
        from ..config import resolve_dtype

        tdtype = resolve_dtype(cfg.transformers.dtype)
    z = hf.reshape(bsz, t, f, cc).transpose(0, 1, 3, 2)
    z = z.reshape(bsz, t, cc * f).astype(tdtype)
    z = transformer_module_apply(
        params["transformer"], z, tcfg=cfg.transformers, train=False, rng=None
    )
    hf = (z.reshape(bsz, t, cc, f).transpose(0, 1, 3, 2)
          .reshape(bsz, t, f * cc).astype(compute_dtype))

    # Up path: each stage's skip add AND the next GroupNorm's statistics
    # fuse into the preceding transposed-conv kernel (conv_up_flat
    # residual=/want_stats=), so `up(h) + hidden` never materializes a
    # separate sum and the stage's first resblock never re-reads it for
    # stats. Only the bottleneck-scale add (tiny) stays an XLA op.
    up_stages = list(params["up_modules"]["stages"])
    chs = list(cfg.ch)
    stats = None
    for idx in range(len(up_stages) - 1, -1, -1):
        stage, c = up_stages[idx], chs[idx]
        if idx == len(up_stages) - 1:
            hf = hf + hidden.pop()
        hf = run_blocks_flat(stage, hf, f, c, stats)
        if "up" in stage:
            if cfg.strided_int8 and strided_int8_profitable(
                c, chs[idx - 1], up=True
            ):
                w2, ws = pack_up_weights_int8(stage["up"]["w"])
                ukw = {"mxu_int8": True, "w_scale": ws}
            else:
                w2 = pack_up_weights(stage["up"]["w"], compute_dtype)
                ukw = {}
            hf, s1, s2 = conv_up_flat(
                hf, w2, stage["up"]["b"], c_in=c, c_out=chs[idx - 1],
                residual=hidden.pop(), want_stats=True, **ukw,
            )
            stats = (s1, s2)
            t *= 2
            f *= 2
    # Tail conv (ch0 → channels): the asymmetric kernel emits the UNPADDED
    # [B, T, F·channels] ε-prediction directly; the final head skip add
    # rides the kernel's fused input residual either way. (Float taps
    # always: the tail's output IS the model result, so input requant
    # noise would land on it un-normalized.)
    tail = params["up_modules"]["tail"]
    cout = tail["w"].shape[3]
    if ht_kernels and cout == cin:
        return conv_tail_flat(
            hf, pack_tail_weights(tail["w"], f, compute_dtype),
            tail["b"].astype(jnp.float32),
            c0=c0, c_out=cout, f=f, residual=hidden.pop(),
        )
    w_tail = jnp.zeros((3, 3, c0, c0), jnp.float32).at[:, :, :, :cout].set(
        tail["w"].astype(jnp.float32))
    b_tail = jnp.zeros((c0,), jnp.float32).at[:cout].set(
        tail["b"].astype(jnp.float32))
    of = conv3x3_flat(
        hf, pack_conv_weights(w_tail, compute_dtype),
        add=jnp.tile(b_tail, f), c=c0, residual=hidden.pop(),
    )
    return of.reshape(bsz, t, f, c0)[..., :cout].reshape(bsz, t, f * cout)


def _split_points(sizes: Sequence[int]) -> list[int]:
    pts, acc = [], 0
    for s in sizes[:-1]:
        acc += s
        pts.append(acc)
    return pts


def count_params(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
