"""FNet transformer bottleneck.

Capability parity with the reference ``Transformer_Module``
(``models/diffusion.py:123-167``), which wraps the HF ``FNetEncoder``
(hidden 512, 12 layers, intermediate 2048, gelu_new, dropout 0.1,
ln_eps 1e-6 — ``configs/audio.yml:28-42``). Per HF ``modeling_fnet.py``,
each layer is:

    f = LayerNorm(x + Re(FFT2(x over (seq, hidden))))
    y = LayerNorm(f + Dropout(Dense_out(gelu_new(Dense_in(f)))))

The reference instantiates the encoder from config strings via exec/eval
(``models/diffusion.py:153-155``); here encoders are an explicit registry
keyed by ``config.model.transformers.module``.

TPU-first Fourier mixing: ``Re(FFT2(x))`` is computed as two real-matmul
chains against precomputed DFT cos/sin matrices (``dft_matmul``), which maps
onto the MXU — for bottleneck sequence lengths (32 train / 256 sample at
t_size 8192) this beats the FFT path; ``fourier_impl: fft`` selects XLA FFT
instead. Both are exact Re(FFT2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .layers import (
    dropout,
    gelu_new,
    layer_norm_apply,
    layer_norm_init,
    linear_apply,
    linear_init,
    sinusoid_table,
)


@functools.lru_cache(maxsize=32)
def _dft_cos_sin(n: int):
    """Real/imag parts of the DFT matrix F[k,m] = exp(-2πi·k·m/n).

    float64 host precompute → float32 constants; Re(FFT2) error vs
    numpy fftn is at the 1e-5 level for unit-scale inputs.
    """
    k = np.arange(n)[:, None]
    m = np.arange(n)[None, :]
    theta = 2.0 * np.pi * (k * m % n) / n
    return np.cos(theta).astype(np.float32), np.sin(theta).astype(np.float32)


def fourier_real_fft2(x):
    """Re(FFT over (seq, hidden))) via XLA FFT. x: [B, S, H] real."""
    return jnp.fft.fft2(x.astype(jnp.complex64), axes=(1, 2)).real.astype(x.dtype)


def fourier_real_dft_matmul(x):
    """Re(FFT2(x)) as real matmuls: with F = C - iS (per axis) and x real,
    Re(F_s · x · F_h) = (C_s·x)·C_h − (S_s·x)·S_h. x: [B, S, H]."""
    _, s, h = x.shape
    cs, ss = _dft_cos_sin(s)
    ch, sh = _dft_cos_sin(h)
    cs = jnp.asarray(cs, x.dtype)
    ss = jnp.asarray(ss, x.dtype)
    ch = jnp.asarray(ch, x.dtype)
    sh = jnp.asarray(sh, x.dtype)
    # precision="highest": the default matmul precision downcasts operands
    # (bf16 passes on TPU/oneDNN CPU), which is too lossy for Fourier mixing
    # — the reference computes fp32 FFTs. These matmuls are tiny next to the
    # conv stack, so full precision costs nothing measurable.
    ein = functools.partial(
        jnp.einsum, precision="highest", preferred_element_type=x.dtype
    )
    t_cos = ein("km,bmh->bkh", cs, x)
    t_sin = ein("km,bmh->bkh", ss, x)
    return ein("bkh,hj->bkj", t_cos, ch) - ein("bkh,hj->bkj", t_sin, sh)


_FOURIER_IMPLS = {
    "fft": fourier_real_fft2,
    "dft_matmul": fourier_real_dft_matmul,
}


def fnet_layer_init(key, hidden: int, intermediate: int, dtype=jnp.float32):
    # The reference builds FNetEncoder as a bare nn.Module (exec/eval path,
    # models/diffusion.py:153-155) so HF's _init_weights never runs — the
    # Linears keep torch's default kaiming-uniform init, reproduced here.
    k1, k2 = jax.random.split(key)
    return {
        "ln_fourier": layer_norm_init(hidden, dtype),
        "dense_in": linear_init(k1, hidden, intermediate, dtype=dtype),
        "dense_out": linear_init(k2, intermediate, hidden, dtype=dtype),
        "ln_out": layer_norm_init(hidden, dtype),
    }


def fnet_layer_apply(p, x, *, eps, drop_rate, fourier, train, rng):
    f = layer_norm_apply(p["ln_fourier"], x + fourier(x), eps=eps)
    y = linear_apply(p["dense_in"], f)
    y = gelu_new(y)
    y = linear_apply(p["dense_out"], y)
    y = dropout(rng, y, drop_rate, train=train)
    return layer_norm_apply(p["ln_out"], f + y, eps=eps)


def fnet_encoder_init(key, tcfg, dtype=jnp.float32):
    kw = tcfg.kwargs
    keys = jax.random.split(key, kw.num_hidden_layers)
    return {
        "layers": [
            fnet_layer_init(k, kw.hidden_size, kw.intermediate_size, dtype=dtype)
            for k in keys
        ]
    }


def fnet_encoder_apply(p, x, *, tcfg, train, rng):
    kw = tcfg.kwargs
    fourier = _FOURIER_IMPLS[getattr(tcfg, "fourier_impl", "dft_matmul")]
    for i, layer in enumerate(p["layers"]):
        lrng = jax.random.fold_in(rng, i) if rng is not None else None
        x = fnet_layer_apply(
            layer,
            x,
            eps=kw.layer_norm_eps,
            drop_rate=kw.hidden_dropout_prob,
            fourier=fourier,
            train=train,
            rng=lrng,
        )
    return x


ENCODER_REGISTRY = {
    "fnet": (fnet_encoder_init, fnet_encoder_apply),
    # Reference spelling (configs/audio.yml:31 uses module: FNetEncoder).
    "FNetEncoder": (fnet_encoder_init, fnet_encoder_apply),
}


def transformer_module_init(key, io_channels: int, tcfg, dtype=jnp.float32):
    """Embedding (posenc + LN + proj io→hidden + dropout), encoder,
    out-projection hidden→io (reference models/diffusion.py:148-167)."""
    k_proj, k_enc, k_out = jax.random.split(key, 3)
    enc_init, _ = ENCODER_REGISTRY[tcfg.module]
    return {
        "embedding": {
            "ln": layer_norm_init(io_channels, dtype),
            "projection": linear_init(k_proj, io_channels, tcfg.channels, dtype=dtype),
        },
        "encoder": enc_init(k_enc, tcfg, dtype=dtype),
        "compute_out": linear_init(k_out, tcfg.channels, io_channels, dtype=dtype),
    }


def transformer_module_apply(p, x, *, tcfg, train=False, rng=None):
    """x: [B, S, io_channels] → [B, S, io_channels].

    Positional table sized to the next power of two of S (the reference's
    lazily (re)built cache, models/diffusion.py:131-140, minus its inverted
    rebuild-condition bug — static shapes make the cache a constant here).
    """
    b, s, c = x.shape
    pow2 = 1 << max(0, (s - 1).bit_length())
    te = jnp.asarray(sinusoid_table(pow2, c)[:s], dtype=x.dtype)
    x = x + te

    kw = tcfg.kwargs
    x = layer_norm_apply(p["embedding"]["ln"], x, eps=kw.layer_norm_eps)
    x = linear_apply(p["embedding"]["projection"], x)
    if rng is not None:
        e_rng, enc_rng = jax.random.split(rng)
    else:
        e_rng = enc_rng = None
    x = dropout(e_rng, x, kw.hidden_dropout_prob, train=train)

    _, enc_apply = ENCODER_REGISTRY[tcfg.module]
    x = enc_apply(p["encoder"], x, tcfg=tcfg, train=train, rng=enc_rng)
    return linear_apply(p["compute_out"], x)
