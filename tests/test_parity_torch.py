"""Golden parity vs the PyTorch reference model (matched weights, fixed
inputs). SURVEY.md §4: the north star demands matched-seed trajectory parity
within fp32 tolerance; these tests pin the denoiser forward.
"""

import numpy as np
import pytest

from tests import torch_ref

pytestmark = pytest.mark.skipif(
    not torch_ref.reference_available(), reason="reference checkout not present"
)

TINY_TKW = {
    "hidden_size": 32,
    "num_hidden_layers": 2,
    "intermediate_size": 64,
    "hidden_act": "gelu_new",
    "hidden_dropout_prob": 0.1,
    "initializer_range": 0.02,
    "layer_norm_eps": 1e-6,
}


def _jax_cfg(ch, krn, res, f_size, channels, num_timesteps, tkwargs):
    from ddim_audio_tpu.models.unet import ModelConfig
    from ddim_audio_tpu.utils.namespace import dict2namespace

    transformers = dict2namespace(
        {
            "module": "fnet",
            "kwargs": dict(tkwargs),
            "channels": tkwargs["hidden_size"],
            "dtype": None,
            "fourier_impl": "dft_matmul",
        }
    )
    return ModelConfig(
        channels=channels,
        f_size=f_size,
        ch=tuple(ch),
        krn=tuple(krn),
        res=tuple(res),
        num_timesteps=num_timesteps,
        transformers=transformers,
    )


def _run_parity(ch, krn, res, f_size, channels, T, B, tkwargs, num_timesteps, atol):
    import torch

    import jax.numpy as jnp
    from ddim_audio_tpu.models.unet import apply_model, count_params

    torch.manual_seed(0)
    ref = torch_ref.build_reference_model(
        ch, krn, res, f_size, channels, num_timesteps, tkwargs
    )
    params = torch_ref.torch_to_params(ref)
    cfg = _jax_cfg(ch, krn, res, f_size, channels, num_timesteps, tkwargs)

    n_ref = sum(p.numel() for p in ref.parameters())
    assert count_params(params) == n_ref

    rng = np.random.default_rng(42)
    x = rng.standard_normal((B, channels, T, f_size)).astype(np.float32)
    t = rng.integers(0, num_timesteps, size=(B,))

    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    out_jax = np.asarray(apply_model(params, jnp.asarray(x), jnp.asarray(t), cfg))

    assert out_jax.shape == out_ref.shape
    np.testing.assert_allclose(out_jax, out_ref, atol=atol, rtol=1e-4)


def test_tiny_model_parity():
    _run_parity(
        ch=(8, 16, 24),
        krn=(3, 3, 3),
        res=(1, 1, 2),
        f_size=16,
        channels=2,
        T=8,
        B=2,
        tkwargs=TINY_TKW,
        num_timesteps=50,
        atol=2e-4,
    )


@pytest.mark.slow
def test_full_model_parity():
    """audio.yml-scale model, short T (=64, reference-verified shape)."""
    tkw = {
        "hidden_size": 512,
        "num_hidden_layers": 12,
        "intermediate_size": 2048,
        "hidden_act": "gelu_new",
        "hidden_dropout_prob": 0.1,
        "initializer_range": 0.02,
        "layer_norm_eps": 1e-6,
    }
    _run_parity(
        ch=(32, 64, 96, 128, 192, 256),
        krn=(3, 3, 3, 3, 3, 3),
        res=(2, 2, 3, 3, 3, 3),
        f_size=256,
        channels=2,
        T=64,
        B=1,
        tkwargs=tkw,
        num_timesteps=1000,
        atol=1e-3,
    )


def test_conv_transpose_parity():
    """ConvTranspose2d k4 s2 p1 exact semantics (SURVEY.md §7 hard part b)."""
    import torch

    import jax.numpy as jnp
    from ddim_audio_tpu.models.layers import conv_transpose_apply

    torch.manual_seed(1)
    m = torch.nn.ConvTranspose2d(6, 4, kernel_size=4, stride=2, padding=1)
    x = torch.randn(2, 6, 8, 10)
    with torch.no_grad():
        ref = m(x).numpy()
    p = torch_ref._conv_transpose(m)
    out = np.asarray(
        conv_transpose_apply(
            {k: jnp.asarray(v) for k, v in p.items()},
            jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        )
    ).transpose(0, 3, 1, 2)
    assert out.shape == ref.shape  # (2, 4, 16, 20)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_groupnorm_parity():
    import torch

    import jax.numpy as jnp
    from ddim_audio_tpu.models.layers import group_norm_apply

    torch.manual_seed(2)
    m = torch.nn.GroupNorm(8, 24, eps=1e-6)
    with torch.no_grad():
        m.weight.mul_(1.7).add_(0.1)
        m.bias.add_(0.3)
    x = torch.randn(3, 24, 4, 6)
    with torch.no_grad():
        ref = m(x).numpy()
    p = {"g": jnp.asarray(m.weight.detach().numpy()), "b": jnp.asarray(m.bias.detach().numpy())}
    out = np.asarray(
        group_norm_apply(p, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_beta_embedding_parity():
    """Sinusoid table + MLP vs the reference BetaEmbedding."""
    import torch

    import jax.numpy as jnp
    from ddim_audio_tpu.models.embeddings import beta_embedding_apply

    torch_ref._install_stubs()
    import sys

    if torch_ref.REFERENCE not in sys.path:
        sys.path.append(torch_ref.REFERENCE)
    from models.diffusion import BetaEmbedding

    torch.manual_seed(3)
    ref = BetaEmbedding(100, 48)
    params = {"mlp": [torch_ref._linear(m) for m in ref.weight]}
    t = np.array([0, 7, 99])
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(t)).numpy()
    out = np.asarray(
        beta_embedding_apply(
            {"mlp": [{k: jnp.asarray(v) for k, v in m.items()} for m in params["mlp"]]},
            jnp.asarray(t),
            num_timesteps=100,
        )
    )
    np.testing.assert_allclose(out, out_ref, atol=1e-5)
