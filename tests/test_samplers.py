"""Sampler tests: closed-form checks, chunking invariance, select semantics,
and matched-noise trajectory parity against the executed reference sampler
code (functions/denoising.py run on CPU with its cuda literals shimmed)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddim_audio_tpu.diffusion.schedules import make_schedule
from ddim_audio_tpu.sampling import ScanSampler, selected_steps
from ddim_audio_tpu.sampling.ddim import ddim_coefficients
from tests import torch_ref

SCHED = make_schedule("linear", 1e-4, 0.02, 50)
SHAPE = (2, 2, 8, 16)


def _zero_denoiser(params, x, t):
    return jnp.zeros_like(x)


def _linear_denoiser(params, x, t):
    return 0.1 * x


def test_ddim_coefficients_eta0():
    c = ddim_coefficients(SCHED.alphas_cumprod, range(0, 50, 5), eta=0.0)
    assert np.all(c["c1"] == 0)
    np.testing.assert_allclose(
        c["c2"], np.sqrt(1 - c["at_next"]), rtol=1e-6
    )
    # first scan step is the highest timestep
    assert c["t"][0] == 45 and c["t"][-1] == 0
    assert c["at_next"][-1] == 1.0  # boundary j=-1 → alpha=1


def test_closed_form_zero_eps():
    """With eps ≡ 0 and eta = 0: x0 = x/sqrt(at), x_next = sqrt(at_next)/sqrt(at)·x;
    composing over all steps gives x_final = x / sqrt(at_first)."""
    s = ScanSampler(_zero_denoiser, kind="generalized", scan_chunk=7)
    x = jax.random.normal(jax.random.key(0), SHAPE)
    seq = list(range(0, 50, 5))
    xs, x0s = s.sample(x, seq, SCHED, eta=0.0, select_index=None)
    at_first = np.float32(SCHED.alphas_cumprod.astype(np.float32)[45])
    np.testing.assert_allclose(
        xs[-1], np.asarray(x) / np.sqrt(at_first), rtol=2e-5
    )
    assert len(xs) == len(seq) + 1 and len(x0s) == len(seq)
    np.testing.assert_array_equal(xs[0], np.asarray(x))


def test_chunking_invariance():
    x = jax.random.normal(jax.random.key(1), SHAPE)
    seq = list(range(0, 50, 3))
    outs = []
    for chunk in (1, 4, 100):
        s = ScanSampler(_linear_denoiser, kind="generalized", scan_chunk=chunk)
        xs, x0s = s.sample(x, seq, SCHED, eta=0.0, select_index=None)
        outs.append((np.stack(xs), np.stack(x0s)))
    for other in outs[1:]:
        np.testing.assert_allclose(outs[0][0], other[0], atol=1e-6)
        np.testing.assert_allclose(outs[0][1], other[1], atol=1e-6)


def test_select_index_semantics():
    K = 17
    assert selected_steps(K, None) == list(range(K))
    assert selected_steps(K, [-1]) == [K - 1]
    assert selected_steps(K, [0, 5, -1]) == [0, 5, 16]
    assert selected_steps(K, set([2, 2, 3])) == [2, 3]

    x = jax.random.normal(jax.random.key(2), SHAPE)
    seq = list(range(0, 50, 3))
    s = ScanSampler(_linear_denoiser, kind="generalized", scan_chunk=5)
    xs_all, x0_all = s.sample(x, seq, SCHED, eta=0.0, select_index=None)
    sel = [0, 7, -1]
    xs_sel, x0_sel = s.sample(x, seq, SCHED, eta=0.0, select_index=sel)
    kept = selected_steps(len(seq), sel)
    assert len(xs_sel) == len(kept) + 1
    # sparse selections route non-kept stretches through the buffer-free
    # fast program whose XLA fusion differs in the last bit from the
    # buffered one — semantics match, bit patterns may not
    for out_i, k in enumerate(kept):
        np.testing.assert_allclose(xs_sel[1 + out_i], xs_all[1 + k], atol=2e-5)
        np.testing.assert_allclose(x0_sel[out_i], x0_all[k], atol=2e-5)


def test_chunk_plan_homogeneous_runs():
    """The plan splits at kept↔non-kept transitions (so non-kept stretches
    run the buffer-free fast program) while covering every step exactly
    once, in order, under the scan_chunk / max_slots limits."""
    from ddim_audio_tpu.sampling.driver import _chunk_plan

    for num_steps, sel, scan_chunk, max_slots in [
        (100, list(range(10, 100, 11)), 100, 1000),  # --sequence ~10
        (100, list(range(100)), 25, 7),              # --sequence -1
        (17, [], 5, 3),                              # nothing kept
        (13, [0, 1, 2, 12], 4, 2),                   # runs + limits
        (1, [0], 100, 100),
    ]:
        plan = _chunk_plan(num_steps, sel, scan_chunk, max_slots)
        sel_set = set(sel)
        # exact ordered cover
        assert plan[0][0] == 0 and plan[-1][1] == num_steps
        for (s0, e0, _), (s1, _, _) in zip(plan, plan[1:]):
            assert e0 == s1
        for start, stop, kept in plan:
            assert stop - start <= scan_chunk
            assert len(kept) <= max_slots
            assert kept == [k for k in range(start, stop) if k in sel_set]
            # homogeneous: a chunk is all-kept or all-non-kept
            assert len(kept) in (0, stop - start)


def test_sample_last_matches_full():
    x = jax.random.normal(jax.random.key(3), SHAPE)
    seq = list(range(0, 50, 5))
    s = ScanSampler(_linear_denoiser, kind="generalized", scan_chunk=4)
    xs, _ = s.sample(x, seq, SCHED, eta=0.0, select_index=[-1])
    last = s.sample_last(x, seq, SCHED, eta=0.0)
    np.testing.assert_allclose(np.asarray(last), xs[-1], atol=1e-6)


def test_eta_noise_deterministic_given_key():
    x = jax.random.normal(jax.random.key(4), SHAPE)
    seq = list(range(0, 50, 5))
    s = ScanSampler(_linear_denoiser, kind="generalized", scan_chunk=3)
    k = jax.random.key(9)
    a, _ = s.sample(x, seq, SCHED, eta=1.0, key=k)
    b, _ = s.sample(x, seq, SCHED, eta=1.0, key=k)
    np.testing.assert_array_equal(np.stack(a), np.stack(b))
    c, _ = s.sample(x, seq, SCHED, eta=1.0, key=jax.random.key(10))
    assert np.abs(np.stack(a)[-1] - np.stack(c)[-1]).max() > 1e-4


def test_ddpm_runs_and_supports_select():
    """The reference raises on select_index in ddpm_steps
    (functions/denoising.py:56-59); the rebuild supports it."""
    x = jax.random.normal(jax.random.key(5), SHAPE)
    seq = list(range(0, 50, 5))
    s = ScanSampler(_linear_denoiser, kind="ddpm_noisy", scan_chunk=4)
    xs, x0s = s.sample(x, seq, SCHED, key=jax.random.key(0), select_index=[-1])
    assert len(xs) == 2 and len(x0s) == 1
    assert np.all(np.abs(x0s[0]) <= 1.0)  # ddpm clamps x0 to [-1, 1]


# ---------------------------------------------------------------------------
# Matched-noise parity against the executed reference sampler code.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_setup():
    if not torch_ref.reference_available():
        pytest.skip("reference checkout not present")
    import torch

    torch.manual_seed(0)
    model = torch_ref.build_reference_model(
        ch=(8, 16, 24), krn=(3, 3, 3), res=(1, 1, 2), f_size=16, channels=2,
        num_timesteps=50,
        tkwargs={
            "hidden_size": 32, "num_hidden_layers": 2, "intermediate_size": 64,
            "hidden_act": "gelu_new", "hidden_dropout_prob": 0.1,
            "initializer_range": 0.02, "layer_norm_eps": 1e-6,
        },
    )
    params = torch_ref.torch_to_params(model)
    from tests.conftest import tiny_model_config
    from ddim_audio_tpu.models.unet import apply_model

    cfg = tiny_model_config()
    params = jax.tree_util.tree_map(jnp.asarray, params)

    def denoise(p, x, t):
        return apply_model(p if p is not None else params, x, t, cfg)

    return model, denoise


class _CudaShim:
    """Run the reference sampler code (cuda literals and all) on CPU.

    cuda→cpu mappings force a copy: on real CUDA ``.to("cpu")`` /
    ``.type("torch.cuda.FloatTensor")`` produce fresh tensors, and the
    reference mutates xt in place after appending those copies
    (functions/denoising.py:27,41-43) — aliasing here would corrupt the
    golden trajectory."""

    def __enter__(self):
        import torch

        self._type = torch.Tensor.type
        self._to = torch.Tensor.to
        orig_type, orig_to = self._type, self._to

        def patched_type(self_t, *args, **kw):
            if args and isinstance(args[0], str) and "cuda" in args[0]:
                args = (args[0].replace("torch.cuda.", "torch."),) + args[1:]
                return orig_type(self_t, *args, **kw).clone()
            return orig_type(self_t, *args, **kw)

        def patched_to(self_t, *args, **kw):
            if any(a == "cuda" for a in args) or args == ("cpu",):
                args = tuple("cpu" if a == "cuda" else a for a in args)
                return orig_to(self_t, *args, **kw).clone()
            return orig_to(self_t, *args, **kw)

        import torch as _t

        _t.Tensor.type = patched_type
        _t.Tensor.to = patched_to
        return self

    def __exit__(self, *exc):
        import torch

        torch.Tensor.type = self._type
        torch.Tensor.to = self._to


def _shared_noises(K, shape, seed=7):
    return np.random.default_rng(seed).standard_normal((K,) + shape).astype(np.float32)


def _ref_generalized(model, x, seq, alphas, eta, noises, select_index):
    import sys
    import torch

    if torch_ref.REFERENCE not in sys.path:
        sys.path.append(torch_ref.REFERENCE)
    from functions.denoising import generalized_steps

    it = iter(noises)
    orig = torch.randn_like
    torch.randn_like = lambda t, **kw: torch.from_numpy(next(it).copy())
    try:
        with _CudaShim(), torch.no_grad():
            xs, x0s = generalized_steps(
                torch.from_numpy(x.copy()),
                seq,
                model,
                torch.from_numpy(alphas.astype(np.float32)),
                select_index,
                eta=eta,
            )
    finally:
        torch.randn_like = orig
    return [t.numpy() for t in xs], [t.numpy() for t in x0s]


def _ref_ddpm(model, x, seq, betas, noises):
    import sys
    import torch

    if torch_ref.REFERENCE not in sys.path:
        sys.path.append(torch_ref.REFERENCE)
    from functions.denoising import ddpm_steps

    it = iter(noises)
    orig = torch.randn_like
    torch.randn_like = lambda t, **kw: torch.from_numpy(next(it).copy())
    try:
        with _CudaShim(), torch.no_grad():
            xs, x0s = ddpm_steps(
                torch.from_numpy(x.copy()),
                seq,
                model,
                torch.from_numpy(betas.astype(np.float32)),
                None,
            )
    finally:
        torch.randn_like = orig
    return [t.numpy() for t in xs], [t.numpy() for t in x0s]


@pytest.mark.parametrize("eta", [0.0, 1.0])
def test_generalized_trajectory_parity(ref_setup, eta):
    model, denoise = ref_setup
    seq = list(range(0, 50, 5))
    K = len(seq)
    x = np.random.default_rng(3).standard_normal(SHAPE).astype(np.float32)
    noises = _shared_noises(K, SHAPE)

    xs_ref, x0_ref = _ref_generalized(
        model, x, seq, SCHED.alphas_cumprod, eta, noises, select_index=None
    )
    s = ScanSampler(denoise, kind="generalized", scan_chunk=4)
    xs, x0s = s.sample(
        x, seq, SCHED, eta=eta, select_index=None, noise_override=noises
    )
    assert len(xs) == len(xs_ref) and len(x0s) == len(x0_ref)
    for a, b in zip(xs, xs_ref):
        np.testing.assert_allclose(a, b, atol=5e-4)
    for a, b in zip(x0s, x0_ref):
        np.testing.assert_allclose(a, b, atol=5e-3)  # x0 divides by sqrt(at)→amplifies


def test_ddpm_trajectory_parity(ref_setup):
    model, denoise = ref_setup
    seq = list(range(0, 50, 5))
    K = len(seq)
    x = np.random.default_rng(5).standard_normal(SHAPE).astype(np.float32)
    noises = _shared_noises(K, SHAPE, seed=11)

    xs_ref, x0_ref = _ref_ddpm(model, x, seq, SCHED.betas, noises)
    s = ScanSampler(denoise, kind="ddpm_noisy", scan_chunk=4)
    xs, x0s = s.sample(x, seq, SCHED, select_index=None, noise_override=noises)
    assert len(xs) == len(xs_ref) and len(x0s) == len(x0_ref)
    for a, b in zip(xs, xs_ref):
        np.testing.assert_allclose(a, b, atol=5e-4)
    for a, b in zip(x0s, x0_ref):
        np.testing.assert_allclose(a, b, atol=5e-3)


@pytest.mark.parametrize(
    "eta", [0.0, pytest.param(1.0, marks=pytest.mark.heavy)])
def test_flat_io_sampling_matches_nchw(eta):
    """The flat-io sampler state (channel-padded [B, T, F·ch0] carried
    across steps — runners/_sampler_for_state / bench.py) produces
    bit-matching real-lane trajectories vs the NCHW path: the head conv's
    zero-padded weight columns make junk lanes inert, kept states are
    sliced back via state_to_saved, and eta>0 noise is drawn channel-shaped
    then zero-padded (same RNG stream as the NCHW path)."""
    import dataclasses

    from jax.experimental.pallas import tpu as pltpu

    from ddim_audio_tpu.models.unet import (
        ModelConfig,
        apply_model,
        apply_model_flat_io,
        init_model,
    )
    from ddim_audio_tpu.utils.namespace import dict2namespace

    transformers = dict2namespace(
        {"module": "fnet",
         "kwargs": {"hidden_size": 32, "num_hidden_layers": 1,
                    "intermediate_size": 64, "hidden_act": "gelu_new",
                    "hidden_dropout_prob": 0.0, "initializer_range": 0.02,
                    "layer_norm_eps": 1e-6},
         "channels": 32, "dtype": None, "fourier_impl": "dft_matmul"})
    cfg = ModelConfig(
        channels=2, f_size=16, ch=(32, 64), krn=(3, 3), res=(1, 1),
        num_timesteps=20, transformers=transformers, conv_impl="pallas",
    )
    params = init_model(jax.random.key(0), cfg)
    sched = make_schedule("linear", 1e-4, 2e-2, 20)
    seq = list(range(0, 20, 4))
    x = jax.random.normal(jax.random.key(1), (2, 2, 32, 16), jnp.float32)
    key = jax.random.key(7)
    from ddim_audio_tpu.models.unet import flat_io_adapters

    to_flat, from_flat, noise_builder = flat_io_adapters(cfg)

    with pltpu.force_tpu_interpret_mode():
        ref_sampler = ScanSampler(
            lambda p, xx, t: apply_model(p, xx, t, cfg), kind="generalized",
            scan_chunk=3)
        ref_xs, ref_x0 = ref_sampler.sample(
            x, seq, sched, eta=eta, select_index={0, 2, 4},
            key=key, params=params)
        flat_sampler = ScanSampler(
            lambda p, xf, t: apply_model_flat_io(p, xf, t, cfg),
            kind="generalized", scan_chunk=3,
            state_to_saved=from_flat, noise_builder=noise_builder)
        flat_xs, flat_x0 = flat_sampler.sample(
            to_flat(x), seq, sched, eta=eta, select_index={0, 2, 4},
            key=key, params=params)
    assert len(ref_xs) == len(flat_xs) and len(ref_x0) == len(flat_x0)
    for a, b in zip(ref_xs, flat_xs):
        np.testing.assert_allclose(a, b, atol=1e-5)
    for a, b in zip(ref_x0, flat_x0):
        np.testing.assert_allclose(a, b, atol=1e-5)
