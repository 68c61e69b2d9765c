"""Training-stack tests: Noam schedule golden, antithetic sampling, AdaBelief
semantics (incl. step clip), param grouping vs reference behavior, loss parity
vs executed reference loss, and end-to-end loss-decreases."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddim_audio_tpu.config import load_config
from ddim_audio_tpu.diffusion.schedules import make_schedule
from ddim_audio_tpu.training import (
    adabelief,
    antithetic_timesteps,
    init_train_state,
    make_train_step,
    noam_schedule,
)
from ddim_audio_tpu.training.grouping import classify_top_level, group_labels
from ddim_audio_tpu.training.optim import build_group_optimizer


def test_noam_schedule_golden():
    """min(((1+s)/w)^-0.5, (1+s)/w) — reference functions/__init__.py:53-60."""
    sched = noam_schedule(0.0005, 10000)
    for s in [0, 1, 9999, 10000, 100000]:
        expect = 0.0005 * min(((1 + s) / 10000) ** -0.5, (1 + s) / 10000)
        assert float(sched(jnp.asarray(s))) == pytest.approx(expect, rel=1e-4)
    # warmup peak at s = w - 1
    assert float(sched(jnp.asarray(9999))) == pytest.approx(0.0005, rel=1e-4)


def test_antithetic_timesteps():
    t = antithetic_timesteps(jax.random.key(0), 14, 1000)
    t = np.asarray(t)
    assert t.shape == (14,) and t.min() >= 0 and t.max() < 1000
    # first half pairs with (T - t - 1); n=14 → 7 pairs
    np.testing.assert_array_equal(t[7:], 1000 - t[:7] - 1)
    # odd n truncates
    t = np.asarray(antithetic_timesteps(jax.random.key(1), 5, 100))
    assert t.shape == (5,)
    np.testing.assert_array_equal(t[3:], 100 - t[:2] - 1)


def test_adabelief_matches_manual_numpy():
    """Two steps of AdaBelief vs a from-scratch numpy implementation."""
    lr, b1, b2, eps, wd = 0.01, 0.9, 0.999, 1e-8, 0.1
    opt = adabelief(lr, b1, b2, eps, weight_decay=wd)
    p = {"w": jnp.asarray([1.0, -2.0, 3.0])}
    state = opt.init(p)
    g1 = {"w": jnp.asarray([0.1, 0.2, -0.3])}
    g2 = {"w": jnp.asarray([-0.05, 0.15, 0.25])}

    # numpy mirror
    w = np.array([1.0, -2.0, 3.0])
    m = np.zeros(3)
    s = np.zeros(3)
    for k, g in enumerate([np.asarray(g1["w"]), np.asarray(g2["w"])], start=1):
        m = b1 * m + (1 - b1) * g
        s = b2 * s + (1 - b2) * (g - m) ** 2 + eps
        m_hat = m / (1 - b1**k)
        s_hat = s / (1 - b2**k)
        upd = -lr * m_hat / (np.sqrt(s_hat) + eps) - lr * wd * w
        w = w + upd

    for g in [g1, g2]:
        updates, state = opt.update(g, state, p)
        p = jax.tree_util.tree_map(lambda a, u: a + u, p, updates)
    np.testing.assert_allclose(np.asarray(p["w"]), w, rtol=1e-5)


def test_adabelief_clip_step_bounds_update():
    opt = adabelief(1.0, 0.9, 0.999, 1e-8, clip_step=0.001, norm_ord=2)
    p = {"w": jnp.zeros(10)}
    state = opt.init(p)
    g = {"w": jnp.full(10, 5.0)}
    updates, state = opt.update(g, state, p)
    n = float(jnp.linalg.norm(updates["w"]))
    assert n <= 0.001 + 1e-9
    assert float(state.update_norm) == pytest.approx(n, rel=1e-5)


def test_grouping_matches_reference_behavior():
    """audio.yml: 'transformer' top-level → transformer group; temb /
    down_modules / up_modules → default. grad_norm groups both empty →
    everything clips in default (verified reference behavior, SURVEY §2.12)."""
    config = load_config("configs/audio.yml")
    mapping = classify_top_level(config.optimization.optimizer)
    assert mapping == {"transformer": "transformer"}

    params = {
        "temb": {"w": jnp.zeros(1)},
        "down_modules": {"w": jnp.zeros(1)},
        "up_modules": {"w": jnp.zeros(1)},
        "transformer": {"w": jnp.zeros(1)},
    }
    labels, groups = group_labels(config.optimization.optimizer, params)
    assert labels["transformer"]["w"] == "transformer"
    assert labels["temb"]["w"] == "default"
    assert set(groups) == {"transformer", "default"}

    labels_gn, groups_gn = group_labels(config.optimization.grad_norm, params)
    assert all(
        leaf == "default" for leaf in jax.tree_util.tree_leaves(labels_gn)
    )
    assert set(groups_gn) == {"default"}
    assert groups_gn["default"].grad_clip == 1


def test_loss_parity_with_reference(tiny_cfg):
    """noise_estimation_loss vs the executed reference loss at matched
    weights/inputs (reference functions/losses.py:4-18)."""
    from tests import torch_ref

    if not torch_ref.reference_available():
        pytest.skip("no reference")
    import sys
    import torch

    if torch_ref.REFERENCE not in sys.path:
        sys.path.append(torch_ref.REFERENCE)
    from functions.losses import noise_estimation_loss as ref_loss

    torch.manual_seed(0)
    model = torch_ref.build_reference_model(
        ch=(8, 16, 24), krn=(3, 3, 3), res=(1, 1, 2), f_size=16, channels=2,
        num_timesteps=50,
        tkwargs=dict(
            hidden_size=32, num_hidden_layers=2, intermediate_size=64,
            hidden_act="gelu_new", hidden_dropout_prob=0.1,
            initializer_range=0.02, layer_norm_eps=1e-6,
        ),
    )
    model.eval()  # disable dropout for a deterministic comparison
    params = jax.tree_util.tree_map(jnp.asarray, torch_ref.torch_to_params(model))

    sched = make_schedule("linear", 1e-4, 0.02, 50)
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((4, 2, 8, 16)).astype(np.float32)
    e = rng.standard_normal((4, 2, 8, 16)).astype(np.float32)
    t = np.array([0, 10, 25, 49])

    with torch.no_grad():
        ref = ref_loss(
            model,
            torch.from_numpy(x0),
            torch.from_numpy(t),
            torch.from_numpy(e),
            torch.from_numpy(sched.alphas_cumprod.astype(np.float32)),
        ).item()

    from ddim_audio_tpu.models.unet import apply_model
    from ddim_audio_tpu.training.losses import noise_estimation_loss

    def apply_fn(p, x, tt):
        return apply_model(p, x, tt, tiny_cfg, train=False)

    ours = float(
        noise_estimation_loss(
            apply_fn,
            params,
            jnp.asarray(x0),
            jnp.asarray(t),
            jnp.asarray(e),
            jnp.asarray(sched.alphas_cumprod.astype(np.float32)),
        )
    )
    assert ours == pytest.approx(ref, rel=1e-4)


def test_grad_accum_runs_and_learns(tiny_cfg):
    """grad_accum=2 microbatching: same loss scale, state advances, loss
    decreases (exact gradient equivalence modulo the per-microbatch noise
    draw)."""
    import copy

    from ddim_audio_tpu.models.unet import init_model

    config = load_config("configs/audio_tiny.yml")
    config.training = copy.deepcopy(config.training)
    config.training.grad_accum = 2
    sched = make_schedule("linear", 1e-4, 0.02, tiny_cfg.num_timesteps)
    params = init_model(jax.random.key(0), tiny_cfg)
    state, tx = init_train_state(params, config.optimization, use_ema=True)
    step = make_train_step(tiny_cfg, config, sched.alphas_cumprod, tx)

    x0 = jax.random.normal(jax.random.key(1), (4, 2, 8, 16)) * 0.5
    rng = jax.random.key(0)
    losses = []
    for _ in range(40):
        state, m = step(state, x0, rng)
        losses.append(float(m["loss"]))
    assert int(state.step) == 40
    assert np.mean(losses[-10:]) < np.mean(losses[:10])

    # indivisible batch → clear error
    config.training.grad_accum = 3
    step_bad = make_train_step(tiny_cfg, config, sched.alphas_cumprod, tx)
    with pytest.raises(ValueError):
        step_bad(state, x0, rng)


def test_train_step_loss_decreases(tiny_cfg):
    """End-to-end: N jitted steps on a fixed tiny batch drive the loss down
    and advance step/EMA (SURVEY §4 integration strategy)."""
    from ddim_audio_tpu.models.unet import init_model

    config = load_config("configs/audio_tiny.yml")
    sched = make_schedule("linear", 1e-4, 0.02, tiny_cfg.num_timesteps)
    params = init_model(jax.random.key(0), tiny_cfg)
    state, tx = init_train_state(params, config.optimization, use_ema=True)
    step = make_train_step(tiny_cfg, config, sched.alphas_cumprod, tx)

    x0 = jax.random.normal(jax.random.key(1), (4, 2, 8, 16)) * 0.5
    rng = jax.random.key(42)
    losses = []
    for _ in range(30):
        state, metrics = step(state, x0, rng)
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 30
    assert "update_norm_default" in metrics
    assert "grad_norm" in metrics
    # averaged over last-5 vs first-5 to smooth the noise of random t/e
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    # EMA trails params but moves
    diff = jax.tree_util.tree_map(
        lambda e_, p_: float(jnp.abs(e_ - p_).max()), state.ema, state.params
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 0


def test_train_step_bf16_tracks_fp32(tiny_cfg):
    """Mixed-precision training (model.dtype: bfloat16 — master params,
    optimizer states, and EMA stay fp32; activations/weights cast at
    apply): the loss trajectory must track the fp32 step closely. Measured
    production win: 0.549 -> 0.441 s/step at batch 14 (BASELINE.md round
    5); this pins the numerics so the option cannot silently rot."""
    import dataclasses

    from ddim_audio_tpu.models.unet import init_model

    config = load_config("configs/audio_tiny.yml")
    sched = make_schedule("linear", 1e-4, 0.02, tiny_cfg.num_timesteps)
    x0 = jax.random.normal(jax.random.key(1), (2, 2, 8, 16)) * 0.5
    rng = jax.random.key(42)

    traces = {}
    for name, dtype in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        cfg = dataclasses.replace(tiny_cfg, dtype=dtype)
        params = init_model(jax.random.key(0), cfg)
        # master leaves are fp32 regardless of compute dtype
        assert all(l.dtype == jnp.float32
                   for l in jax.tree_util.tree_leaves(params))
        state, tx = init_train_state(params, config.optimization,
                                     use_ema=True)
        step = make_train_step(cfg, config, sched.alphas_cumprod, tx)
        losses = []
        for _ in range(5):
            state, metrics = step(state, x0, rng)
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(losses)), losses
        assert all(l.dtype == jnp.float32
                   for l in jax.tree_util.tree_leaves(state.params))
        traces[name] = np.asarray(losses)

    # bf16 rounding perturbs each step a little; the trajectories must
    # stay within a few percent of each other throughout
    rel = np.abs(traces["bf16"] - traces["fp32"]) / traces["fp32"]
    assert rel.max() < 0.05, (rel, traces)


# ---- optimizer factory vs torch (reference functions/__init__.py:5-50) ----

def _run_factory_vs_torch(name, steps=4, **cfg_kwargs):
    """Run `steps` identical (param, grad) trajectories through the factory
    transform and the matching torch optimizer; return both final params."""
    import torch

    from ddim_audio_tpu.utils.namespace import dict2namespace

    rng_ = np.random.default_rng(7)
    p0 = rng_.standard_normal((5, 3)).astype(np.float32)
    grads = [rng_.standard_normal((5, 3)).astype(np.float32) for _ in range(steps)]

    base = dict(optimizer=name, lr=0.01, beta=[0.9, 0.999], eps=1e-8)
    base.update(cfg_kwargs)
    tx = build_group_optimizer(dict2namespace(base))
    p = {"w": jnp.asarray(p0)}
    state = tx.init(p)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, p)
        p = jax.tree_util.tree_map(lambda a, u: a + u, p, updates)

    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    kw = dict(lr=0.01)
    if name in ("Adam", "AdamW"):
        kw.update(
            betas=tuple(base["beta"]), eps=base["eps"],
            weight_decay=base.get("weight_decay", 0.0),
            amsgrad=base.get("amsgrad", False),
        )
        topt = (torch.optim.Adam if name == "Adam" else torch.optim.AdamW)([tp], **kw)
    elif name == "RMSProp":
        topt = torch.optim.RMSprop(
            [tp], weight_decay=base.get("weight_decay", 0.0), **kw
        )
    elif name == "SGD":
        topt = torch.optim.SGD([tp], momentum=0.9, **kw)
    for g in grads:
        tp.grad = torch.from_numpy(g.copy())
        topt.step()
    return np.asarray(p["w"]), tp.detach().numpy()


@pytest.mark.parametrize(
    "name,kwargs",
    [
        ("Adam", {}),
        ("Adam", {"weight_decay": 0.1}),          # torch L2-into-grad
        ("Adam", {"weight_decay": 0.1, "amsgrad": True}),
        ("AdamW", {"weight_decay": 0.1}),         # decoupled
        ("AdamW", {"weight_decay": 0.1, "amsgrad": True}),
        ("RMSProp", {}),
        ("RMSProp", {"weight_decay": 0.1}),
        ("SGD", {}),
    ],
)
def test_factory_matches_torch(name, kwargs):
    ours, theirs = _run_factory_vs_torch(name, **kwargs)
    np.testing.assert_allclose(ours, theirs, rtol=2e-5, atol=1e-7)
