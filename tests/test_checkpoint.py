"""Checkpoint round-trip: full TrainState (params + every optimizer state +
EMA + step) survives save/load — fixing the reference's resume bugs
(SURVEY.md §2.20b/c) by design."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddim_audio_tpu.checkpoint import (
    checkpoint_path,
    load_checkpoint,
    save_checkpoint,
)
from ddim_audio_tpu.config import load_config
from ddim_audio_tpu.diffusion.schedules import make_schedule
from ddim_audio_tpu.models.unet import init_model
from ddim_audio_tpu.training import init_train_state, make_train_step


@pytest.fixture(scope="module")
def trained_state(tmp_path_factory):
    from tests.conftest import tiny_model_config

    cfg = tiny_model_config()
    config = load_config("configs/audio_tiny.yml")
    sched = make_schedule("linear", 1e-4, 0.02, cfg.num_timesteps)
    params = init_model(jax.random.key(0), cfg)
    state, tx = init_train_state(params, config.optimization, use_ema=True)
    step_fn = make_train_step(cfg, config, sched.alphas_cumprod, tx)
    x0 = jax.random.normal(jax.random.key(1), (2, 2, 8, 16))
    rng = jax.random.key(3)
    for _ in range(3):
        state, _ = step_fn(state, x0, rng)
    return cfg, config, sched, state, step_fn, x0, rng


def test_checkpoint_roundtrip(trained_state, tmp_path):
    cfg, config, sched, state, step_fn, x0, rng = trained_state
    path = save_checkpoint(str(tmp_path), state, 3, epoch=1)
    assert os.path.basename(path) == "ckpt_3.npz"
    assert os.path.exists(tmp_path / "ckpt.npz")

    params = init_model(jax.random.key(99), cfg)  # different init
    template, _ = init_train_state(params, config.optimization, use_ema=True)
    loaded, meta = load_checkpoint(str(tmp_path / "ckpt.npz"), template)
    assert meta["step"] == 3 and meta["epoch"] == 1

    for a, b in zip(
        jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(loaded)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_continues_identically(trained_state, tmp_path):
    """One more step from the live state == one more step from the restored
    state (bit-identical training resume)."""
    cfg, config, sched, state, step_fn, x0, rng = trained_state
    save_checkpoint(str(tmp_path), state, 3)

    params = init_model(jax.random.key(5), cfg)
    template, _ = init_train_state(params, config.optimization, use_ema=True)
    restored, _ = load_checkpoint(str(tmp_path / "ckpt.npz"), template)

    s1, m1 = step_fn(state, x0, rng)
    s2, m2 = step_fn(restored, x0, rng)
    assert float(m1["loss"]) == float(m2["loss"])
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_mismatch_raises(trained_state, tmp_path):
    cfg, config, sched, state, step_fn, x0, rng = trained_state
    save_checkpoint(str(tmp_path), {"a": jnp.zeros(3)}, 0)
    with pytest.raises((KeyError, ValueError)):
        load_checkpoint(str(tmp_path / "ckpt.npz"), {"a": jnp.zeros(4)})
    with pytest.raises((KeyError, ValueError)):
        load_checkpoint(str(tmp_path / "ckpt.npz"), {"b": jnp.zeros(3)})


def test_checkpoint_path_resolution(tmp_path):
    assert checkpoint_path("/x", None).endswith("ckpt.npz")
    assert checkpoint_path("/x", 5000).endswith("ckpt_5000.npz")
