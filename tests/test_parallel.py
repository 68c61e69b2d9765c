"""Parallelism tests on the virtual 8-device CPU mesh: sequence-parallel
forward == single-device forward; DP-sharded train step == replicated math;
mesh construction; graft-entry dryrun."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ddim_audio_tpu.models.unet import apply_model, init_model
from ddim_audio_tpu.parallel.mesh import make_mesh, shard_batch
from ddim_audio_tpu.parallel.sp import apply_model_sp


@pytest.fixture(scope="module")
def sp_mesh():
    devices = mesh_utils.create_device_mesh((4,), jax.devices()[:4])
    return Mesh(devices, ("sp",))


def test_sp_forward_matches_single_device(tiny_cfg, sp_mesh):
    params = init_model(jax.random.key(0), tiny_cfg)
    x = jax.random.normal(jax.random.key(1), (2, 2, 32, 16))
    t = jnp.array([3, 40])

    ref = apply_model(params, x, t, tiny_cfg)
    out = apply_model_sp(params, x, t, tiny_cfg, sp_mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_sp_forward_jitted(tiny_cfg, sp_mesh):
    params = init_model(jax.random.key(0), tiny_cfg)
    x = jax.random.normal(jax.random.key(2), (1, 2, 64, 16))
    t = jnp.array([7])
    ref = apply_model(params, x, t, tiny_cfg)

    fn = jax.jit(lambda p, xx, tt: apply_model_sp(p, xx, tt, tiny_cfg, sp_mesh))
    out = fn(params, x, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_sp_rejects_indivisible_T(tiny_cfg, sp_mesh):
    params = init_model(jax.random.key(0), tiny_cfg)
    x = jax.random.normal(jax.random.key(1), (1, 2, 24, 16))
    with pytest.raises(ValueError):
        apply_model_sp(params, x, jnp.array([0]), tiny_cfg, sp_mesh)


def test_make_mesh_and_shard_batch():
    assert make_mesh(None) is None

    from ddim_audio_tpu.utils.namespace import dict2namespace

    mesh = make_mesh(dict2namespace({"dp": 4, "sp": 2}))
    assert mesh.shape == {"dp": 4, "sp": 2}
    x = jnp.zeros((8, 2, 4, 4))
    xs = shard_batch(mesh, x)
    assert xs.sharding.spec == P("dp")

    with pytest.raises(ValueError):
        make_mesh(dict2namespace({"dp": 16, "sp": 1}))


def test_dp_train_step_matches_single_device(tiny_cfg):
    """The jitted train step with a dp-sharded batch produces the same loss
    and params as unsharded execution (XLA inserts the collectives)."""
    from ddim_audio_tpu.config import load_config
    from ddim_audio_tpu.diffusion.schedules import make_schedule
    from ddim_audio_tpu.training import init_train_state, make_train_step

    config = load_config("configs/audio_tiny.yml")
    sched = make_schedule("linear", 1e-4, 0.02, tiny_cfg.num_timesteps)

    devices = mesh_utils.create_device_mesh((4,), jax.devices()[:4])
    mesh = Mesh(devices, ("dp",))
    x = jax.random.normal(jax.random.key(1), (4, 2, 8, 16)) * 0.5
    rng = jax.random.key(9)

    results = []
    for shard in (False, True):
        params = init_model(jax.random.key(0), tiny_cfg)
        state, tx = init_train_state(params, config.optimization, use_ema=True)
        step = make_train_step(tiny_cfg, config, sched.alphas_cumprod, tx)
        xs = x
        if shard:
            state = jax.device_put(state, NamedSharding(mesh, P()))
            xs = jax.device_put(x, NamedSharding(mesh, P("dp")))
        state, m = step(state, xs, rng)
        results.append((float(m["loss"]), state.params))

    assert results[0][0] == pytest.approx(results[1][0], rel=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(results[0][1]),
        jax.tree_util.tree_leaves(results[1][1]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_graft_entry_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_graft_entry_shapes():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (2, 2, 1024, 256)


def test_multihost_helpers(monkeypatch):
    """parallel/multihost.py on the virtual mesh: every line executes —
    initialize() wiring (with a recording stub), per-host batch slicing,
    and global-array assembly from host shards."""
    import numpy as np

    from ddim_audio_tpu.parallel import multihost
    from ddim_audio_tpu.parallel.mesh import make_mesh
    from ddim_audio_tpu.utils.namespace import dict2namespace

    recorded = {}

    def fake_init(**kwargs):
        recorded.update(kwargs)

    monkeypatch.setattr(multihost.jax.distributed, "initialize", fake_init)
    multihost.initialize()
    assert recorded == {}
    multihost.initialize("10.0.0.1:1234", num_processes=2, process_id=1)
    assert recorded == {
        "coordinator_address": "10.0.0.1:1234",
        "num_processes": 2,
        "process_id": 1,
    }

    # single-process: the host owns the whole batch
    assert multihost.host_batch_slice(8) == slice(0, 8)

    mesh = make_mesh(dict2namespace({"dp": 8, "sp": 1}))
    host_data = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    arr = multihost.global_array_from_host_shards(mesh, host_data, 8)
    assert arr.shape == (8, 3)
    np.testing.assert_array_equal(np.asarray(arr), host_data)
    assert len(arr.sharding.device_set) == 8

    # simulated 4-host topology: each process gets its contiguous quarter
    monkeypatch.setattr(multihost.jax, "process_count", lambda: 4)
    monkeypatch.setattr(multihost.jax, "process_index", lambda: 2)
    assert multihost.host_batch_slice(8) == slice(4, 6)
    with pytest.raises(ValueError):
        multihost.host_batch_slice(9)
