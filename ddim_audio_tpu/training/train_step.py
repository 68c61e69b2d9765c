"""The fused training step.

Capability parity with the reference train loop
(``runners/diffusion.py:130-199``): antithetic timestep sampling, simple
ε-loss, per-group gradient clipping, per-group optimizers with Noam warmup,
EMA — but as ONE jitted function over a TrainState pytree, with no host
synchronization inside the hot loop (the reference syncs every step via
``loss.item()`` + logging, SURVEY.md §3.1); metrics come back as device
scalars the host fetches at its own cadence.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..models.unet import apply_model
from .ema import ema_init, ema_update
from .losses import loss_registry
from .optim import AdaBeliefState, build_optimizer


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    ema: Optional[Any]
    step: jnp.ndarray  # int32 scalar


def antithetic_timesteps(key, n: int, num_timesteps: int):
    """t ∪ (T - t - 1), truncated to n (reference runners/diffusion.py:140-142)."""
    half = jax.random.randint(key, ((n + 1) // 2,), 0, num_timesteps)
    return jnp.concatenate([half, num_timesteps - half - 1])[:n]


def init_train_state(params, optimization_cfg, *, use_ema: bool) -> tuple:
    """Returns (state, tx). tx is needed again for update at each step."""
    tx = build_optimizer(optimization_cfg, params)
    return (
        TrainState(
            params=params,
            opt_state=tx.init(params),
            ema=ema_init(params) if use_ema else None,
            step=jnp.zeros((), jnp.int32),
        ),
        tx,
    )


def _collect_adabelief_stats(opt_state, out: dict, prefix=""):
    """Surface AdaBelief update-norm stats (the reference logs the stat dict
    returned by its optimizer.step(), runners/diffusion.py:162-171)."""
    if isinstance(opt_state, AdaBeliefState):
        out[f"update_norm{prefix}"] = opt_state.update_norm
        return out
    if hasattr(opt_state, "inner_states"):  # optax MultiTransformState
        for name, inner in opt_state.inner_states.items():
            _collect_adabelief_stats(inner, out, prefix=f"_{name}")
        return out
    if isinstance(opt_state, tuple):
        for part in opt_state:
            _collect_adabelief_stats(part, out, prefix)
    return out


def make_train_step(cfg, config, alphas_cumprod, tx, mesh=None):
    """cfg: ModelConfig; config: full audio.yml namespace; returns a jitted
    train_step(state, x0 [B,C,T,F], rng_root) -> (state, metrics).

    ``training.grad_accum`` (default 1) splits the batch into A microbatches
    scanned sequentially with gradient averaging — numerically identical to
    the full-batch gradient (the loss is a mean of per-sample sums), but the
    activation working set shrinks by A. Needed on a single 16 GB v5e chip:
    the fp32 batch-14 backward wants ~24 GB of HLO temps (XLA lane-pads the
    C=32/64 stages 4×), and the reference's batch-14 training config must
    still run (BASELINE.md).

    ``mesh`` (dp-only): the gradient computation runs under ``shard_map`` —
    each device computes its local-microbatch grads with the FULL per-sample
    model (so the flat Pallas kernels stay valid: GSPMD cannot partition
    custom calls, and without this every multi-device training run re-pays
    the 2-4× lane-padding tax the kernels remove), then one ``pmean`` merges
    them; the optimizer/EMA update happens on replicated values. Microbatch
    g of device i draws noise from fold_in(e_key, i·A + g), so a dp×A run
    computes the same gradient as a single-device grad_accum dp·A run.

    ``mesh`` with sp>1 (the explicit sequence-parallel TRAIN step): the
    batch shards over dp AND the time axis over sp in one shard_map; each
    device runs the differentiable SP-local forward
    (parallel/sp.sp_local_train_forward — halo-exchanged flat Pallas convs
    with custom VJPs, globally-psum'd GroupNorm, gathered bottleneck), the
    ε-loss's per-sample (C, T, F) sum is completed with a psum over sp, and
    the per-device PARTIAL param grads (the custom-VJP collectives'
    convention) are psum'd over sp then pmean'd over dp. Noise for
    microbatch g of dp-device i is the SAME full-T array a single-device
    grad_accum dp·A run draws (fold_in(e_key, i·A + g)), sliced to the
    local T window — so dp×sp×A and single-device runs compute the same
    gradient (tested on the virtual mesh)."""
    loss_fn_impl = loss_registry[config.model.type]
    # cfg.num_timesteps is the single source of truth (it sizes the timestep
    # embedding table); config.diffusion must agree with it by construction.
    num_timesteps = cfg.num_timesteps
    use_ema = bool(config.model.ema)
    # default matches the reference's in-use value (configs/audio.yml:53)
    mu = float(getattr(config.model, "ema_rate", 0.9999))
    grad_accum = int(getattr(config.training, "grad_accum", 1) or 1)
    alphas = jnp.asarray(alphas_cumprod, jnp.float32)
    dp = None
    sp = 1
    has_dp_axis = False
    if mesh is not None:
        has_dp_axis = "dp" in mesh.shape
        dp = mesh.shape.get("dp", 1)
        sp = mesh.shape.get("sp", 1)

    def train_step(state: TrainState, x0, rng_root):
        rng = jax.random.fold_in(rng_root, state.step)
        t_key, e_key, d_key = jax.random.split(rng, 3)
        n = x0.shape[0]
        t = antithetic_timesteps(t_key, n, num_timesteps)

        def default_micro_loss(p, x0_mb, t_mb, e_mb, d_mb):
            def apply_fn(pp, x, tt):
                return apply_model(pp, x, tt, cfg, train=True, rng=d_mb)

            return loss_fn_impl(apply_fn, p, x0_mb, t_mb, e_mb, alphas)

        def default_draw_e(idx, x0_mb):
            return jax.random.normal(
                jax.random.fold_in(e_key, idx), x0_mb.shape, x0_mb.dtype)

        def accum_folded(params, x0_p, t_p, g0, a_steps, *,
                         micro_loss=default_micro_loss,
                         draw_e=default_draw_e):
            """Mean (loss, grads) over a_steps microbatches of x0_p; micro
            g draws its noise via draw_e(fold index g0 + g) and its dropout
            key from fold_in(d_key, g0 + g) — global microbatch indices, so
            a dp×A mesh run and a single-device grad_accum dp·A run compute
            the SAME gradient."""
            m = x0_p.shape[0]
            if m % a_steps != 0:
                raise ValueError(
                    f"batch {m} not divisible by grad_accum {a_steps}")
            mb = m // a_steps
            if a_steps == 1:
                e = draw_e(g0, x0_p)
                return jax.value_and_grad(micro_loss)(
                    params, x0_p, t_p, e, jax.random.fold_in(d_key, g0))
            x0_mbs = x0_p.reshape((a_steps, mb) + x0_p.shape[1:])
            t_mbs = t_p.reshape(a_steps, mb)

            def body(carry, inp):
                loss_sum, grad_sum = carry
                x0_mb, t_mb, i = inp
                e_mb = draw_e(g0 + i, x0_mb)
                loss_i, g_i = jax.value_and_grad(micro_loss)(
                    params, x0_mb, t_mb, e_mb,
                    jax.random.fold_in(d_key, g0 + i),
                )
                grad_sum = jax.tree_util.tree_map(jnp.add, grad_sum, g_i)
                return (loss_sum + loss_i, grad_sum), None

            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
            (loss_sum, grad_sum), _ = jax.lax.scan(
                body,
                (jnp.zeros((), jnp.float32), zero_grads),
                (x0_mbs, t_mbs, jnp.arange(a_steps, dtype=jnp.uint32)),
            )
            return (loss_sum / a_steps,
                    jax.tree_util.tree_map(lambda g: g / a_steps, grad_sum))

        if sp > 1 and n % dp == 0 and x0.shape[2] % sp == 0:
            from jax.sharding import PartitionSpec as P

            from ..parallel.sp import (
                SP_AXIS,
                flat_train_flags,
                psum_keep_sp,
                sp_local_train_forward,
            )

            flags = flat_train_flags(cfg, x0.shape[2], sp)

            def sp_local_fn(params, x0_l, t_l):
                # x0_l: [B/dp, C, T/sp, F]
                t_loc = x0_l.shape[2]
                si = jax.lax.axis_index(SP_AXIS)
                di = (jax.lax.axis_index("dp").astype(jnp.uint32)
                      if dp > 1 else jnp.uint32(0))

                def micro_loss(p, x0_mb, t_mb, e_mb, d_mb):
                    # the reference ε-loss (functions/losses.py:4-18) with
                    # its (C, T, F) sum completed across the sp shards
                    a = alphas[t_mb][:, None, None, None].astype(x0_mb.dtype)
                    xt = x0_mb * jnp.sqrt(a) + e_mb * jnp.sqrt(1.0 - a)
                    eps = sp_local_train_forward(
                        p, xt, t_mb, d_mb, cfg=cfg, flags=flags)
                    partial = jnp.square(e_mb - eps).sum(axis=(1, 2, 3))
                    return psum_keep_sp(partial).mean(axis=0)

                def draw_e(idx, x0_mb):
                    # the SAME full-T noise a single-device run draws,
                    # sliced to this shard's T window
                    full = jax.random.normal(
                        jax.random.fold_in(e_key, idx),
                        x0_mb.shape[:2] + (t_loc * sp,) + x0_mb.shape[3:],
                        x0_mb.dtype)
                    return jax.lax.dynamic_slice_in_dim(
                        full, si * t_loc, t_loc, axis=2)

                loss_l, grads_l = accum_folded(
                    params, x0_l, t_l,
                    di * grad_accum, grad_accum,
                    micro_loss=micro_loss, draw_e=draw_e,
                )
                # per-device param grads are PARTIAL sums (the custom-VJP
                # collectives' convention, parallel/sp.py) — one psum over
                # sp completes them; dp averages as usual
                grads = jax.lax.psum(grads_l, SP_AXIS)
                if dp > 1:
                    grads = jax.lax.pmean(grads, "dp")
                    loss_l = jax.lax.pmean(loss_l, "dp")
                return loss_l, grads

            dpax = "dp" if has_dp_axis else None
            loss, grads = jax.shard_map(
                sp_local_fn, mesh=mesh,
                in_specs=(P(), P(dpax, None, SP_AXIS, None), P(dpax)),
                out_specs=(P(), P()),
                check_vma=False,
            )(state.params, x0, t)
        elif dp is not None and n % dp == 0:
            from jax.sharding import PartitionSpec as P

            def local_fn(params, x0_l, t_l):
                i = jax.lax.axis_index("dp")
                loss_l, grads_l = accum_folded(
                    params, x0_l, t_l,
                    i.astype(jnp.uint32) * grad_accum, grad_accum,
                )
                loss = jax.lax.pmean(loss_l, "dp")
                grads = jax.lax.pmean(grads_l, "dp")
                return loss, grads

            loss, grads = jax.shard_map(
                local_fn, mesh=mesh,
                in_specs=(P(), P("dp"), P("dp")), out_specs=(P(), P()),
                check_vma=False,
            )(state.params, x0, t)
        elif grad_accum == 1:
            # single-device fast path: one unfolded global noise draw
            # (kept bit-identical to rounds 1-2)
            def apply_fn(p, x, tt):
                return apply_model(p, x, tt, cfg, train=True, rng=d_key)

            def micro_loss(p, x0_mb, t_mb, e_mb):
                return loss_fn_impl(apply_fn, p, x0_mb, t_mb, e_mb, alphas)

            e = jax.random.normal(e_key, x0.shape, x0.dtype)
            loss, grads = jax.value_and_grad(micro_loss)(state.params, x0, t, e)
        else:
            loss, grads = accum_folded(
                state.params, x0, t, jnp.uint32(0), grad_accum)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = ema_update(state.ema, params, mu) if use_ema else None

        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        _collect_adabelief_stats(opt_state, metrics)
        new_state = TrainState(
            params=params, opt_state=opt_state, ema=ema, step=state.step + 1
        )
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,))
