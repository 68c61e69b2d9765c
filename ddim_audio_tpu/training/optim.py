"""Optimizers and LR schedules as optax transforms.

Capability parity with the reference factories (``functions/__init__.py:5-60``):
Adam / AdamW / AdaBelief / RMSProp / SGD selected by config name, and the
Noam-style warmup ``lr · min(((1+s)/w)^-0.5, (1+s)/w)``.

AdaBelief here rebuilds the reference's empty ``step-clip-optimizer``
submodule from its call-site contract (``functions/__init__.py:24-42``;
SURVEY.md §2.10): AdaBelief (variance of gradient **around its EMA**, eps
added inside the second moment) with decoupled weight decay
(``weight_decouple=True``), no rectification, optional amsgrad, and an
optional **per-tensor step clip**: each tensor's update is rescaled so its
``norm_ord``-norm is at most ``clip_step``. Its update statistics (mean
update norm) are surfaced through the transform state for the train loop to
log, mirroring the reference's dict-returning ``optimizer.step()``
(``runners/diffusion.py:162-171``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


def noam_schedule(base_lr: float, warmup: int):
    """lr · min(((1+s)/w)^-0.5, (1+s)/w) — reference functions/__init__.py:53-60."""

    def schedule(step):
        s = (1.0 + step) / warmup
        return base_lr * jnp.minimum(s**-0.5, s)

    return schedule


class AdaBeliefState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Updates
    s: optax.Updates
    s_max: Optional[optax.Updates]
    update_norm: jnp.ndarray  # mean per-tensor update norm (logged stat)


def adabelief(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    *,
    weight_decouple: bool = True,
    fixed_decay: bool = False,
    amsgrad: bool = False,
    clip_step: Optional[float] = None,
    norm_ord: int = 2,
) -> optax.GradientTransformation:
    """AdaBelief with optional per-tensor step clipping."""

    sched = learning_rate if callable(learning_rate) else (lambda _: learning_rate)

    def init(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return AdaBeliefState(
            count=jnp.zeros((), jnp.int32),
            mu=zeros,
            s=jax.tree_util.tree_map(jnp.zeros_like, params),
            s_max=jax.tree_util.tree_map(jnp.zeros_like, params) if amsgrad else None,
            update_norm=jnp.zeros((), jnp.float32),
        )

    def _tensor_norm(u):
        if norm_ord == 2:
            return jnp.sqrt(jnp.sum(jnp.square(u)))
        return jnp.sum(jnp.abs(u) ** norm_ord) ** (1.0 / norm_ord)

    def update(grads, state, params=None):
        count = state.count + 1
        lr = sched(state.count)
        bc1 = 1.0 - b1**count.astype(jnp.float32)
        bc2 = 1.0 - b2**count.astype(jnp.float32)

        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, grads
        )
        s = jax.tree_util.tree_map(
            lambda v, g, m: b2 * v + (1.0 - b2) * jnp.square(g - m) + eps,
            state.s,
            grads,
            mu,
        )
        if amsgrad:
            s_max = jax.tree_util.tree_map(jnp.maximum, state.s_max, s)
            denom_src = s_max
        else:
            s_max = None
            denom_src = s

        def _direction(m, v):
            m_hat = m / bc1
            v_hat = v / bc2
            return m_hat / (jnp.sqrt(v_hat) + eps)

        direction = jax.tree_util.tree_map(_direction, mu, denom_src)

        def _step(d, p):
            u = -lr * d
            if weight_decouple and weight_decay != 0.0 and p is not None:
                decay = weight_decay if fixed_decay else lr * weight_decay
                u = u - decay * p
            if clip_step is not None:
                n = _tensor_norm(u)
                scale = jnp.minimum(1.0, clip_step / (n + 1e-30))
                u = u * scale
            return u

        updates = jax.tree_util.tree_map(_step, direction, params)
        norms = [ _tensor_norm(u) for u in jax.tree_util.tree_leaves(updates) ]
        update_norm = jnp.mean(jnp.stack(norms)) if norms else jnp.zeros(())
        return updates, AdaBeliefState(count, mu, s, s_max, update_norm)

    return optax.GradientTransformation(init, update)


class _TorchAmsgradState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Updates
    nu: optax.Updates
    nu_max: optax.Updates


def scale_by_torch_amsgrad(b1, b2, eps) -> optax.GradientTransformation:
    """torch.optim.Adam(amsgrad=True) semantics: the running max is over the
    RAW second moment and bias correction uses the current step
    (``denom = sqrt(max_nu / bc2) + eps``). optax.scale_by_amsgrad instead
    maxes bias-corrected values — the trajectories diverge."""

    def init(params):
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        return _TorchAmsgradState(
            jnp.zeros((), jnp.int32), z,
            jax.tree_util.tree_map(jnp.zeros_like, params),
            jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update(grads, state, params=None):
        del params
        count = state.count + 1
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        tm = jax.tree_util.tree_map
        mu = tm(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
        nu = tm(lambda v, g: b2 * v + (1 - b2) * jnp.square(g), state.nu, grads)
        nu_max = tm(jnp.maximum, state.nu_max, nu)
        updates = tm(
            lambda m, v: (m / bc1) / (jnp.sqrt(v / bc2) + eps), mu, nu_max
        )
        return updates, _TorchAmsgradState(count, mu, nu, nu_max)

    return optax.GradientTransformation(init, update)


def build_group_optimizer(group_cfg) -> optax.GradientTransformation:
    """One group's optimizer from its config namespace
    (configs/audio.yml optimization.optimizer.<group>).

    Argument semantics follow the reference factory
    (``functions/__init__.py:5-50``), i.e. the torch optimizers: Adam and
    RMSProp treat ``weight_decay`` as L2-into-gradient (decay added to the
    gradient *before* the moment updates), AdamW decouples it, and Adam /
    AdamW honor ``amsgrad``. The reference reads these keys unconditionally
    (it crashes on configs missing them); here absent keys mean the torch
    defaults (0.0 / False)."""
    name = group_cfg.optimizer
    warmup = getattr(group_cfg, "warmup", None)
    lr = noam_schedule(group_cfg.lr, warmup) if warmup else group_cfg.lr
    wd = float(getattr(group_cfg, "weight_decay", 0.0) or 0.0)
    amsgrad = bool(getattr(group_cfg, "amsgrad", False))

    def l2_into_grad():
        # torch's non-decoupled weight_decay: g ← g + wd·p, applied before
        # the optimizer's moment accumulation
        return [optax.add_decayed_weights(wd)] if wd else []

    if name in ("Adam", "AdamW"):
        b1, b2, eps = group_cfg.beta[0], group_cfg.beta[1], group_cfg.eps
        scaler = (
            scale_by_torch_amsgrad(b1, b2, eps)
            if amsgrad
            else optax.scale_by_adam(b1=b1, b2=b2, eps=eps)
        )
        if name == "Adam":
            chain = l2_into_grad() + [scaler]
        else:  # AdamW: decoupled decay after the adaptive scaling
            chain = [scaler] + ([optax.add_decayed_weights(wd)] if wd else [])
        return optax.chain(*chain, optax.scale_by_learning_rate(lr))
    if name == "AdaBelief":
        return adabelief(
            lr,
            b1=group_cfg.beta[0],
            b2=group_cfg.beta[1],
            eps=group_cfg.eps,
            weight_decay=wd,
            amsgrad=amsgrad,
            clip_step=getattr(group_cfg, "clip_step", None),
            norm_ord=getattr(group_cfg, "norm_ord", 2),
        )
    if name == "RMSProp":
        # torch RMSprop: alpha=0.99, eps added OUTSIDE the sqrt; eps comes
        # from the group config (torch default 1e-8) like every other branch
        return optax.chain(
            *l2_into_grad(),
            optax.scale_by_rms(decay=0.99,
                               eps=float(getattr(group_cfg, "eps", 1e-8)),
                               eps_in_sqrt=False),
            optax.scale_by_learning_rate(lr),
        )
    if name == "SGD":
        return optax.sgd(lr, momentum=0.9)
    raise NotImplementedError(f"Optimizer {name} not understood.")


def build_optimizer(optimization_cfg, params) -> optax.GradientTransformation:
    """Per-group gradient clipping + per-group optimizers, each group defined
    by top-level param-name prefixes (reference runners/diffusion.py:65-87,
    218-230). Returns one chained optax transform over the full pytree."""
    from .grouping import group_labels

    opt_labels, opt_groups = group_labels(optimization_cfg.optimizer, params)
    optimizers = {
        name: build_group_optimizer(cfg_ns) for name, cfg_ns in opt_groups.items()
    }

    clip_labels, clip_groups = group_labels(optimization_cfg.grad_norm, params)
    clippers = {}
    for name, cfg_ns in clip_groups.items():
        clip = getattr(cfg_ns, "grad_clip", None)
        clippers[name] = (
            optax.clip_by_global_norm(clip) if clip is not None else optax.identity()
        )

    return optax.chain(
        optax.multi_transform(clippers, clip_labels),
        optax.multi_transform(optimizers, opt_labels),
    )
