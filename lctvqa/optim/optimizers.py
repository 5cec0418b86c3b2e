"""Optimizer factories.

Mirrors the reference's optimization setup (`basic_vqa/model_factory.py:20-48`,
`pcdarts/architect.py:20-22`): Adam(lr=1e-3) + StepLR(step=10, gamma=0.1) for
the EF and W models with grad-norm clipping at 5, and Adam(lr=6e-4,
betas=(0.5, 0.999), weight_decay=1e-3) for the architecture parameters.

StepLR is expressed as an injected hyperparameter updated once per epoch so
the jitted train step never recompiles.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from lctvqa.config import TrainConfig


def model_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """clip_by_global_norm(5) -> Adam. LR injected (StepLR per epoch)."""
    return optax.inject_hyperparams(_clipped_adam)(
        learning_rate=cfg.learning_rate, grad_clip=cfg.grad_clip)


def _clipped_adam(learning_rate, grad_clip):
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adam(learning_rate),
    )


def arch_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """torch.optim.Adam semantics: grad += wd * param BEFORE the moments."""
    return optax.chain(
        optax.add_decayed_weights(cfg.arch_weight_decay),
        optax.scale_by_adam(b1=cfg.arch_adam_b1, b2=cfg.arch_adam_b2),
        optax.scale(-cfg.arch_learning_rate),
    )


def step_lr(base_lr: float, epoch: int, step_size: int, gamma: float) -> float:
    """StepLR: lr = base * gamma^(epoch // step_size)."""
    return base_lr * (gamma ** (epoch // step_size))


def set_learning_rate(opt_state, lr: float):
    """Update the injected learning_rate in a model_optimizer state,
    preserving the existing array's sharding (a sharding change would
    force the jitted train step to recompile)."""
    old = opt_state.hyperparams["learning_rate"]
    new = jnp.asarray(lr, jnp.float32)
    sharding = getattr(old, "sharding", None)
    if sharding is not None:
        new = jax.device_put(new, sharding)
    opt_state.hyperparams["learning_rate"] = new
    return opt_state


def sgd_step(params, grads, lr):
    """One plain SGD step w' = w - lr * g (the architects' inner unroll,
    `pcdarts/architect.py:24-35` without momentum/weight-decay, which are
    both zero in the reference)."""
    return jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
