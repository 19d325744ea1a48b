"""Optimizers and LR schedules (optax).

Re-provides the reference's per-step LR schedulers
(reference: stllm/common/optims.py:13-115 — linear warmup -> cosine / step decay)
as optax schedules, plus the AdamW weight-decay grouping rule used by the runner
(reference: stllm/runners/runner_base.py:100-130 — params with ndim < 2, biases and
norm scales are exempt from weight decay).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import optax

from stllm_tpu.common.registry import registry


def cosine_lr_schedule(init_lr: float, min_lr: float, warmup_steps: int,
                       total_steps: int, warmup_start_lr: float = 1e-6):
    """Step-wise linear warmup followed by cosine decay to min_lr."""

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = warmup_start_lr + (init_lr - warmup_start_lr) * step / max(warmup_steps, 1)
        progress = jnp.clip((step - warmup_steps) / max(total_steps - warmup_steps, 1), 0.0, 1.0)
        cos = min_lr + 0.5 * (init_lr - min_lr) * (1.0 + jnp.cos(jnp.pi * progress))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def step_lr_schedule(init_lr: float, min_lr: float, decay_rate: float,
                     steps_per_epoch: int, warmup_steps: int = 0,
                     warmup_start_lr: float = 1e-6):
    """Linear warmup then per-epoch exponential step decay, floored at min_lr."""

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = warmup_start_lr + (init_lr - warmup_start_lr) * step / max(warmup_steps, 1)
        epoch = jnp.floor(step / max(steps_per_epoch, 1))
        decayed = jnp.maximum(init_lr * (decay_rate ** epoch), min_lr)
        return jnp.where(step < warmup_steps, warm, decayed)

    return schedule


def linear_warmup_cosine_hf(learning_rate: float, warmup_ratio: float, total_steps: int):
    """HF Trainer 'cosine' scheduler semantics (warmup_ratio of total steps, decay to 0).

    This matches the primary training path's LR curve (reference:
    config/instructblipbase_stllm_qa.yaml run.lr_scheduler_type='cosine',
    run.warmup_ratio=0.03 consumed by transformers.Trainer).
    """
    warmup_steps = int(round(total_steps * warmup_ratio))
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, learning_rate, max(warmup_steps, 1)),
            optax.cosine_decay_schedule(learning_rate, max(total_steps - warmup_steps, 1)),
        ],
        boundaries=[warmup_steps],
    )


@registry.register_lr_scheduler("linear_warmup_cosine_lr")
class LinearWarmupCosineLRScheduler:
    def __init__(self, max_epoch: int, iters_per_epoch: int, init_lr: float,
                 min_lr: float, warmup_steps: int = 0, warmup_start_lr: float = -1, **_):
        self.schedule = cosine_lr_schedule(
            init_lr, min_lr, warmup_steps, max_epoch * iters_per_epoch,
            warmup_start_lr if warmup_start_lr >= 0 else init_lr,
        )

    def __call__(self, step):
        return self.schedule(step)


@registry.register_lr_scheduler("linear_warmup_step_lr")
class LinearWarmupStepLRScheduler:
    def __init__(self, max_epoch: int, iters_per_epoch: int, init_lr: float,
                 min_lr: float, decay_rate: float = 1.0, warmup_steps: int = 0,
                 warmup_start_lr: float = -1, **_):
        self.schedule = step_lr_schedule(
            init_lr, min_lr, decay_rate, iters_per_epoch, warmup_steps,
            warmup_start_lr if warmup_start_lr >= 0 else init_lr,
        )

    def __call__(self, step):
        return self.schedule(step)


def weight_decay_mask(params) -> Any:
    """True where weight decay applies: ndim >= 2 and not an embedding/norm scale.

    Mirrors the reference's optimizer grouping (runner_base.py:104-121): biases,
    norm scales and other <2-dim tensors get wd=0.
    """

    def keep(path, leaf):
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path).lower()
        if leaf.ndim < 2:
            return False
        for token in ("norm", "ln_", "_ln", "layernorm", "embed"):
            if token in name:
                return False
        return True

    return jax.tree_util.tree_map_with_path(keep, params)


def make_optimizer(
    learning_rate,
    weight_decay: float = 0.05,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
    max_grad_norm: Optional[float] = None,
    trainable_mask=None,
) -> optax.GradientTransformation:
    """AdamW with wd-exempt grouping and optional grad clipping / param freezing.

    ``trainable_mask`` is a pytree of bools; frozen leaves receive zero updates
    (the TPU equivalent of the reference's requires_grad=False freezing,
    reference: stllm/models/st_llm.py:182-185).
    """
    chain = []
    if max_grad_norm:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(
        optax.adamw(
            learning_rate=learning_rate,
            b1=beta1, b2=beta2, eps=eps,
            weight_decay=weight_decay,
            mask=weight_decay_mask if weight_decay else None,
        )
    )
    tx = optax.chain(*chain)
    if trainable_mask is not None:
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            jax.tree_util.tree_map(lambda t: "train" if t else "freeze", trainable_mask),
        )
    return tx
