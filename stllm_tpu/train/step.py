"""Jitted training step: loss = CE + MVM, frozen/trainable partition, AdamW.

TPU-native replacement for the reference's HF Trainer + DeepSpeed path
(reference: stllm/train/train_hf.py:222-265, stllm/train/stllm_trainer.py:218-341)
and the LAVIS runner inner loop (stllm/tasks/base_task.py:155-246):

  - freezing (reference flips requires_grad: st_llm.py:182-185, :257-296) is a
    PARTITION of the param pytree — gradients are taken only w.r.t. the
    trainable subtree, so XLA dead-code-eliminates the frozen backward;
  - DeepSpeed ZeRO-3 (stllm/train/zero3.json) becomes FSDP NamedSharding of
    params + optimizer state over the ``data`` mesh axis;
  - AdamW weight-decay exemption for <2-dim / bias / norm params mirrors the
    runner's param grouping (stllm/runners/runner_base.py:100-130);
  - gradient accumulation (base_task.py:228-234) is a lax.scan over
    micro-batches inside ONE compiled step.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from stllm_tpu.models.stllm import STLLMConfig, stllm_forward

# sentinel marking "this leaf belongs to the other partition"
class _Absent:
    __slots__ = ()

    def __repr__(self):
        return "ABSENT"


ABSENT = _Absent()


def _is_absent(x) -> bool:
    return x is ABSENT


def path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def default_trainable(
    freeze_vit: bool = True,
    freeze_qformer: bool = True,
    freeze_llm: bool = True,
    train_btadapter: bool = True,
) -> Callable[[str], bool]:
    """Reference freezing policy (st_llm.py:182-185, 257-296): llama_proj,
    residual module, mvm_decoder always train; BTAdapter params inside a
    frozen ViT still train (st_llm.py:258-261)."""

    def trainable(path: str) -> bool:
        if path.startswith("vit/"):
            if train_btadapter and "btadapter" in path:
                return True
            return not freeze_vit
        if path.startswith("ln_vision"):
            return not freeze_vit
        if path.startswith("qformer"):
            return not freeze_qformer
        if path.startswith("llama/"):
            # LoRA adapters train even under freeze_LLM (reference:
            # st_llm.py:182-185 keeps 'lora' params requires_grad); the
            # stored alpha scale is a constant, not a parameter
            if "_lora" in path:
                return not path.endswith("alpha")
            return not freeze_llm
        return True  # llama_proj, residual, mvm_decoder
    return trainable


def partition_params(params, trainable_fn: Callable[[str], bool]):
    """Split one pytree into (trainable, frozen); each holds ABSENT where the
    leaf lives in the other tree."""

    def pick(want_trainable):
        def fn(path, leaf):
            t = trainable_fn(path_str(path))
            return leaf if t == want_trainable else ABSENT
        return jax.tree_util.tree_map_with_path(fn, params)

    return pick(True), pick(False)


def merge_params(a, b):
    return jax.tree_util.tree_map(
        lambda x, y: y if _is_absent(x) else x, a, b,
        is_leaf=lambda x: _is_absent(x),
    )


def weight_decay_mask(params):
    """True (decay) only for >=2-dim weights — biases, norms, scalars exempt
    (reference: stllm/runners/runner_base.py:104-121). ABSENT nodes are empty
    pytree nodes, so plain tree_map never visits them and the mask tree keeps
    the params' structure."""
    return jax.tree_util.tree_map(lambda p: p.ndim >= 2, params)


def make_optimizer(
    learning_rate: optax.Schedule | float,
    weight_decay: float = 0.05,
    beta1: float = 0.9,
    beta2: float = 0.999,
    max_grad_norm: Optional[float] = 1.0,
    projector_lr: Optional[optax.Schedule | float] = None,
    projector_prefix: str = "llama_proj",
) -> optax.GradientTransformation:
    """AdamW with wd-exempt mask; ``projector_lr`` gives the projection its
    own learning rate (reference mm_projector_lr,
    stllm/train/stllm_trainer.py:218-305)."""
    def adamw(lr):
        return optax.adamw(lr, b1=beta1, b2=beta2, weight_decay=weight_decay,
                           mask=weight_decay_mask)

    if projector_lr is None:
        tx = adamw(learning_rate)
    else:
        def label_fn(params):
            return jax.tree_util.tree_map_with_path(
                lambda p, _: "proj" if path_str(p).startswith(projector_prefix)
                else "base", params)

        tx = optax.multi_transform(
            {"base": adamw(learning_rate), "proj": adamw(projector_lr)},
            label_fn)
    if max_grad_norm:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    return tx


def make_probe_optimizer(params, lr) -> optax.GradientTransformation:
    """Memory-driven optimizer chooser for the on-chip proxy-training
    evidence harnesses (script/int8_equivalence_trained.py,
    script/w4a16_depth.py): AdamW while its two moment trees fit next to
    params+grads on a 16 GB v5e, adafactor (factored second moment, no
    first) above ~1.5B params. One definition so the trained-equivalence
    and depth-scaling arms always train under the same regime."""
    import numpy as np

    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(params))
    if n_params > 1_500_000_000:
        print(f"{n_params / 1e9:.2f}B params: adafactor", flush=True)
        return optax.chain(optax.clip_by_global_norm(1.0),
                           optax.adafactor(learning_rate=lr * 10,
                                           min_dim_size_to_factor=128))
    return make_optimizer(learning_rate=lr, max_grad_norm=1.0)


class TrainState(NamedTuple):
    step: jax.Array
    params: Any          # trainable subtree (ABSENT elsewhere)
    frozen: Any          # frozen subtree (ABSENT elsewhere)
    opt_state: Any


def create_train_state(
    params,
    optimizer: optax.GradientTransformation,
    trainable_fn: Optional[Callable[[str], bool]] = None,
) -> TrainState:
    trainable_fn = trainable_fn or default_trainable()
    train, frozen = partition_params(params, trainable_fn)
    opt_state = optimizer.init(train)
    return TrainState(jnp.zeros((), jnp.int32), train, frozen, opt_state)


def make_train_step(
    cfg: STLLMConfig,
    optimizer: optax.GradientTransformation,
    accum_steps: int = 1,
    loss_fn: Optional[Callable[[Dict, Dict, STLLMConfig], Dict]] = None,
):
    """Returns train_step(state, batch) -> (state, metrics).

    With accum_steps > 1, every batch leaf must have leading dim
    (accum_steps * micro) and is scanned in micro-batch slices.
    """
    fwd = loss_fn or stllm_forward

    def loss_and_metrics(train_p, frozen_p, batch):
        out = fwd(merge_params(train_p, frozen_p), batch, cfg)
        metrics = {k: v for k, v in out.items() if k.startswith("loss")}
        return out["loss"], metrics

    def single_grads(train_p, frozen_p, batch):
        (_, metrics), grads = jax.value_and_grad(loss_and_metrics, has_aux=True)(
            train_p, frozen_p, batch
        )
        return grads, metrics

    def train_step(state: TrainState, batch: Dict[str, jax.Array]):
        if accum_steps == 1:
            grads, metrics = single_grads(state.params, state.frozen, batch)
        else:
            def micro(i, b):
                return jax.tree_util.tree_map(
                    lambda x: jax.lax.dynamic_index_in_dim(
                        x.reshape((accum_steps, -1) + x.shape[1:]), i, 0, keepdims=False
                    ),
                    b,
                )

            def body(carry, i):
                g_acc, m_acc = carry
                g, m = single_grads(state.params, state.frozen, micro(i, batch))
                g_acc = jax.tree_util.tree_map(lambda a, x: a + x, g_acc, g)
                m_acc = jax.tree_util.tree_map(lambda a, x: a + x, m_acc, m)
                return (g_acc, m_acc), None

            # zero-initialized carry so ALL micro-steps run inside the scan:
            # unrolling micro-step 0 outside would double the compiled graph
            # (it dominates AOT compile time for the 7B MVM step)
            g0, m0 = jax.eval_shape(
                single_grads, state.params, state.frozen, micro(0, batch))
            zeros = lambda t: jax.tree_util.tree_map(  # noqa: E731
                lambda s: jnp.zeros(s.shape, s.dtype), t)
            (grads, metrics), _ = jax.lax.scan(
                body, (zeros(g0), zeros(m0)), jnp.arange(accum_steps)
            )
            grads = jax.tree_util.tree_map(lambda g: g / accum_steps, grads)
            metrics = jax.tree_util.tree_map(lambda m: m / accum_steps, metrics)

        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # keep ABSENT sentinels intact (optax maps over real leaves only when
        # masked; tree_map above preserves structure since ABSENT is a leaf)
        new_state = TrainState(state.step + 1, params, state.frozen, opt_state)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step


# ABSENT must be treated as a pytree leaf by optax/jax transforms: register it
# as its own (empty-data) pytree node so tree ops flow through without touching it.
jax.tree_util.register_pytree_node(
    _Absent, lambda x: ((), None), lambda aux, children: ABSENT
)
