"""Orbax checkpointing for TrainState.

Replaces the reference's three checkpoint mechanisms (reference:
stllm/runners/runner_base.py:583-653 — trainable-only save + strict=False
resume; stllm/train/train_hf.py:110-203 — ZeRO-3 gather save; HF auto-resume
from the newest checkpoint-* dir at train_hf.py:258-261):

  - like the runner path, ONLY the trainable subtree + optimizer state is
    saved (frozen backbone weights come from the pretrained checkpoints);
  - sharded arrays are saved/restored natively by orbax (the ZeRO gather
    dance disappears — TensorStore writes each shard);
  - ``latest_step`` + ``restore`` give the auto-resume behavior.

Trees are stored as flat {path: array} dicts so the ABSENT partition
sentinels and custom optax state nodes never need serializing.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

from stllm_tpu.train.step import TrainState, path_str


def flatten_tree(tree) -> Dict[str, Any]:
    out = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        out[path_str(path)] = leaf
    return out


def unflatten_like(template, flat: Dict[str, Any], strict: bool = True):
    """Graft ``flat`` values onto ``template``'s structure (strict=False keeps
    template leaves whose path is missing, like the reference's strict=False
    load, runner_base.py:641)."""
    missing = []

    def pick(path, leaf):
        key = path_str(path)
        if key in flat:
            return flat[key]
        missing.append(key)
        return leaf

    out = jax.tree_util.tree_map_with_path(pick, template)
    if missing and strict:
        raise KeyError(f"checkpoint missing {len(missing)} keys, e.g. {missing[:5]}")
    return out


def save_serving_params(directory: str, params) -> None:
    """Persist an inference tree (incl. quantized serving forms — int4
    packed codes, int8 weights, scales are ordinary array leaves) so the
    quantize+calibrate cost is paid once, not at every server start. The
    reference has no counterpart (it re-loads fp16 HF weights each run,
    stllm/models/st_llm.py:145-170)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(directory)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "serving"), flatten_tree(params))
    ckptr.wait_until_finished()
    ckptr.close()


def load_serving_params(directory: str, template):
    """Restore a tree saved by ``save_serving_params`` onto ``template``'s
    structure (template supplies shapes/dtypes/shardings — e.g. a
    jax.eval_shape of the quantized init)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(directory)
    ckptr = ocp.StandardCheckpointer()
    flat = ckptr.restore(os.path.join(path, "serving"),
                         flatten_tree(template))
    ckptr.close()
    return unflatten_like(template, flat)


class CheckpointManager:
    """Step-indexed checkpoints under output_dir/checkpoint_<step>/."""

    def __init__(self, output_dir: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(output_dir)
        os.makedirs(self.directory, exist_ok=True)
        self._ocp = ocp
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True),
        )

    def save(self, state: TrainState, extra: Optional[Dict] = None) -> None:
        step = int(state.step)
        payload = {
            "params": flatten_tree(state.params),
            "opt_state": flatten_tree(state.opt_state),
            "meta": {"step": step, **(extra or {})},
        }
        self.manager.save(step, args=self._ocp.args.StandardSave(payload))
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, state: TrainState, step: Optional[int] = None) -> TrainState:
        """Restore params/opt_state into an existing (correctly-sharded)
        TrainState template."""
        step = self.latest_step() if step is None else step
        if step is None:
            return state
        template = {
            "params": flatten_tree(state.params),
            "opt_state": flatten_tree(state.opt_state),
            "meta": {"step": 0},
        }
        restored = self.manager.restore(
            step, args=self._ocp.args.StandardRestore(template))
        import jax.numpy as jnp

        return TrainState(
            step=jnp.asarray(restored["meta"]["step"], jnp.int32),
            params=unflatten_like(state.params, restored["params"]),
            frozen=state.frozen,
            opt_state=unflatten_like(state.opt_state, restored["opt_state"]),
        )

    def close(self):
        self.manager.close()
