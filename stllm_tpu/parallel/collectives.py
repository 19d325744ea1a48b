"""Collective helpers (reference: stllm/models/base_model.py:182-236 —
GatherLayer / all_gather_with_grad / concat_all_gather over NCCL).

On TPU, cross-device communication inside a jitted/shard_mapped program is
expressed with jax.lax collectives and differentiated automatically — the
reference's autograd-preserving GatherLayer is simply ``jax.lax.all_gather``
(its transpose rule IS the grad-reducing backward the reference hand-wrote).
These wrappers document that mapping and provide the degenerate single-device
behavior the reference special-cases (base_model.py:210-212).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def all_gather_with_grad(x: jax.Array, axis_name: Optional[str] = None) -> jax.Array:
    """Gather along a mesh axis, differentiable (reference GatherLayer,
    base_model.py:182-217). Must be called inside shard_map/pjit with
    ``axis_name`` bound; outside any mapped axis it is the identity."""
    if axis_name is None:
        return x
    gathered = jax.lax.all_gather(x, axis_name)  # (devices, ...) — grads flow
    return gathered.reshape((-1,) + x.shape[1:])


def concat_all_gather(x: jax.Array, axis_name: Optional[str] = None) -> jax.Array:
    """Gather WITHOUT gradient (reference concat_all_gather,
    base_model.py:220-236)."""
    return jax.lax.stop_gradient(all_gather_with_grad(x, axis_name))


def psum_scalar(x, axis_name: Optional[str] = None):
    """Cross-device sum for metric reduction (reference: logger.py:43-48)."""
    if axis_name is None:
        return x
    return jax.lax.psum(x, axis_name)
