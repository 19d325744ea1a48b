"""SPMD context for Pallas kernels.

GSPMD cannot auto-partition a Mosaic custom call ("Mosaic kernels cannot be
automatically partitioned"), and ``jax.experimental.custom_partitioning``'s
runtime callbacks don't survive AOT (deviceless) compilation. So multi-device
programs wrap each kernel in an explicit ``jax.shard_map`` over the mesh's
batch axes — every kernel in this package is batched on dim 0 of all operands
and outputs, so the wrapper is mechanical.

The mesh is threaded via a context manager instead of plumbing it through
every model signature: the trainer / sharded-inference entry activates

    with kernel_sharding(mesh):            # batch dim -> 'data'
        state, metrics = train_step(state, batch)

around TRACING (shard_map binds at trace time), and the kernel dispatchers
call ``shard_batched`` which is a no-op when no mesh is active (single-chip
serving, CPU tests).

This replaces nothing in the reference — its flash-attn CUDA kernel runs
under DDP/ZeRO where every rank owns the whole (replicated) module, so the
partitioning problem doesn't arise (reference: stllm/models/
modeling_llama_mem.py:172-248 + stllm/runners/runner_base.py:88-97).
"""

from __future__ import annotations

import math
import threading
from contextlib import contextmanager
from typing import Optional, Sequence, Tuple

import jax
from jax.sharding import Mesh, PartitionSpec as P

_state = threading.local()


def _get() -> Tuple[Optional[Mesh], Tuple[str, ...]]:
    return getattr(_state, "mesh", None), getattr(_state, "axes", ("data",))


@contextmanager
def kernel_sharding(mesh: Optional[Mesh], batch_axes: Sequence[str] = ("data",)):
    """Activate shard_map wrapping of Pallas kernels: batch dim 0 is treated
    as partitioned over ``batch_axes`` of ``mesh``. Pass mesh=None to disable
    (nested scopes restore the outer setting)."""
    prev = _get()
    _state.mesh, _state.axes = mesh, tuple(batch_axes)
    try:
        yield
    finally:
        _state.mesh, _state.axes = prev


def kernel_shard_count() -> int:
    """Number of shards the active context splits the batch dim into
    (1 = no active mesh)."""
    mesh, axes = _get()
    if mesh is None:
        return 1
    return math.prod(mesh.shape[a] for a in axes)


def shard_batched(fn, *args):
    """Run ``fn(*args)`` (a Pallas caller whose operands/outputs are all
    batched on dim 0, except operands with dim0 == 1 which are treated as
    replicated) under the active kernel mesh. No active mesh: direct call.

    Callers must pre-check divisibility with ``kernel_shard_count()`` and
    take their XLA fallback when the batch doesn't divide.
    """
    mesh, axes = _get()
    if mesh is None:
        return fn(*args)
    b = args[0].shape[0]

    def in_spec(a):
        lead = tuple(axes) if (a.ndim and a.shape[0] == b) else None
        return P(lead, *([None] * (a.ndim - 1)))

    out_struct = jax.eval_shape(fn, *args)
    out_specs = jax.tree_util.tree_map(
        lambda s: P(tuple(axes), *([None] * (len(s.shape) - 1))), out_struct)
    return jax.shard_map(
        fn, mesh=mesh, in_specs=tuple(in_spec(a) for a in args),
        out_specs=out_specs, check_vma=False,
    )(*args)


def constrain_batched(x: jax.Array) -> jax.Array:
    """Pin ``x`` (batched on dim 0, replicated elsewhere) to the active
    kernel mesh with a ``with_sharding_constraint``; no-op without a mesh.

    Used where GSPMD's propagation picks a pathological sharding — e.g. the
    Q-Former word-embedding gather in the sharded train step, where the
    partitioner warned "Involuntary full rematerialization" (replicate-then-
    repartition of the gather result) until the output sharding was pinned.
    """
    mesh, axes = _get()
    if mesh is None:
        return x
    spec = P(tuple(axes), *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(
        x, jax.sharding.NamedSharding(mesh, spec))
