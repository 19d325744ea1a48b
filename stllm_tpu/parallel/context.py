"""Context-parallel LLaMA forward: activations sharded over the SEQUENCE.

An extension beyond the reference (which handles long video by token
compression only — SURVEY.md §5): every per-token op (norms, projections,
MLP) runs on the local sequence shard; attention runs as exact ring
attention (ops/ring_attention.py) with K/V shards rotating over ICI.
Combine with the data/model axes for 3D (dp x tp x cp) training.

Produces the same hidden states as ``llama_forward`` (equivalence-tested on
a CPU mesh) for full sequences whose length divides the axis size.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from stllm_tpu.models.llama import LlamaConfig
from stllm_tpu.ops.rope import apply_rope, rope_table
from stllm_tpu.ops.layers import linear, rms_norm, swiglu_mlp
from stllm_tpu.ops.ring_attention import ring_attention


def _layer_cp(layer: Dict, x: jax.Array, cos, sin, positions,
              kv_mask: Optional[jax.Array], axis_name: str,
              cfg: LlamaConfig) -> jax.Array:
    from stllm_tpu.models.llama import _qkv_proj

    b, s, d = x.shape
    h = rms_norm(layer["input_norm"], x, cfg.rms_eps)
    q, k, v = _qkv_proj(layer, h, b, s, cfg)  # handles fused qkv trees
    q = apply_rope(q, cos, sin, positions)
    k = apply_rope(k, cos, sin, positions)
    out = ring_attention(q, k, v, axis_name=axis_name, causal=True,
                         kv_mask=kv_mask)
    x = x + linear(layer["o"], out.reshape(b, s, d))
    h2 = rms_norm(layer["post_norm"], x, cfg.rms_eps)
    return x + swiglu_mlp(layer, h2)


def context_parallel_forward(
    params: Dict,
    inputs_embeds: jax.Array,        # (B, S, D) FULL sequence
    mesh: Mesh,
    cfg: LlamaConfig,
    axis_name: str = "data",
    attention_mask: Optional[jax.Array] = None,   # (B, S) validity
) -> jax.Array:
    """Run the LLaMA stack with the sequence sharded over ``axis_name``.
    Returns full (B, S, hidden) hidden states (same as llama_forward)."""
    b, s, _ = inputs_embeds.shape
    n = mesh.shape[axis_name]
    assert s % n == 0, f"sequence {s} not divisible by {axis_name}={n}"
    if attention_mask is None:
        attention_mask = jnp.ones((b, s), jnp.int32)

    cos, sin = rope_table(cfg.head_dim, cfg.max_positions, cfg.rope_theta)

    def local_fn(embeds, mask):
        s_local = embeds.shape[1]
        idx = jax.lax.axis_index(axis_name)
        positions = idx * s_local + jnp.broadcast_to(
            jnp.arange(s_local)[None, :], (b, s_local))
        x = embeds.astype(cfg.dtype)
        for layer in params["layers"]:
            x = _layer_cp(layer, x, cos, sin, positions, mask.astype(bool),
                          axis_name, cfg)
        return rms_norm(params["norm"], x, cfg.rms_eps)

    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(None, axis_name, None), P(None, axis_name)),
        out_specs=P(None, axis_name, None),
    )
    return fn(inputs_embeds, attention_mask)
