"""Rotary position embeddings (LLaMA-1 style, theta=10000).

Matches HF transformers' LlamaRotaryEmbedding semantics: half-split rotation
(rotate_half) applied to q and k, position-indexed so the same function serves
prefill (positions 0..S) and single-token decode (position = cache length).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rope_table(head_dim: int, max_pos: int, theta: float = 10000.0):
    """Precompute (cos, sin): each (max_pos, head_dim)."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    t = jnp.arange(max_pos, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)                      # (max_pos, head_dim/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)      # (max_pos, head_dim)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array,
               positions: jax.Array) -> jax.Array:
    """Apply rotary embedding.

    x: (B, S, H, D); positions: (B, S) int32 absolute positions.
    """
    c = cos[positions][:, :, None, :].astype(jnp.float32)  # (B, S, 1, D)
    s = sin[positions][:, :, None, :].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    return (xf * c + _rotate_half(xf) * s).astype(x.dtype)
