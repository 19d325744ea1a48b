"""Ring attention: sequence-parallel attention over a mesh axis.

An EXTENSION beyond the reference (SURVEY.md §5: the reference has no
ring/context parallelism — long videos are handled by token compression).
This provides true sequence sharding for contexts that exceed one chip:
queries stay put while K/V shards rotate around the ring (`ppermute`), and
partial attention results merge online via logsumexp — mathematically exact,
the distributed form of the flash recurrence.

Use inside shard_map with the sequence dimension sharded over ``axis_name``:

    out = shard_map(
        lambda q, k, v: ring_attention(q, k, v, axis_name="sp", causal=True),
        mesh=mesh, in_specs=P(None, "sp"), out_specs=P(None, "sp"))(q, k, v)

Collectives ride ICI; each step overlaps the permute with local compute
(XLA schedules the ppermute asynchronously).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _pvary(x, axis_name):
    """Mark x as varying over axis_name (scan carry typing under shard_map)."""
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(x, (axis_name,), to="varying")
    return jax.lax.pvary(x, axis_name)


def _partial_attention(
    q: jax.Array,            # (B, Sq, H, D) local queries
    k: jax.Array,            # (B, Sk, H, D) current kv shard
    v: jax.Array,
    kv_valid: jax.Array,     # (B, Sk) bool for this shard
    q_off: jax.Array,        # scalar global offset of the q shard
    kv_off: jax.Array,       # scalar global offset of the kv shard
    causal: bool,
    scale: float,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (normalized out (B,Sq,H,D) fp32, lse (B,H,Sq) fp32); rows with
    no attendable keys get lse = NEG_INF and out = 0."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    logits = (jnp.einsum("bhqd,bhkd->bhqk", qt, kt) * scale).astype(jnp.float32)
    mask = kv_valid[:, None, None, :]
    if causal:
        qi = q_off + jnp.arange(sq)[:, None]
        ki = kv_off + jnp.arange(sk)[None, :]
        mask = jnp.logical_and(mask, (ki <= qi)[None, None])
    logits = jnp.where(mask, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)                   # (B,H,Sq,1)
    any_valid = m > NEG_INF / 2
    m_safe = jnp.where(any_valid, m, 0.0)
    p = jnp.where(mask, jnp.exp(logits - m_safe), 0.0)
    l = p.sum(axis=-1, keepdims=True)
    out = jnp.einsum("bhqk,bhkd->bhqd",
                     p.astype(v.dtype), vt, preferred_element_type=jnp.float32)
    out = out / jnp.maximum(l, 1e-30)
    lse = jnp.where(any_valid[..., 0], (m_safe + jnp.log(jnp.maximum(l, 1e-30)))[..., 0],
                    NEG_INF)
    out = jnp.where(any_valid, out, 0.0)
    return out.transpose(0, 2, 1, 3), lse


def ring_attention(
    q: jax.Array,            # (B, S_local, H, D) — seq sharded over axis_name
    k: jax.Array,
    v: jax.Array,
    *,
    axis_name: str,
    causal: bool = False,
    kv_mask: Optional[jax.Array] = None,   # (B, S_local) local validity
    scale: Optional[float] = None,
) -> jax.Array:
    """Exact attention over the globally-concatenated sequence."""
    b, s_local, h, d = q.shape
    scale = (d ** -0.5) if scale is None else scale
    n = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    if kv_mask is None:
        kv_mask = _pvary(jnp.ones((b, s_local), bool), axis_name)
    kv_mask = kv_mask.astype(bool)

    q_off = my * s_local
    perm = [(i, (i + 1) % n) for i in range(n)]  # kv shards rotate forward

    def step(carry, i):
        out_acc, lse_acc, k_cur, v_cur, m_cur = carry
        kv_off = ((my - i) % n) * s_local
        out_i, lse_i = _partial_attention(
            q, k_cur, v_cur, m_cur, q_off, kv_off, causal, scale)
        # online merge of normalized partials via logsumexp
        lse_new = jnp.logaddexp(lse_acc, lse_i)
        w_acc = jnp.exp(lse_acc - lse_new)[..., None].transpose(0, 2, 1, 3)
        w_i = jnp.exp(lse_i - lse_new)[..., None].transpose(0, 2, 1, 3)
        out_new = out_acc * w_acc + out_i * w_i
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        m_nxt = jax.lax.ppermute(m_cur, axis_name, perm)
        return (out_new, lse_new, k_nxt, v_nxt, m_nxt), None

    out0 = _pvary(jnp.zeros((b, s_local, h, d), jnp.float32), axis_name)
    lse0 = _pvary(jnp.full((b, h, s_local), NEG_INF, jnp.float32), axis_name)
    # lax.scan (not fori_loop) so the ring is reverse-differentiable
    (out, lse, _, _, _), _ = jax.lax.scan(
        step, (out0, lse0, k, v, kv_mask), jnp.arange(n))
    return out.astype(q.dtype)
