"""H2O-style KV-cache eviction (heavy-hitter oracle) for LLaMA decode.

TPU-native extension (the reference keeps the full HF fp16 cache; its only
long-context lever is token compression before the LLM — SURVEY.md §5).
Bounds the KV cache at a fixed ``budget`` of slots per layer: tokens with the
highest accumulated attention mass ("heavy hitters") plus the most recent
``recent`` tokens survive; the lowest-mass old token is evicted when a new
one needs a slot. Follows Zhang et al., "H2O: Heavy-Hitter Oracle for
Efficient Generative Inference of Large Language Models" (NeurIPS 2023);
scores are accumulated per LAYER (summed over heads and query steps), the
static-shape formulation is scatter-at-argmin so one compiled program serves
any budget.

Everything is static-shape: the cache never grows, per-slot absolute
positions make RoPE/causality exact for non-contiguous slot contents, and
eviction is an argmin + dynamic_update_slice — no data-dependent shapes.

API:
  h2o_prefill(params, embeds, mask, cfg, budget, recent) -> (hidden, cache)
  h2o_decode_step(params, token_ids, cache, cfg)         -> (logits, cache)

Exactness contract (tested): with budget >= prompt + max_new_tokens,
eviction and compression never trigger and the decoded tokens/logits match
the dense-cache path to fp32 tolerance.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from stllm_tpu.models.llama import LlamaConfig, _qkv_proj, lm_head
from stllm_tpu.ops.layers import linear, rms_norm, swiglu_mlp
from stllm_tpu.ops.rope import apply_rope, rope_table

NEG_INF = -1e30


class H2OCache(NamedTuple):
    """Layer-major pytree of (B, budget, ...) slot arrays (length-L tuples —
    same rationale as KVCache: per-layer buffers alias donated in-place
    updates; a stacked array forces a whole-cache copy per decode step).
    ``pos`` is the absolute sequence position held by each slot, -1 = empty.
    ``mass`` is the accumulated attention probability each slot's token has
    received (summed over heads and steps). ``next_pos`` (B,) is the next
    absolute position; ``filled`` counts occupied slots per layer (prefill
    fills compactly)."""

    k: Tuple[jax.Array, ...]     # L x (B, budget, H, D)
    v: Tuple[jax.Array, ...]     # L x (B, budget, H, D)
    pos: Tuple[jax.Array, ...]   # L x (B, budget) int32
    mass: Tuple[jax.Array, ...]  # L x (B, budget) fp32
    next_pos: jax.Array          # (B,) int32
    filled: Tuple[jax.Array, ...]  # L x (B,) int32
    recent: int = 32      # static: slots within this window are unevictable


def _attend_slots(q, ck, cv, pos, cur_pos, scale):
    """q: (B,1,H,D) against slot caches (B,N,H,D) with per-slot absolute
    positions. Returns (out (B,1,H,D), probs (B,H,N)) in fp32 stats."""
    logits = jnp.einsum("bqhd,bnhd->bhqn", q, ck).astype(jnp.float32) * scale
    valid = (pos >= 0) & (pos <= cur_pos[:, None])            # (B,N)
    logits = jnp.where(valid[:, None, None, :], logits, NEG_INF)
    p = jax.nn.softmax(logits, axis=-1)                        # (B,H,1,N)
    out = jnp.einsum("bhqn,bnhd->bqhd", p.astype(cv.dtype), cv,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return out, p[:, :, 0, :]


def _evict_slot(cache_layer, new_k, new_v, new_pos, recent: int):
    """Choose the slot for the incoming token: first empty slot if any,
    else the lowest-mass slot outside the recency window. Returns updated
    (k, v, pos, mass, filled) for one layer."""
    ck, cv, pos, mass, filled = cache_layer
    b, n = pos.shape

    def per_row(ck, cv, pos, mass, filled, nk, nv, np_):
        protected = (pos >= np_ - recent) & (pos >= 0)
        evict_score = jnp.where(protected, jnp.inf, mass)
        evict_score = jnp.where(pos < 0, -jnp.inf, evict_score)  # prefer empty
        slot = jnp.where(filled < n, filled, jnp.argmin(evict_score))
        slot = slot.astype(jnp.int32)
        ck = jax.lax.dynamic_update_slice(ck, nk[None], (slot, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, nv[None], (slot, 0, 0))
        pos = pos.at[slot].set(np_)
        mass = mass.at[slot].set(0.0)
        return ck, cv, pos, mass, jnp.minimum(filled + 1, n)

    return jax.vmap(per_row)(ck, cv, pos, mass, filled,
                             new_k[:, 0], new_v[:, 0], new_pos)


def h2o_decode_step(params: Dict, token_ids: jax.Array, cache: H2OCache,
                    cfg: LlamaConfig) -> Tuple[jax.Array, H2OCache]:
    """One greedy-decode step over the budgeted cache. token_ids: (B,)."""
    b = token_ids.shape[0]
    x = params["embed_tokens"][token_ids][:, None].astype(cfg.dtype)  # (B,1,d)
    cos, sin = rope_table(cfg.head_dim, cfg.max_positions, cfg.rope_theta)
    positions = cache.next_pos[:, None]                                # (B,1)
    scale = cfg.head_dim ** -0.5

    new_k, new_v, new_pos, new_mass, new_filled = [], [], [], [], []
    for i, layer in enumerate(params["layers"]):
        h = rms_norm(layer["input_norm"], x, cfg.rms_eps)
        q, k, v = _qkv_proj(layer, h, b, 1, cfg)  # handles fused qkv trees
        q = apply_rope(q, cos, sin, positions)
        k = apply_rope(k, cos, sin, positions)

        ck, cv, pos, mass, filled = _evict_slot(
            (cache.k[i], cache.v[i], cache.pos[i], cache.mass[i],
             cache.filled[i]),
            k.astype(cache.k[i].dtype), v.astype(cache.v[i].dtype),
            cache.next_pos, cache.recent)

        out, probs = _attend_slots(q, ck.astype(x.dtype), cv.astype(x.dtype),
                                   pos, cache.next_pos, scale)
        mass = mass + probs.sum(axis=1)                     # accumulate over heads

        x = x + linear(layer["o"], out.reshape(b, 1, cfg.hidden))
        h2 = rms_norm(layer["post_norm"], x, cfg.rms_eps)
        x = x + swiglu_mlp(layer, h2)

        new_k.append(ck); new_v.append(cv); new_pos.append(pos)
        new_mass.append(mass); new_filled.append(filled)

    x = rms_norm(params["norm"], x, cfg.rms_eps)
    logits = lm_head(params, x)[:, 0]
    cache = H2OCache(
        k=tuple(new_k), v=tuple(new_v), pos=tuple(new_pos),
        mass=tuple(new_mass), next_pos=cache.next_pos + 1,
        filled=tuple(new_filled), recent=cache.recent,
    )
    return logits, cache


def h2o_prefill(params: Dict, inputs_embeds: jax.Array, attention_mask,
                cfg: LlamaConfig, budget: int, recent: int = 32
                ) -> Tuple[jax.Array, H2OCache]:
    """Prefill + compress: run the prompt densely (scores materialized once —
    offline-compression cost), accumulate per-token attention column mass per
    layer, then keep the ``budget`` highest-mass tokens with the last
    ``recent`` always protected. Returns (hidden (B,S,d), compressed cache).
    """
    if budget <= recent:
        # _evict_slot's "lowest-mass outside the recency window" rule needs at
        # least one unprotected slot; otherwise evict_score is all +inf and
        # argmin would silently evict a protected recent token (slot 0).
        raise ValueError(
            f"h2o budget ({budget}) must exceed the recency window ({recent})")
    x = inputs_embeds.astype(cfg.dtype)
    b, s, _ = x.shape
    if attention_mask is None:
        attention_mask = jnp.ones((b, s), jnp.int32)
    valid = attention_mask.astype(bool)
    cos, sin = rope_table(cfg.head_dim, cfg.max_positions, cfg.rope_theta)
    positions = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
    scale = cfg.head_dim ** -0.5
    causal = jnp.tril(jnp.ones((s, s), bool))

    ks, vs, masses = [], [], []
    for layer in params["layers"]:
        h = rms_norm(layer["input_norm"], x, cfg.rms_eps)
        q, k, v = _qkv_proj(layer, h, b, s, cfg)  # handles fused qkv trees
        q = apply_rope(q, cos, sin, positions)
        k = apply_rope(k, cos, sin, positions)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
        logits = jnp.where(causal[None, None], logits, NEG_INF)
        logits = jnp.where(valid[:, None, None, :], logits, NEG_INF)
        p = jax.nn.softmax(logits, axis=-1)                 # (B,H,S,S)
        # column mass: attention received by token j from all valid queries
        mass = jnp.einsum("bhqk,bq->bk", p, valid.astype(jnp.float32))
        out = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out * valid[:, :, None, None]
        x = x + linear(layer["o"], out.reshape(b, s, cfg.hidden))
        h2 = rms_norm(layer["post_norm"], x, cfg.rms_eps)
        x = x + swiglu_mlp(layer, h2)
        ks.append(k); vs.append(v); masses.append(mass)

    x = rms_norm(params["norm"], x, cfg.rms_eps)
    lengths = attention_mask.sum(axis=-1).astype(jnp.int32)      # (B,)

    # selection: protect the last `recent` valid tokens, rank the rest by
    # mass, keep the top (budget - protected); gather compactly into slots.
    take = min(budget, s)  # budget may exceed the prompt: pad slots stay empty

    def select(mass, length):
        idx = jnp.arange(s)
        is_valid = idx < length
        protected = is_valid & (idx >= length - recent)
        rank_score = jnp.where(protected, jnp.inf, mass)
        rank_score = jnp.where(is_valid, rank_score, -jnp.inf)
        order = jnp.argsort(-rank_score)         # protected, then heavy, then pad
        keep = jnp.sort(order[:take])            # positional order (stable attn)
        keep = jnp.pad(keep, (0, budget - take))
        kept_valid = (keep < length) & (jnp.arange(budget) < take)
        return keep, kept_valid

    # per-layer selection: each layer ranks tokens by its own attention mass
    ck, cv, cpos, cmass, cfill = [], [], [], [], []
    for k_l, v_l, m_l in zip(ks, vs, masses):
        keep_l, valid_l = jax.vmap(select)(m_l, lengths)
        gk = jnp.take_along_axis(k_l, keep_l[:, :, None, None], axis=1)
        gv = jnp.take_along_axis(v_l, keep_l[:, :, None, None], axis=1)
        gm = jnp.take_along_axis(m_l, keep_l, axis=1)
        gpos = jnp.where(valid_l, keep_l, -1).astype(jnp.int32)
        ck.append(gk); cv.append(gv)
        cpos.append(gpos)
        cmass.append(jnp.where(valid_l, gm, 0.0))
        cfill.append(valid_l.sum(axis=-1).astype(jnp.int32))

    cache = H2OCache(
        k=tuple(ck), v=tuple(cv), pos=tuple(cpos),
        mass=tuple(cmass), next_pos=lengths,
        filled=tuple(cfill), recent=recent,
    )
    return x, cache


@functools.partial(jax.jit, static_argnames=("cfg", "n"), donate_argnums=(2,))
def h2o_decode_chunk_greedy(params, token_ids, cache: H2OCache,
                            cfg: LlamaConfig, n: int):
    """n greedy tokens in one device call (mirror of _decode_chunk_greedy)."""

    def body(carry, _):
        cur, cache = carry
        logits, cache = h2o_decode_step(params, cur, cache, cfg)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (nxt, cache), nxt

    (_, cache), toks = jax.lax.scan(body, (token_ids, cache), None, length=n)
    return toks.T, cache
