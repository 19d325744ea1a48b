"""Greedy speculative decoding — draft-propose / target-verify.

TPU-first rationale (DESIGN.md): 7B greedy decode is weight-HBM-bound —
per token every decoder weight crosses HBM once, while the MXU sits ~idle
at M=1. Verifying k draft tokens in ONE target forward therefore costs
almost exactly one token's HBM traffic (M grows k+1-fold on a dimension the
chip had spare), so any accepted draft token is nearly free target
throughput. The draft shares the target's hidden width (a shallow tower),
so the fused prompt embeddings (video tokens + text, models/stllm.py) feed
both models unchanged.

Greedy acceptance makes the output EXACTLY the target-only greedy answer,
token for token: a draft token is accepted iff it equals the target argmax
at its position, and the first rejected position emits the target argmax
instead — so every emitted token is the target argmax given the accepted
prefix, by induction. tests/test_speculative.py pins this equivalence
against models.generation.generate.

Capability target: beats the reference's HF `model.generate` KV-cache loop
(reference: stllm/conversation/conversation.py:231-243); the reference has
no speculative path.

Cache mechanics: KVCache is static-shape with a dynamic valid ``length``
(models/llama.py). A verify round writes k+1 entries at offset ``length``
and then COMMITS only the accepted prefix by shrinking ``length`` back;
the next round's writes start at the committed offset and always cover the
stale tail (next writes span [len+a+1, len+a+1+k] ⊇ stale [len+a+1,
len+k]), and attention masks kv_pos <= absolute query position, so stale
entries are never attended. The draft runs k+1 proposal steps (one beyond
what verification consumes) so its cache always holds KV for every token
the target may commit.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stllm_tpu.models.generation import (
    GenerationConfig, _ends_with, _pad_prompt, _prefill)
from stllm_tpu.models.llama import LlamaConfig, llama_forward, lm_head


@functools.partial(
    jax.jit, static_argnames=("tgt_cfg", "dft_cfg", "k", "max_rounds"),
    donate_argnums=(3, 4))  # caches update in place (like chunked greedy)
def _spec_chunk(tgt_params, dft_params, t0, tgt_cache, dft_cache, budget,
                *, tgt_cfg: LlamaConfig, dft_cfg: LlamaConfig, k: int,
                max_rounds: int):
    """Run verify rounds on device until ``budget`` tokens are emitted (or
    ``max_rounds`` hit). Returns (t_next, caches, emit (R,B,k+1) int32,
    counts (R,B) int32, rounds_run)."""
    b = t0.shape[0]
    emit_buf = jnp.zeros((max_rounds, b, k + 1), jnp.int32)
    cnt_buf = jnp.zeros((max_rounds, b), jnp.int32)

    def cond(st):
        r, total = st[0], st[1]
        return jnp.logical_and(r < max_rounds, total < budget)

    def body(st):
        r, total, t0, tgt_cache, dft_cache, emit_buf, cnt_buf = st

        def dstep(c, _):
            tok, cache = c
            h, cache = llama_forward(
                dft_params, input_ids=tok[:, None], cache=cache, cfg=dft_cfg)
            nxt = jnp.argmax(
                lm_head(dft_params, h)[:, 0].astype(jnp.float32),
                axis=-1).astype(jnp.int32)
            return (nxt, cache), nxt

        # k+1 proposal steps: the draft cache must hold KV for d_k too, in
        # case the target accepts all k proposals
        (_, dft_cache), drafts = jax.lax.scan(
            dstep, (t0, dft_cache), None, length=k + 1)
        d = jnp.swapaxes(drafts[:k], 0, 1)                    # (B, k)
        seq = jnp.concatenate([t0[:, None], d], axis=1)       # (B, k+1)
        h, tgt_cache = llama_forward(
            tgt_params, input_ids=seq, cache=tgt_cache, cfg=tgt_cfg)
        tgt_tok = jnp.argmax(
            lm_head(tgt_params, h).astype(jnp.float32),
            axis=-1).astype(jnp.int32)                        # (B, k+1)
        match = (tgt_tok[:, :k] == d).astype(jnp.int32)
        a = jnp.cumprod(match, axis=1).sum(axis=1)            # (B,) accepted
        t_next = jnp.take_along_axis(tgt_tok, a[:, None], axis=1)[:, 0]
        idx = jnp.arange(k + 1)[None, :]
        dpad = jnp.pad(d, ((0, 0), (0, 1)))
        emit = jnp.where(idx < a[:, None], dpad, 0)
        emit = jnp.where(idx == a[:, None], t_next[:, None], emit)
        count = a + 1
        # commit accepted prefix + correction; roll back the stale tail
        tgt_cache = tgt_cache._replace(
            length=tgt_cache.length - (k + 1) + count)
        dft_cache = dft_cache._replace(
            length=dft_cache.length - (k + 1) + count)
        emit_buf = jax.lax.dynamic_update_slice(
            emit_buf, emit[None], (r, 0, 0))
        cnt_buf = jax.lax.dynamic_update_slice(cnt_buf, count[None], (r, 0))
        return (r + 1, total + count.min(), t_next, tgt_cache, dft_cache,
                emit_buf, cnt_buf)

    st = (jnp.int32(0), jnp.int32(0), t0, tgt_cache, dft_cache,
          emit_buf, cnt_buf)
    r, _, t_next, tgt_cache, dft_cache, emit_buf, cnt_buf = (
        jax.lax.while_loop(cond, body, st))
    return t_next, tgt_cache, dft_cache, emit_buf, cnt_buf, r


@functools.partial(
    jax.jit, static_argnames=("tgt_cfg", "dft_cfg", "k", "rounds"),
    donate_argnums=(3, 4))
def _spec_rounds(tgt_params, dft_params, t0, tgt_cache, dft_cache,
                 *, tgt_cfg: LlamaConfig, dft_cfg: LlamaConfig, k: int,
                 rounds: int):
    """Serving form of the verify loop: a FIXED number of rounds per device
    call (lax.scan — the continuous batcher wants one static program per
    step, like its plain decode chunk), batched over server slots with
    per-row acceptance/rollback. Returns (t_next, caches, emit (R,B,k+1),
    counts (R,B)) — row b emits counts[r,b] tokens of emit[r,b] per round."""

    def body(carry, _):
        t0, tgt_cache, dft_cache = carry

        def dstep(c, _):
            tok, cache = c
            h, cache = llama_forward(
                dft_params, input_ids=tok[:, None], cache=cache, cfg=dft_cfg)
            nxt = jnp.argmax(
                lm_head(dft_params, h)[:, 0].astype(jnp.float32),
                axis=-1).astype(jnp.int32)
            return (nxt, cache), nxt

        (_, dft_cache), drafts = jax.lax.scan(
            dstep, (t0, dft_cache), None, length=k + 1)
        d = jnp.swapaxes(drafts[:k], 0, 1)                    # (B, k)
        seq = jnp.concatenate([t0[:, None], d], axis=1)       # (B, k+1)
        h, tgt_cache = llama_forward(
            tgt_params, input_ids=seq, cache=tgt_cache, cfg=tgt_cfg)
        tgt_tok = jnp.argmax(
            lm_head(tgt_params, h).astype(jnp.float32),
            axis=-1).astype(jnp.int32)                        # (B, k+1)
        match = (tgt_tok[:, :k] == d).astype(jnp.int32)
        a = jnp.cumprod(match, axis=1).sum(axis=1)
        t_next = jnp.take_along_axis(tgt_tok, a[:, None], axis=1)[:, 0]
        idx = jnp.arange(k + 1)[None, :]
        dpad = jnp.pad(d, ((0, 0), (0, 1)))
        emit = jnp.where(idx < a[:, None], dpad, 0)
        emit = jnp.where(idx == a[:, None], t_next[:, None], emit)
        count = a + 1
        tgt_cache = tgt_cache._replace(
            length=tgt_cache.length - (k + 1) + count)
        dft_cache = dft_cache._replace(
            length=dft_cache.length - (k + 1) + count)
        return (t_next, tgt_cache, dft_cache), (emit, count)

    (t_next, tgt_cache, dft_cache), (emits, cnts) = jax.lax.scan(
        body, (t0, tgt_cache, dft_cache), None, length=rounds)
    return t_next, tgt_cache, dft_cache, emits, cnts


def speculative_generate(
    tgt_params: Dict,
    dft_params: Dict,
    inputs_embeds: jax.Array,
    attention_mask: Optional[jax.Array] = None,
    *,
    tgt_cfg: LlamaConfig,
    dft_cfg: LlamaConfig,
    gen: GenerationConfig = GenerationConfig(),
    k: int = 6,
    return_stats: bool = False,
) -> List[List[int]]:
    """Greedy generation with draft speculation; output is token-for-token
    identical to ``generation.generate`` on the target alone. Greedy only
    (the spec-sampling residual scheme is out of scope), batch 1 (the QA
    protocols decode one stream; reference mv_bench.py:274-277 runs
    do_sample=False num_beams=1)."""
    assert not gen.do_sample and gen.num_beams == 1
    assert gen.repetition_penalty == 1.0 and gen.min_length <= 1
    assert dft_cfg.hidden == tgt_cfg.hidden, "draft shares the embed space"
    b, s, _ = inputs_embeds.shape
    assert b == 1, "speculative decoding drives one stream"

    if attention_mask is None:
        attention_mask = jnp.ones((b, s), jnp.int32)
    embeds, mask = _pad_prompt(inputs_embeds, attention_mask,
                               gen.pad_to_multiple)
    # k+1 slack: a round may write past the budget before rolling back
    max_len = embeds.shape[1] + gen.max_new_tokens + k + 1
    logits, tgt_cache = _prefill(tgt_params, embeds, mask, tgt_cfg, max_len)
    _, dft_cache = _prefill(dft_params, embeds, mask, dft_cfg, max_len)

    can_stop = bool(gen.stop_sequences) or (
        gen.eos_token_id is not None and gen.eos_token_id >= 0)
    generated: List[int] = []
    rounds_run = 0
    accepted_hist: List[int] = []
    cur = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B,)
    pending = [int(np.asarray(cur)[0])]
    while True:
        for tok in pending:
            generated.append(tok)
            if tok == gen.eos_token_id or any(
                    _ends_with(generated, st) for st in gen.stop_sequences):
                return ([generated], _stats(rounds_run, accepted_hist)
                        ) if return_stats else [generated]
            if len(generated) >= gen.max_new_tokens:
                return ([generated], _stats(rounds_run, accepted_hist)
                        ) if return_stats else [generated]
        remaining = gen.max_new_tokens - len(generated)
        budget = min(remaining, 4 * (k + 1)) if can_stop else remaining
        cur, tgt_cache, dft_cache, emit, cnt, r = _spec_chunk(
            tgt_params, dft_params, cur, tgt_cache, dft_cache,
            jnp.int32(budget), tgt_cfg=tgt_cfg, dft_cfg=dft_cfg, k=k,
            max_rounds=gen.max_new_tokens)
        r = int(r)
        emit_h, cnt_h = np.asarray(emit), np.asarray(cnt)
        pending = []
        for ri in range(r):
            c = int(cnt_h[ri, 0])
            pending.extend(int(t) for t in emit_h[ri, 0, :c])
            accepted_hist.append(c - 1)
        rounds_run += r


def _stats(rounds: int, accepted: List[int]) -> Dict:
    acc = np.asarray(accepted, np.float64) if accepted else np.zeros(1)
    return {
        "rounds": rounds,
        "mean_accepted": float(acc.mean()),
        "tokens_per_round": float(acc.mean() + 1.0),
    }
