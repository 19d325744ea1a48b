"""Autoregressive generation with KV cache: greedy, sampling, beam search.

Re-provides the reference's HF ``generate(inputs_embeds=...)`` usage
(reference: stllm/conversation/conversation.py:231-243 — beam search, top-p,
repetition/length penalty, StoppingCriteria on '###' token ids [835] and
[2277, 29937]; greedy for MVBench at stllm/test/mvbench/mv_bench.py:274-277).

Design: two jitted device programs (prefill, single-token decode step) driven
by a Python loop that owns sampling bookkeeping and stop-sequence checks —
one compilation per (batch, prompt-bucket) shape, per-token dispatch is a
single device call.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stllm_tpu.models.llama import (
    KVCache,
    LlamaConfig,
    init_kv_cache,
    llama_forward,
    lm_head,
)


class UnsupportedRequest(ValueError):
    """A generation config the serving fast path (ContinuousBatcher /
    PrefixSession) cannot serve — beam, penalties, over-budget prompts.
    Callers catch exactly this to fall back to solo ``generate``; genuine
    bugs keep raising plain ValueError and propagate."""


@dataclasses.dataclass
class GenerationConfig:
    max_new_tokens: int = 300
    min_length: int = 1
    do_sample: bool = False
    num_beams: int = 1
    top_p: float = 0.9
    temperature: float = 1.0
    repetition_penalty: float = 1.0
    length_penalty: float = 1.0
    stop_sequences: Sequence[Sequence[int]] = ((835,), (2277, 29937))  # '###'
    eos_token_id: int = 2
    pad_to_multiple: int = 64


def _pad_prompt(embeds: jax.Array, mask: jax.Array, multiple: int):
    s = embeds.shape[1]
    pad = (-s) % multiple
    if pad:
        embeds = jnp.pad(embeds, ((0, 0), (0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
    return embeds, mask


@functools.partial(jax.jit, static_argnames=("cfg", "max_len"))
def _prefill(params, embeds, mask, cfg: LlamaConfig, max_len: int):
    cache = init_kv_cache(cfg, embeds.shape[0], max_len)
    hidden, cache = llama_forward(
        params, inputs_embeds=embeds, attention_mask=mask, cache=cache, cfg=cfg
    )
    # logits at each row's last VALID position
    last = jnp.clip(mask.sum(axis=-1).astype(jnp.int32) - 1, 0)
    last_hidden = jnp.take_along_axis(hidden, last[:, None, None], axis=1)
    return lm_head(params, last_hidden)[:, 0], cache


def _pad_kv_time(cache: KVCache, w: int) -> KVCache:
    """Zero-pad every KVCache buffer (incl. int8 scale planes) along the
    time axis to width ``w``. Shared body for the donating wrapper below
    and serving._pad_prefix_kv's copying one — a KVCache field added here
    is padded everywhere."""
    def pad_to(c):
        return jnp.pad(c, ((0, 0), (0, w - c.shape[1]))
                       + ((0, 0),) * (c.ndim - 2))

    ks = vs = None
    if cache.k_scale is not None:
        ks = tuple(pad_to(c) for c in cache.k_scale)
        vs = tuple(pad_to(c) for c in cache.v_scale)
    return KVCache(k=tuple(pad_to(c) for c in cache.k),
                   v=tuple(pad_to(c) for c in cache.v),
                   length=cache.length, k_scale=ks, v_scale=vs)


@functools.partial(jax.jit, static_argnames=("w",), donate_argnums=(0,))
def _grow_cache(cache: KVCache, w: int) -> KVCache:
    """Donating pad-to-width (PrefixSession cache growth).

    PrefixSession sizes its cache to the CURRENT history bucket instead of
    max_len: attention in prefill-into-cache and decode scans the whole
    buffer (masked lanes cost compute even though they contribute 0.0), so
    a 608-token first turn inside a 2048-slot buffer was paying 3.2x the
    attention score work of solo generate — the round-4 turn-1 regression
    (BENCH_PREFIX.json 445 vs 341 ms). Growth is one fused pad per buffer,
    amortized over the turns that fit the new bucket."""
    return _pad_kv_time(cache, w)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(3,))
def _prefill_delta(params, embeds, mask, cache: KVCache, cfg: LlamaConfig):
    """Prefill a (right-padded) chunk of NEW tokens into an EXISTING cache —
    the incremental half of multi-turn prefix reuse (PrefixSession). Writes
    land at each row's ``cache.length`` offset with absolute RoPE positions;
    attention is causal against the cache (kv_pos <= cache_len + i), so the
    result equals prefilling the full concatenated prompt from scratch.

    Safe-by-construction staleness rule (same invariant the padded-prompt
    decode path relies on): every kv position <= a real query's absolute
    position has already been written this turn or a previous one, and
    positions past ``cache.length + valid`` are only ever attended by PAD
    queries, whose outputs are discarded (logits are taken at the last valid
    position). Returns (last-valid-position logits (B, V), updated cache)."""
    hidden, cache = llama_forward(
        params, inputs_embeds=embeds, attention_mask=mask, cache=cache,
        cfg=cfg)
    last = jnp.clip(mask.sum(axis=-1).astype(jnp.int32) - 1, 0)
    last_hidden = jnp.take_along_axis(hidden, last[:, None, None], axis=1)
    return lm_head(params, last_hidden)[:, 0], cache


def _decode_step_impl(params, token_ids, cache: KVCache, cfg: LlamaConfig):
    embeds = params["embed_tokens"][token_ids][:, None].astype(cfg.dtype)
    hidden, cache = llama_forward(params, inputs_embeds=embeds, cache=cache, cfg=cfg)
    return lm_head(params, hidden)[:, 0], cache


_decode_step = functools.partial(jax.jit, static_argnames=("cfg",))(_decode_step_impl)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _decode_step_greedy(params, token_ids, cache: KVCache, cfg: LlamaConfig):
    """Greedy fast path: argmax ON DEVICE so only (B,) int32 token ids cross
    the host boundary per step (the full (B, vocab) fp32 logits transfer
    dominates per-token latency over the device tunnel)."""
    logits, cache = _decode_step(params, token_ids, cache, cfg)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache


def _reorder_cache(cache: KVCache, reorder) -> KVCache:
    """Gather beam rows in every per-layer buffer (layer-major pytree)."""
    return KVCache(
        k=tuple(a[reorder] for a in cache.k),
        v=tuple(a[reorder] for a in cache.v),
        length=cache.length[reorder],
        k_scale=None if cache.k_scale is None
        else tuple(a[reorder] for a in cache.k_scale),
        v_scale=None if cache.v_scale is None
        else tuple(a[reorder] for a in cache.v_scale),
    )


@functools.partial(jax.jit, static_argnames=("cfg", "k"), donate_argnums=(3,))
def _decode_step_topk_prefix(params, token_ids, prefix: KVCache,
                             gen_cache: KVCache, reorder, cfg: LlamaConfig,
                             k: int):
    """Beam-search device step: beam reorder + prefix-shared decode +
    log-softmax + top-k in ONE jitted call. The prompt KV lives ONCE in
    ``prefix`` (never replicated per beam — beam 5 x 512-token prompts on 7B
    OOM a 16 GB chip otherwise); only the small per-beam generated cache is
    gathered/donated. Each step transfers (B, k) floats + ids instead of the
    (B, vocab) logits."""
    from stllm_tpu.models.llama import llama_decode_prefix

    gen_cache = _reorder_cache(gen_cache, reorder)
    embeds = params["embed_tokens"][token_ids][:, None].astype(cfg.dtype)
    hidden, gen_cache = llama_decode_prefix(params, embeds, prefix, gen_cache, cfg)
    logits = lm_head(params, hidden)[:, 0]
    logp = jax.nn.log_softmax(logits, axis=-1)
    top_v, top_i = jax.lax.top_k(logp, k)
    return top_v, top_i.astype(jnp.int32), gen_cache


_TOPK_PREFILTER = 128


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(3,))
def _decode_step_logp_prefix(params, token_ids, prefix: KVCache,
                             gen_cache: KVCache, reorder, cfg: LlamaConfig):
    """Full-logprob variant of _decode_step_topk_prefix for the host beam
    loop's penalized form (the repetition penalty reshuffles ranks, so a
    fixed device top-k can't be pre-taken)."""
    from stllm_tpu.models.llama import llama_decode_prefix

    gen_cache = _reorder_cache(gen_cache, reorder)
    embeds = params["embed_tokens"][token_ids][:, None].astype(cfg.dtype)
    hidden, gen_cache = llama_decode_prefix(params, embeds, prefix, gen_cache, cfg)
    logits = lm_head(params, hidden)[:, 0]
    return jax.nn.log_softmax(logits, axis=-1), gen_cache


def _topp_next(logits, keys, temperature, top_p, sample_mask):
    """Exact nucleus (top-p) sampling, vectorized per row, ON DEVICE.

    Matches the host `_sample_top_p` truncation rule exactly: sort the
    temperature-scaled distribution descending, keep tokens while the
    cumulative mass BEFORE each token is < top_p (so the token that crosses
    the threshold is included), renormalize over the kept set, sample.
    Rows where ``sample_mask`` is False take the argmax instead — one
    program serves mixed greedy+sampled batches (the per-row branch is a
    select, not control flow, so XLA fuses it; reference sampling semantics:
    stllm/conversation/conversation.py:231-243 via HF do_sample/top_p).

    The hot form prefilters with ``lax.top_k(k=128)`` instead of a full-vocab
    sort (the per-step (B, 32000) f32 argsort halved mixed-traffic serving
    throughput, 156.8 vs 315.8 tok/s, round-3 BENCH_SERVING.json): top-k
    order equals the first k entries of the full sort (same tie rule), and
    the kept-prob arithmetic is identical, so whenever the top-k mass reaches
    top_p the truncated distribution is EXACT. When any sampled row's top-k
    mass falls short (flat distribution / top_p→1), a ``lax.cond`` branch
    runs the original full sort — and that branch still returns the
    prefiltered result for covered rows, so a row's stream NEVER depends on
    which branch a co-tenant forced (pinned in tests/test_serving.py).

    logits (B, V) f32; keys (B, 2) uint32 per-row PRNG keys; temperature,
    top_p, sample_mask (B,). Returns (B,) int32.
    """
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = logits / jnp.maximum(temperature, 1e-5)[:, None]
    v = scaled.shape[-1]
    k = min(_TOPK_PREFILTER, v)

    # approx_max_k(recall_target=1.0) is EXACT top-k via the TPU-native
    # PartialReduce op — ~9x cheaper than lax.top_k's sort lowering on this
    # chip (measured, (8, 32000) f32), bit-identical output (asserted on
    # random data; XLA documents recall 1.0 as exact)
    top_v, top_i = jax.lax.approx_max_k(scaled, k, recall_target=1.0)
    lz = jax.nn.logsumexp(scaled, axis=-1, keepdims=True)
    probs = jnp.exp(top_v - lz)                 # true softmax probs of top-k
    cum = jnp.cumsum(probs, axis=-1)
    keep = (cum - probs) < top_p[:, None]       # first token always kept
    masked = jnp.where(keep, top_v, -jnp.inf)
    pos = jax.vmap(jax.random.categorical)(keys, masked)
    fast = jnp.take_along_axis(
        top_i, pos[:, None], axis=-1)[:, 0].astype(jnp.int32)

    if k == v:  # prefilter IS the full sort
        return jnp.where(sample_mask, fast, greedy)

    covered = cum[:, -1] >= top_p               # kept set ⊆ top-k
    needs_full = jnp.any(sample_mask & ~covered)

    def full_sort(_):
        order = jnp.argsort(-scaled, axis=-1)
        sorted_logits = jnp.take_along_axis(scaled, order, axis=-1)
        p = jax.nn.softmax(sorted_logits, axis=-1)
        cumf = jnp.cumsum(p, axis=-1)
        keepf = (cumf - p) < top_p[:, None]
        maskedf = jnp.where(keepf, sorted_logits, -jnp.inf)
        posf = jax.vmap(jax.random.categorical)(keys, maskedf)
        tok = jnp.take_along_axis(
            order, posf[:, None], axis=-1)[:, 0].astype(jnp.int32)
        # covered rows keep the prefiltered draw: branch choice is a batch-
        # global property (a co-tenant may force it) and must not leak into
        # any covered row's stream
        return jnp.where(covered, fast, tok)

    sampled = jax.lax.cond(needs_full, full_sort, lambda _: fast, None)
    return jnp.where(sample_mask, sampled, greedy)


@jax.jit
def _first_token_mixed(logits, keys, temperature, top_p, sample_mask):
    """Sample/argmax the prefill logits (token index 0 of each stream)."""
    return _topp_next(logits.astype(jnp.float32), keys, temperature, top_p,
                      sample_mask)


@jax.jit
def _first_token_sampled(logits, seed, temperature, top_p):
    """Admit-time helper: build the stream key from the request seed INSIDE
    jit (PRNGKey is a device op — constructing it eagerly on the host costs
    a blocking ~30 ms round trip per admit through the device tunnel) and
    sample token index 0. Returns (token (1,), key (2,))."""
    key = jax.random.PRNGKey(seed)
    tok = _topp_next(logits.astype(jnp.float32),
                     jax.random.fold_in(key, 0)[None],
                     temperature[None], top_p[None],
                     jnp.ones((1,), bool))
    return tok, key


def _penalize_logits(lg: jax.Array, seen: jax.Array,
                     penalty: jax.Array) -> jax.Array:
    """HF RepetitionPenaltyLogitsProcessor rule on raw logits: previously
    generated tokens (``seen`` (B, V) bool) have positive logits divided by
    the penalty and negative ones multiplied. ``penalty`` (B,) f32 — 1.0 is
    the exact identity, so mixed batches need no gating (reference forces
    1.5 in the simple-prompt chat mode, conversation.py:226)."""
    pen = penalty[:, None]
    return jnp.where(seen, jnp.where(lg < 0, lg * pen, lg / pen), lg)


def _mask_min_length(lg: jax.Array, step: jax.Array, min_len: jax.Array,
                     eos: jax.Array) -> jax.Array:
    """-inf the eos column for rows whose emitted-token index ``step`` (B,)
    is still below ``min_len`` (B,). ``eos`` (B,) int32; a negative id
    matches no column (eos disabled). Mirrors the host reference loop's
    ``step < min_length`` check, which fires at step 0 even for the default
    min_length=1 (same rule the device beam pins, _beam_chunk_device)."""
    col = jnp.arange(lg.shape[-1])[None, :] == eos[:, None]
    return jnp.where(col & (step < min_len)[:, None], -1e30, lg)


@jax.jit
def _first_token_penalized(logits, keys, temperature, top_p, sample_mask,
                           min_len, eos):
    """Select token index 0 from the prefill logits under min_length eos
    masking (the repetition penalty is a no-op at step 0: nothing has been
    generated). All args per-row; keys must already be fold_in(key, 0)."""
    lg = logits.astype(jnp.float32)
    lg = _mask_min_length(lg, jnp.zeros(lg.shape[:1], jnp.int32), min_len,
                          eos)
    return _topp_next(lg, keys, temperature, top_p, sample_mask)


@functools.partial(jax.jit, static_argnames=("cfg", "n"),
                   donate_argnums=(2, 3))
def _decode_chunk_penalized(params, token_ids, cache: KVCache,
                            seen: jax.Array, cfg: LlamaConfig, n: int, keys,
                            counters, temperature, top_p, sample_mask,
                            penalty, min_len, eos):
    """_decode_chunk_mixed plus the two rank-reshuffling logit processors
    the host reference loop applied (repetition penalty over the (B, V)
    ``seen`` generated-token set, min_length eos masking) — the penalized
    configs used to pay one blocking host round-trip per token (~30 ms
    through the device tunnel); this runs them ``n`` tokens per call like
    every other decode path. ``seen`` is carried and returned so penalty
    state persists across chunks. Per-row penalty/min_len/eos let one
    program serve mixed penalized + plain traffic (penalty 1.0 and
    min_len 0 are exact identities)."""
    b = token_ids.shape[0]

    def body(carry, i):
        cur, cache, seen = carry
        # the incoming token is part of the generated sequence feeding the
        # penalty (host rule: generated includes everything emitted so far)
        seen = seen.at[jnp.arange(b), cur].set(True)
        logits, cache = _decode_step_impl(params, cur, cache, cfg)
        lg = _penalize_logits(logits.astype(jnp.float32), seen, penalty)
        lg = _mask_min_length(lg, counters + i, min_len, eos)
        step_keys = jax.vmap(jax.random.fold_in)(keys, counters + i)
        nxt = _topp_next(lg, step_keys, temperature, top_p, sample_mask)
        return (nxt, cache, seen), nxt

    (_, cache, seen), toks = jax.lax.scan(
        body, (token_ids, cache, seen), jnp.arange(n))
    return toks.T, cache, seen  # (B, n)


@functools.partial(jax.jit, static_argnames=("cfg", "n"), donate_argnums=(2,))
def _decode_chunk_mixed(params, token_ids, cache: KVCache, cfg: LlamaConfig,
                        n: int, keys, counters, temperature, top_p,
                        sample_mask):
    """Decode ``n`` tokens in ONE device call with per-row greedy/top-p
    selection. Each row's PRNG stream is `fold_in(row_key, token_index)`
    with token_index counted per REQUEST (``counters`` + step offset), so a
    request's sampled tokens are reproducible regardless of which slot it
    lands in, what shares the batch, or the server's chunk size."""

    def body(carry, i):
        cur, cache = carry
        logits, cache = _decode_step_impl(params, cur, cache, cfg)
        step_keys = jax.vmap(jax.random.fold_in)(keys, counters + i)
        nxt = _topp_next(logits.astype(jnp.float32), step_keys, temperature,
                         top_p, sample_mask)
        return (nxt, cache), nxt

    (_, cache), toks = jax.lax.scan(body, (token_ids, cache), jnp.arange(n))
    return toks.T, cache  # (B, n)


@functools.partial(jax.jit, static_argnames=("cfg", "n"), donate_argnums=(2,))
def _decode_chunk_greedy(params, token_ids, cache: KVCache, cfg: LlamaConfig,
                         n: int):
    """Decode ``n`` greedy tokens in ONE device call (lax.scan) — amortizes
    per-call dispatch latency, which dominates single-token decode. The cache
    is donated so the (layers, B, max_len, H, D) buffers update in place.
    Returns ((B, n) tokens, cache)."""

    def body(carry, _):
        cur, cache = carry
        logits, cache = _decode_step_impl(params, cur, cache, cfg)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (nxt, cache), nxt

    (_, cache), toks = jax.lax.scan(body, (token_ids, cache), None, length=n)
    return toks.T, cache  # (B, n)


def _apply_repetition_penalty(logits: np.ndarray, generated: List[List[int]],
                              penalty: float) -> np.ndarray:
    if penalty == 1.0:
        return logits
    for row, ids in enumerate(generated):
        for t in set(ids):
            v = logits[row, t]
            logits[row, t] = v * penalty if v < 0 else v / penalty
    return logits


def _sample_top_p(logits: np.ndarray, top_p: float, temperature: float,
                  rng: np.random.Generator) -> np.ndarray:
    logits = logits / max(temperature, 1e-5)
    logits = logits - logits.max(axis=-1, keepdims=True)
    probs = np.exp(logits)
    probs /= probs.sum(axis=-1, keepdims=True)
    out = np.empty(len(probs), np.int64)
    for i, p in enumerate(probs):
        order = np.argsort(-p)
        cum = np.cumsum(p[order])
        keep = cum - p[order] < top_p  # keep tokens until mass reached (incl. first above)
        kept = order[keep]
        kp = p[kept] / p[kept].sum()
        out[i] = rng.choice(kept, p=kp)
    return out


def _ends_with(ids: List[int], suffix: Sequence[int]) -> bool:
    n = len(suffix)
    return len(ids) >= n and ids[-n:] == list(suffix)


def generate(
    params,
    inputs_embeds: jax.Array,
    attention_mask: Optional[jax.Array] = None,
    *,
    llama_cfg: LlamaConfig,
    gen: GenerationConfig = GenerationConfig(),
    seed: int = 0,
) -> List[List[int]]:
    """Generate token ids per batch row (stop sequence included when hit)."""
    if gen.num_beams > 1:
        return [
            beam_search(
                params,
                inputs_embeds[i : i + 1],
                None if attention_mask is None else attention_mask[i : i + 1],
                llama_cfg=llama_cfg, gen=gen,
            )
            for i in range(inputs_embeds.shape[0])
        ]

    b, s, _ = inputs_embeds.shape
    if attention_mask is None:
        attention_mask = jnp.ones((b, s), jnp.int32)
    embeds, mask = _pad_prompt(inputs_embeds, attention_mask, gen.pad_to_multiple)
    max_len = embeds.shape[1] + gen.max_new_tokens
    logits, cache = _prefill(params, embeds, mask, llama_cfg, max_len)

    if gen.repetition_penalty == 1.0 and gen.min_length <= 1:
        if not gen.do_sample:
            return _generate_greedy_ondevice(params, logits, cache,
                                             llama_cfg, gen, b)[0]
        return _generate_sample_ondevice(params, logits, cache, llama_cfg,
                                         gen, b, seed)[0]
    return _generate_penalized_ondevice(params, logits, cache, llama_cfg,
                                        gen, b, seed)[0]


def _generate_host_loop(params, logits, cache, llama_cfg: LlamaConfig,
                        gen: GenerationConfig, b: int, seed: int):
    """Per-token host REFERENCE loop for penalized configs (repetition
    penalty reshuffles ranks; min_length masks eos). Production routes
    these through _generate_penalized_ondevice — greedy tokens are pinned
    equal to this loop in tests/test_llama.py; its np-rng sampling rule
    predates the device fold_in streams and is kept only as the greedy
    oracle. Returns (generated, final cache) like the on-device loops."""
    rng = np.random.default_rng(seed)
    generated: List[List[int]] = [[] for _ in range(b)]
    done = [False] * b
    for step in range(gen.max_new_tokens):
        lg = np.array(logits, np.float32)
        lg = _apply_repetition_penalty(lg, generated, gen.repetition_penalty)
        if step < gen.min_length:
            lg[:, gen.eos_token_id] = -1e30
        if gen.do_sample:
            nxt = _sample_top_p(lg, gen.top_p, gen.temperature, rng)
        else:
            nxt = lg.argmax(axis=-1)
        for i in range(b):
            if not done[i]:
                generated[i].append(int(nxt[i]))
                if int(nxt[i]) == gen.eos_token_id or any(
                    _ends_with(generated[i], stop) for stop in gen.stop_sequences
                ):
                    done[i] = True
        if all(done):
            break
        cur = jnp.asarray(nxt, jnp.int32)
        logits, cache = _decode_step(params, cur, cache, llama_cfg)
    return generated, cache


def _generate_greedy_ondevice(params, logits, cache, llama_cfg: LlamaConfig,
                              gen: GenerationConfig, b: int,
                              chunk: int = 16) -> List[List[int]]:
    """Greedy loop: tokens are produced ``chunk`` at a time in one device
    call; stop-sequence checks run on host between chunks and truncate any
    over-generation (per-row semantics identical to the step-wise loop).

    When no early stop is possible (eos disabled and no stop sequences),
    the between-chunk host checks can't change the outcome, so the whole
    budget runs as ONE device call — each blocking host round-trip costs
    ~30 ms through the axon tunnel (~2 ms/token at chunk=16 on a 64-token
    run, script/profile_decode.py).

    Returns (generated, final cache) — the cache is what PrefixSession
    persists across chat turns."""
    state = {"cur": jnp.argmax(logits, axis=-1).astype(jnp.int32),
             "cache": cache}

    def run_chunk(n):
        toks, state["cache"] = _decode_chunk_greedy(
            params, state["cur"], state["cache"], llama_cfg, n)
        state["cur"] = toks[:, -1]
        return toks

    out = _chunked_decode_loop(b, gen, state["cur"], run_chunk, chunk)
    return out, state["cache"]


def _chunked_decode_loop(b, gen: GenerationConfig, first, run_chunk,
                         chunk: int) -> List[List[int]]:
    """Shared host side of the chunked decode loops: emit tokens, check
    per-row stop conditions between device chunks, truncate over-generation.
    ``run_chunk(n)`` advances the device state by ``n`` tokens and returns
    the (b, n) token block. When no early stop is possible the whole budget
    runs as one chunk (see _generate_greedy_ondevice)."""
    can_stop = bool(gen.stop_sequences) or (
        gen.eos_token_id is not None and gen.eos_token_id >= 0)
    if not can_stop:
        chunk = gen.max_new_tokens
    generated: List[List[int]] = [[] for _ in range(b)]
    done = [False] * b
    emitted = 0
    pending = np.asarray(first)[:, None]  # first token from prefill logits
    while True:
        for col in range(pending.shape[1]):
            for i in range(b):
                if not done[i]:
                    generated[i].append(int(pending[i, col]))
                    if int(pending[i, col]) == gen.eos_token_id or any(
                        _ends_with(generated[i], st) for st in gen.stop_sequences
                    ):
                        done[i] = True
            emitted += 1
            if emitted >= gen.max_new_tokens or all(done):
                return generated
        n = min(chunk, gen.max_new_tokens - emitted)
        pending = np.asarray(run_chunk(n))
    return generated


@functools.partial(jax.jit, static_argnames="b")
def _build_row_keys(seed, b: int):
    """(b, 2) uint32 row keys PRNGKey(seed+r), built in ONE device call —
    the eager per-row host loop this replaces paid b blocking ~30 ms tunnel
    round-trips at the start of every sampled generate (ADVICE round 3)."""
    return jax.vmap(jax.random.PRNGKey)(seed + jnp.arange(b, dtype=jnp.int32))


def _generate_sample_ondevice(params, logits, cache, llama_cfg: LlamaConfig,
                              gen: GenerationConfig, b: int,
                              seed: int, chunk: int = 16) -> List[List[int]]:
    """Nucleus sampling with the same chunked on-device loop as greedy —
    the per-token host round-trip of the old top-k/host-choice form cost
    ~30 ms each through the device tunnel, making the chat protocol
    (do_sample=True, reference conversation.py:231-243) ~4x slower than
    greedy; sampling on device brings it to greedy-equal latency.

    Row r draws from `fold_in(PRNGKey(seed + r), token_index)` — exactly
    the stream the continuous batcher uses for a request with seed+r, so a
    single-row generate() and a ContinuousBatcher request with the same
    seed return the SAME tokens (pinned in tests/test_serving.py).

    Returns (generated, final cache) like _generate_greedy_ondevice."""
    keys = _build_row_keys(jnp.int32(seed), b)
    temp = jnp.full((b,), gen.temperature, jnp.float32)
    topp = jnp.full((b,), gen.top_p, jnp.float32)
    samp = jnp.ones((b,), bool)
    first = _first_token_mixed(
        logits, jax.vmap(jax.random.fold_in)(keys, jnp.zeros((b,), jnp.int32)),
        temp, topp, samp)
    state = {"cur": first, "cache": cache, "count": 1}

    def run_chunk(n):
        toks, state["cache"] = _decode_chunk_mixed(
            params, state["cur"], state["cache"], llama_cfg, n, keys,
            jnp.full((b,), state["count"], jnp.int32), temp, topp, samp)
        state["cur"] = toks[:, -1]
        state["count"] += n
        return toks

    out = _chunked_decode_loop(b, gen, first, run_chunk, chunk)
    return out, state["cache"]


def _generate_penalized_ondevice(params, logits, cache,
                                 llama_cfg: LlamaConfig,
                                 gen: GenerationConfig, b: int, seed: int,
                                 chunk: int = 16):
    """Chunked on-device loop for repetition-penalty / min_length configs —
    the simple-prompt chat mode the reference forces repetition_penalty=1.5
    into (conversation.py:226), i.e. the PRODUCTION chat configuration.
    These used to run the per-token host loop (~30 ms/token through the
    device tunnel); this brings them to greedy-equal latency.

    Greedy tokens equal the host reference loop exactly (fp32-pinned in
    tests/test_llama.py, HF-pinned for the penalty rule). Sampled rows draw
    from the SAME fold_in(PRNGKey(seed + r), token_index) streams as the
    plain sampled path and the continuous batcher, applied to the penalized
    distribution. Returns (generated, final cache)."""
    v = logits.shape[-1]
    keys = _build_row_keys(jnp.int32(seed), b)
    temp = jnp.full((b,), gen.temperature, jnp.float32)
    topp = jnp.full((b,), gen.top_p, jnp.float32)
    samp = jnp.full((b,), bool(gen.do_sample))
    pen = jnp.full((b,), gen.repetition_penalty, jnp.float32)
    minl = jnp.full((b,), gen.min_length, jnp.int32)
    eos_id = -1 if gen.eos_token_id is None else gen.eos_token_id
    eos = jnp.full((b,), eos_id, jnp.int32)
    first = _first_token_penalized(
        logits, jax.vmap(jax.random.fold_in)(keys,
                                             jnp.zeros((b,), jnp.int32)),
        temp, topp, samp, minl, eos)
    state = {"cur": first, "cache": cache,
             "seen": jnp.zeros((b, v), bool), "count": 1}

    def run_chunk(n):
        toks, state["cache"], state["seen"] = _decode_chunk_penalized(
            params, state["cur"], state["cache"], state["seen"], llama_cfg,
            n, keys, jnp.full((b,), state["count"], jnp.int32), temp, topp,
            samp, pen, minl, eos)
        state["cur"] = toks[:, -1]
        state["count"] += n
        return toks

    out = _chunked_decode_loop(b, gen, first, run_chunk, chunk)
    return out, state["cache"]


class PrefixSession:
    """Multi-turn KV reuse for one conversation (vLLM-style prefix caching).

    Every chat turn re-prefills the FULL conversation — system text, the
    ~600-token video embedding block, and all previous turns — both in the
    reference (HF ``generate`` from scratch per turn,
    reference: stllm/conversation/conversation.py:222-243) and in plain
    ``generate``. A PrefixSession keeps the conversation's KV cache alive
    between turns: the next turn matches its token stream against what is
    already cached (host-side, per-token identity — text tokens by id, video
    embeddings by array identity) and prefills ONLY the unmatched tail
    (typically the previous answer + the new question, tens of tokens
    instead of thousands).

    Correctness: the reused prefix is validated token-by-token, so a changed
    prompt (different video, edited history, ``max_length`` truncation
    shifting the window) degrades to a full re-prefill, never a wrong
    answer. Resetting ``cache.length`` to the matched length makes every
    stale position unreachable — a kv position is only attendable once a
    real token has been (re)written there this turn (see _prefill_delta).

    Numerics: the delta prefill computes the SAME attention sums as a
    from-scratch prefill (masked-out lanes contribute exactly 0.0), but
    through a differently-shaped program; in fp32 results are bitwise
    identical (pinned in tests/test_prefix_session.py), in bf16 tie-flips
    on sub-rounding-error logit margins are possible across program shapes
    (the spec-decode exactness class, see probe_spec_divergence.py).

    One session holds one (1, max_len) cache: ~2.1 GiB for 7B bf16 at 2048
    positions, ~1.05 GiB with ``cfg.kv_int8`` — budget accordingly
    (demo_web's --prefix-kv caps live sessions with an LRU).
    """

    # cache-width growth bucket: programs key on (delta bucket, width), so
    # coarse buckets bound recompiles while keeping early turns near their
    # solo-prefill attention cost (256 ≈ within 1 bucket of a 608-token
    # video prompt)
    _WINDOW = 256

    def __init__(self, params, llama_cfg: LlamaConfig, max_len: int = 2048):
        self.params = params
        self.cfg = llama_cfg
        self.max_len = max_len
        self.cache: Optional[KVCache] = None
        self.items: List = []      # per-position identity of cached tokens
        self.last_reused = 0       # introspection (tests/bench)

    class _Ref:
        """Identity wrapper for a video-embedding array: compares by ``is``
        (array values are never compared — embedding floats aren't hashable
        identity) and keeps the array alive while cached items reference it,
        so a recycled ``id()`` can never alias a dropped upload."""

        __slots__ = ("a",)

        def __init__(self, a):
            self.a = a

        def __eq__(self, other):
            return isinstance(other, PrefixSession._Ref) and self.a is other.a

        def __hash__(self):
            return id(self.a)

    @staticmethod
    def items_for(segment_ids: Sequence[Sequence[int]],
                  img_list: Sequence) -> List:
        """Flatten interleaved [text ids, video, text ids, ...] into
        per-token identity items. Text tokens compare by id; video-embedding
        tokens by the embedding array's identity + position (uploads are
        held per-session, so identity is stable across turns)."""
        items: List = []
        for i, ids in enumerate(segment_ids):
            items.extend(("t", int(t)) for t in ids)
            if i < len(img_list):
                ref = PrefixSession._Ref(img_list[i])
                items.extend(("v", ref, j)
                             for j in range(img_list[i].shape[1]))
        return items

    def generate(self, inputs_embeds: jax.Array, items: Sequence,
                 gen: GenerationConfig = GenerationConfig(), *,
                 seed: int = 0) -> List[int]:
        """One turn: delta-prefill against the cached prefix, decode, and
        retain the updated cache + token record for the next turn. Output is
        the same tokens ``generate`` returns for the full prompt — greedy,
        sampled, and repetition-penalty / min_length configs (the
        simple-prompt chat mode, reference conversation.py:220) all run
        chunked on-device loops. Raises ValueError for configs the session
        can't
        serve (beam, prompt + budget past max_len) — callers fall back to
        solo generate, mirroring AnswerService's contract."""
        b, s, _ = inputs_embeds.shape
        if b != 1:
            raise UnsupportedRequest(
                "PrefixSession is per-conversation (batch 1)")
        if gen.num_beams > 1:
            raise UnsupportedRequest("beam search needs solo generate")
        if s != len(items):
            raise ValueError(f"items/embeds length mismatch: {len(items)} "
                             f"vs {s}")
        # write extents: a from-scratch prefill (p=0) writes pad(s) slots,
        # decode writes [s, s + budget) — both must fit the cache buffer
        # (dynamic_update_slice would silently CLAMP an overflowing delta
        # start onto committed positions, corrupting the cache)
        pad_m = gen.pad_to_multiple
        s_pad = s + (-s) % pad_m
        if max(s_pad, s + gen.max_new_tokens) > self.max_len:
            raise UnsupportedRequest(
                f"prompt {s} (padded {s_pad}) + budget "
                f"{gen.max_new_tokens} exceeds session "
                f"max_len {self.max_len}")

        items = list(items)
        p = 0
        if self.cache is not None:
            # cache None with non-empty items = a previous turn died after
            # donating the cache (device error mid-_prefill_delta); recover
            # by re-prefilling from scratch instead of dereferencing None
            for a, bb in zip(self.items, items):
                if a != bb:
                    break
                p += 1
        # the last prompt position is always recomputed: its logits seed
        # the decode loop (a fully-cached prompt has no fresh logits)
        p = min(p, s - 1)
        # the delta pads to pad_to_multiple, so its write span is
        # [p, p + pad(s - p)); drop matched tokens until it fits max_len
        # (terminates: p = 0 fits by the s_pad check above)
        while p > 0 and p + (s - p) + (-(s - p)) % pad_m > self.max_len:
            p -= 1
        # size the cache to the CURRENT history bucket (grown as turns
        # accumulate), not max_len: prefill-into-cache and decode attend
        # over the whole buffer, so a max_len buffer made short early turns
        # pay for history they don't have yet (the round-4 turn-1
        # regression; see _grow_cache)
        need = max(p + (s - p) + (-(s - p)) % pad_m,
                   s + gen.max_new_tokens)
        w = min(self.max_len, -(-need // self._WINDOW) * self._WINDOW)
        delta, mask = _pad_prompt(
            inputs_embeds[:, p:],
            jnp.ones((1, s - p), jnp.int32), gen.pad_to_multiple)
        if self.cache is None and p == 0:
            # fresh session: the from-scratch prefill program creates its
            # cache in-jit — no input-cache buffers to carry, so turn 1
            # costs what solo generate's prefill costs at the same bucket
            self.last_reused = 0
            logits, cache = _prefill(self.params, delta, mask, self.cfg, w)
        else:
            if self.cache.k[0].shape[1] < w:
                self.cache = _grow_cache(self.cache, w=w)
            self.last_reused = p
            cache = self.cache._replace(
                length=jnp.full((1,), p, jnp.int32))
            self.cache = None  # donated below; never hold a stale handle
            logits, cache = _prefill_delta(self.params, delta, mask, cache,
                                           self.cfg)

        if gen.repetition_penalty != 1.0 or gen.min_length > 1:
            out, cache = _generate_penalized_ondevice(
                self.params, logits, cache, self.cfg, gen, 1, seed)
        elif not gen.do_sample:
            out, cache = _generate_greedy_ondevice(
                self.params, logits, cache, self.cfg, gen, 1)
        else:
            out, cache = _generate_sample_ondevice(
                self.params, logits, cache, self.cfg, gen, 1, seed)
        self.cache = cache
        generated = out[0]
        # tokens fed back into the decode loop have their KV in the cache;
        # the final emitted token may not have been consumed — drop it from
        # the reusable record (one token of reuse, never a stale read)
        self.items = items + [("t", int(t)) for t in generated[:-1]]
        return list(generated)

    def release(self) -> None:
        """Free the device cache now (LRU eviction in demo_web) — the next
        turn re-prefills from scratch."""
        if self.cache is not None:
            for leaf in jax.tree_util.tree_leaves(self.cache):
                leaf.delete()
        self.cache = None
        self.items = []
        self.last_reused = 0


# ---------------------------------------------------------------------------
# On-device chunked beam search
# ---------------------------------------------------------------------------
#
# The host beam loop below pays one blocking device round-trip per token; over
# a networked TPU that dominates (measured ~4x greedy latency). The device
# beam runs ``chunk`` whole beam steps in ONE jitted lax.scan call — decode,
# candidate expansion, finished-hypothesis pooling and survivor selection all
# on device — and returns per-step backpointer records (parent beam, token)
# from which the host reconstructs exact sequences. Semantics replicate the
# host loop candidate-for-candidate (which tests pin against HF generate,
# tests/test_llama.py): all k*2k candidates ranked by score (ties broken in
# beam-major enumeration order), scanned in rank order, finished candidates
# pooled until the k-th survivor is found, survivors padded by repetition
# when fewer than k exist.
#
# Device support covers the benchmark protocol (reference:
# stllm/test/qabench/msvd_qa.py:111-115 — beam 5, '###' stops): stop
# sequences of length <= 2 plus eos, min_length via candidate exclusion.
# Longer stop sequences or repetition penalty fall back to the host loop.


class _BeamProto(NamedTuple):
    """Hashable static subset of GenerationConfig for the jitted beam step."""
    eos: int
    stops1: Tuple[int, ...]            # single-token stop ids
    stops2: Tuple[Tuple[int, int], ...]  # two-token stop suffixes
    min_length: int
    length_penalty: float
    rep_penalty: float = 1.0

    @staticmethod
    def from_gen(gen: "GenerationConfig") -> "_BeamProto":
        return _BeamProto(
            eos=gen.eos_token_id,
            stops1=tuple(s[-1] for s in gen.stop_sequences if len(s) == 1),
            stops2=tuple(tuple(s) for s in gen.stop_sequences if len(s) == 2),
            min_length=gen.min_length,
            length_penalty=gen.length_penalty,
            rep_penalty=gen.repetition_penalty,
        )


def beam_device_supported(gen: "GenerationConfig") -> bool:
    return all(len(s) <= 2 for s in gen.stop_sequences)


def _penalize_logp(logp: jax.Array, seen: jax.Array, pen: float) -> jax.Array:
    """HF beam-mode repetition penalty: applied to the LOG-SOFTMAXED scores
    (transformers beam_search applies logits processors after log_softmax —
    unlike greedy/sampling, where they act on raw logits), per beam, over
    that beam's generated tokens. The reference's simple-prompt chat mode
    forces repetition_penalty=1.5 into beam answers
    (reference: stllm/conversation/conversation.py:220, 240) — qabench and
    vcgbench run that protocol, so beam parity requires this."""
    return jnp.where(seen, jnp.where(logp < 0, logp * pen, logp / pen), logp)


def _update_seen(seen: jax.Array, parents: jax.Array,
                 tokens: jax.Array) -> jax.Array:
    """seen (k, V) bool: new beam rows inherit their parent's token set plus
    their own new token."""
    k = parents.shape[0]
    return seen[parents].at[jnp.arange(k), tokens].set(True)


class _BeamState(NamedTuple):
    scores: jax.Array        # (k,) cumulative log-probs
    last_token: jax.Array    # (k,) int32 — token to feed next
    reorder: jax.Array       # (k,) int32 — parent beam for the next decode
    step: jax.Array          # () int32 — tokens emitted so far
    fin_count: jax.Array     # () int32 — total finished hypotheses
    pool_score: jax.Array    # (k,) length-penalized scores of best finished
    pool_step: jax.Array     # (k,) step at which each pool entry finished
    pool_parent: jax.Array   # (k,) parent beam index at that step
    pool_token: jax.Array    # (k,) final token of the hypothesis
    no_survivors: jax.Array  # () bool — a step produced zero survivors


def _beam_transition(state: _BeamState, top_v, top_i, proto: _BeamProto,
                     k: int):
    """One beam step given (k, 2k) per-beam top-k log-probs. Returns the new
    state plus this step's backpointer record {parent, token}."""
    # all k*2k candidates, beam-major (matches host enumeration order)
    cand_score = (state.scores[:, None] + top_v).reshape(-1)       # (k*2k,)
    cand_token = top_i.reshape(-1)
    cand_parent = jnp.repeat(jnp.arange(k, dtype=jnp.int32), top_v.shape[1])

    # min_length: exclude eos candidates entirely while step < min_length.
    # The host loop's `step < min_length` check fires at step 0 even for the
    # default min_length=1, so gate on > 0 (not > 1); excluded candidates are
    # dropped from the pool below via the isfinite mask, mirroring the host's
    # `continue` (which removes them rather than treating them as finished).
    if proto.min_length > 0:
        excl = (cand_token == proto.eos) & (state.step < proto.min_length)
        cand_score = jnp.where(excl, -jnp.inf, cand_score)

    n_cand = cand_score.shape[0]
    sort_v, sort_idx = jax.lax.top_k(cand_score, n_cand)  # ties: lower index
    sort_token = cand_token[sort_idx]
    sort_parent = cand_parent[sort_idx]

    fin = sort_token == proto.eos
    for t in proto.stops1:
        fin = fin | (sort_token == t)
    for a, b in proto.stops2:
        # candidate suffix-2 = (parent beam's last emitted token, candidate);
        # undefined before any token was emitted (host: len(ids) < 2)
        fin = fin | ((state.last_token[sort_parent] == a)
                     & (sort_token == b) & (state.step >= 1))

    # scan candidates in rank order: survivors fill the beam; finished
    # candidates ranked before the k-th survivor join the pool (the host
    # loop breaks right after appending the k-th survivor)
    surv_cum = jnp.cumsum((~fin).astype(jnp.int32))
    n_surv = jnp.minimum(surv_cum[-1], k)
    has_k = surv_cum[-1] >= k
    kth_pos = jnp.argmax(surv_cum == k)
    processed = jnp.where(has_k, kth_pos + 1, n_cand)
    eligible = fin & (jnp.arange(n_cand) < processed) & jnp.isfinite(sort_v)

    # pos_of_rank[r] = candidate index of the (r+1)-th survivor; finished or
    # rank>=k candidates scatter to the dropped index k
    rank = jnp.where(fin | (surv_cum > k), k, surv_cum - 1)
    pos_of_rank = jnp.full((k,), n_cand - 1, jnp.int32).at[rank].min(
        jnp.arange(n_cand, dtype=jnp.int32), mode="drop")
    last_surv = pos_of_rank[jnp.clip(n_surv - 1, 0, k - 1)]
    slots = jnp.where(jnp.arange(k) < n_surv, pos_of_rank, last_surv)

    new_scores = sort_v[slots]
    new_tokens = sort_token[slots]
    new_parents = sort_parent[slots]

    # pool finished candidates (length-penalized), keep the global best k
    length = (state.step + 1).astype(jnp.float32)
    fin_norm = jnp.where(eligible,
                         sort_v / (length ** proto.length_penalty),
                         -jnp.inf)
    all_scores = jnp.concatenate([state.pool_score, fin_norm])
    all_step = jnp.concatenate(
        [state.pool_step, jnp.full((n_cand,), state.step, jnp.int32)])
    all_parent = jnp.concatenate([state.pool_parent, sort_parent])
    all_token = jnp.concatenate([state.pool_token, sort_token])
    best_v, best_i = jax.lax.top_k(all_scores, k)

    new_state = _BeamState(
        scores=new_scores,
        last_token=new_tokens,
        reorder=new_parents,
        step=state.step + 1,
        fin_count=state.fin_count + eligible.sum(dtype=jnp.int32),
        pool_score=best_v,
        pool_step=all_step[best_i],
        pool_parent=all_parent[best_i],
        pool_token=all_token[best_i],
        no_survivors=state.no_survivors | (n_surv == 0),
    )
    return new_state, {"parent": new_parents, "token": new_tokens}


_beam_first_step = functools.partial(
    jax.jit, static_argnames=("proto", "k"))(_beam_transition)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "proto", "k", "chunk"),
    donate_argnums=(2, 4),
)
def _beam_chunk_device(params, state: _BeamState, seen: jax.Array,
                       prefix: KVCache, gen_cache: KVCache, cfg: LlamaConfig,
                       proto: _BeamProto, k: int, chunk: int):
    """Run ``chunk`` full beam steps on device. Steps after termination
    (pool full / no survivors) still execute but are masked: the state
    freezes and the per-step ``alive`` flag marks their records invalid.
    ``seen`` is the (k, V) per-beam generated-token set feeding the
    HF-beam-mode repetition penalty (_penalize_logp)."""
    from stllm_tpu.models.llama import llama_decode_prefix

    def body(carry, _):
        state, seen, cache = carry
        alive = (state.fin_count < k) & ~state.no_survivors
        cache = _reorder_cache(cache, state.reorder)
        embeds = params["embed_tokens"][state.last_token][:, None].astype(cfg.dtype)
        hidden, cache = llama_decode_prefix(params, embeds, prefix, cache, cfg)
        logits = lm_head(params, hidden)[:, 0]
        logp = jax.nn.log_softmax(logits, axis=-1)
        if proto.rep_penalty != 1.0:
            logp = _penalize_logp(logp, seen, proto.rep_penalty)
        top_v, top_i = jax.lax.top_k(logp, 2 * k)
        new_state, record = _beam_transition(
            state, top_v, top_i.astype(jnp.int32), proto, k)
        new_seen = _update_seen(seen, new_state.reorder,
                                new_state.last_token)
        new_state = jax.tree_util.tree_map(
            lambda n, o: jnp.where(alive, n, o), new_state, state)
        new_seen = jnp.where(alive, new_seen, seen)
        record["alive"] = alive
        return (new_state, new_seen, cache), record

    (state, seen, gen_cache), records = jax.lax.scan(
        body, (state, seen, gen_cache), None, length=chunk)
    return state, seen, gen_cache, records


def _beam_search_ondevice(params, embeds, mask, *, llama_cfg: LlamaConfig,
                          gen: GenerationConfig, chunk: int = 16) -> List[int]:
    k = gen.num_beams
    proto = _BeamProto.from_gen(gen)
    logits, prefix = _prefill(params, embeds, mask, llama_cfg, embeds.shape[1])
    gen_cache = init_kv_cache(llama_cfg, k, gen.max_new_tokens)

    # first transition runs through the same jitted step, fed with the
    # prefill top-2k; beams 1..k-1 start at -1e9 so row-0 candidates win
    # (mirrors the host loop's first-step initialization)
    lg = np.array(logits, np.float32)
    logp0 = lg - np.log(np.exp(lg - lg.max(-1, keepdims=True)
                               ).sum(-1, keepdims=True)) - lg.max(-1, keepdims=True)
    order = np.argsort(-logp0[0])[: 2 * k]
    init_scores = np.full((k,), -1e9, np.float32)
    init_scores[0] = 0.0
    top_v = np.repeat(logp0[0][order][None], k, axis=0)
    top_i = np.repeat(order[None], k, axis=0)
    state0 = _BeamState(
        scores=jnp.asarray(init_scores),
        last_token=jnp.zeros((k,), jnp.int32),
        reorder=jnp.arange(k, dtype=jnp.int32),
        step=jnp.zeros((), jnp.int32),
        fin_count=jnp.zeros((), jnp.int32),
        pool_score=jnp.full((k,), -jnp.inf, jnp.float32),
        pool_step=jnp.zeros((k,), jnp.int32),
        pool_parent=jnp.zeros((k,), jnp.int32),
        pool_token=jnp.zeros((k,), jnp.int32),
        no_survivors=jnp.zeros((), bool),
    )
    state, rec0 = _beam_first_step(
        state0, jnp.asarray(top_v), jnp.asarray(top_i, jnp.int32), proto, k)
    seen = jnp.zeros((k, llama_cfg.vocab_size), bool).at[
        jnp.arange(k), state.last_token].set(True)

    parents = [np.asarray(rec0["parent"])]
    tokens = [np.asarray(rec0["token"])]
    emitted = 1
    while (emitted < gen.max_new_tokens
           and int(state.fin_count) < k and not bool(state.no_survivors)):
        n = min(chunk, gen.max_new_tokens - emitted)
        state, seen, gen_cache, records = _beam_chunk_device(
            params, state, seen, prefix, gen_cache, llama_cfg, proto, k, n)
        alive = np.asarray(records["alive"])
        rp, rt = np.asarray(records["parent"]), np.asarray(records["token"])
        for i in range(n):
            if not alive[i]:
                break
            parents.append(rp[i])
            tokens.append(rt[i])
            emitted += 1
    if bool(state.no_survivors) and parents:
        # the step that produced zero survivors emitted a degenerate record
        # (the host loop discards that step's beams entirely)
        parents.pop()
        tokens.pop()

    def reconstruct(step: int, parent: int, token: int) -> List[int]:
        """Walk backpointers: sequence of length step+1 ending in token."""
        seq = [int(token)]
        b = int(parent)
        for t in range(step - 1, -1, -1):
            seq.append(int(tokens[t][b]))
            b = int(parents[t][b])
        return seq[::-1]

    best, best_seq = -np.inf, None
    pool_score = np.asarray(state.pool_score)
    for i in range(k):
        if np.isfinite(pool_score[i]) and pool_score[i] > best:
            best = float(pool_score[i])
            best_seq = reconstruct(int(state.pool_step[i]),
                                   int(state.pool_parent[i]),
                                   int(state.pool_token[i]))
    if best_seq is None:
        # nothing finished: normalized live beams compete (host fallback)
        n_emit = len(tokens)
        live = np.asarray(state.scores)
        for b in range(k):
            sc = live[b] / (max(n_emit, 1) ** gen.length_penalty)
            if sc > best:
                best = float(sc)
                best_seq = reconstruct(n_emit - 1, int(parents[-1][b]),
                                       int(tokens[-1][b]))
    return best_seq if best_seq is not None else []



@functools.partial(
    jax.jit,
    static_argnames=("cfg", "proto", "k", "chunk"),
    donate_argnums=(2, 4),
)
def _beam_chunk_device_grouped(params, state: _BeamState, seen: jax.Array,
                               prefix: KVCache,
                               gen_cache: KVCache, cfg: LlamaConfig,
                               proto: _BeamProto, k: int, chunk: int):
    """Grouped form of _beam_chunk_device: every _BeamState field carries a
    leading P (video) axis, the gen cache holds P*k rows, and the decode
    rides the grouped llama_decode_prefix (prefix KV once per video). One
    program advances P independent beam searches ``chunk`` steps — the
    batched-eval path for the beam-5 VideoQA protocol (reference:
    stllm/test/qabench/msvd_qa.py:108-115, one video at a time there)."""
    from stllm_tpu.models.llama import llama_decode_prefix

    p = state.scores.shape[0]
    step_fn = jax.vmap(lambda st, tv, ti: _beam_transition(st, tv, ti,
                                                           proto, k))
    offs = (jnp.arange(p, dtype=jnp.int32) * k)[:, None]

    def body(carry, _):
        state, seen, cache = carry
        alive = (state.fin_count < k) & ~state.no_survivors          # (P,)
        cache = _reorder_cache(cache, (state.reorder + offs).reshape(-1))
        embeds = params["embed_tokens"][
            state.last_token.reshape(-1)][:, None].astype(cfg.dtype)
        hidden, cache = llama_decode_prefix(params, embeds, prefix, cache,
                                            cfg)
        logits = lm_head(params, hidden)[:, 0]
        logp = jax.nn.log_softmax(logits, axis=-1)
        if proto.rep_penalty != 1.0:
            logp = _penalize_logp(
                logp.reshape(p, k, -1), seen, proto.rep_penalty
            ).reshape(p * k, -1)
        top_v, top_i = jax.lax.top_k(logp, 2 * k)
        new_state, record = step_fn(
            state, top_v.reshape(p, k, 2 * k),
            top_i.reshape(p, k, 2 * k).astype(jnp.int32))
        new_seen = jax.vmap(_update_seen)(seen, new_state.reorder,
                                          new_state.last_token)
        new_state = jax.tree_util.tree_map(
            lambda n, o: jnp.where(
                alive.reshape((p,) + (1,) * (n.ndim - 1)), n, o),
            new_state, state)
        new_seen = jnp.where(alive[:, None, None], new_seen, seen)
        record["alive"] = alive
        return (new_state, new_seen, cache), record

    (state, seen, gen_cache), records = jax.lax.scan(
        body, (state, seen, gen_cache), None, length=chunk)
    return state, seen, gen_cache, records


def beam_search_batched(
    params,
    prompts: List[jax.Array],   # each (1, S_i, d)
    *,
    llama_cfg: LlamaConfig,
    gen: GenerationConfig,
    chunk: int = 16,
) -> List[List[int]]:
    """Beam search over P prompts in ONE device program (P videos x k beams
    per decode step) — the batched-eval form of ``beam_search`` for the
    beam-5 VideoQA/VcgBench protocol. Per-prompt output is token-identical
    to ``beam_search`` run alone (tests/test_llama.py pins it): prompts are
    right-padded to a common bucket, each video keeps its own prefix cache
    row and beam state, and finished videos freeze (masked) until the
    slowest one ends."""
    assert beam_device_supported(gen), "batched beam is device-form only"
    k = gen.num_beams
    p = len(prompts)
    proto = _BeamProto.from_gen(gen)

    s_max = max(e.shape[1] for e in prompts)
    s_max = s_max + (-s_max) % gen.pad_to_multiple
    embeds = jnp.concatenate(
        [jnp.pad(e, ((0, 0), (0, s_max - e.shape[1]), (0, 0)))
         for e in prompts], axis=0)
    mask = jnp.asarray(np.stack(
        [np.arange(s_max) < e.shape[1] for e in prompts]).astype(np.int32))
    logits, prefix = _prefill(params, embeds, mask, llama_cfg, s_max)
    gen_cache = init_kv_cache(llama_cfg, p * k, gen.max_new_tokens)

    # first transition (host, as in the single-prompt path): per-video top-2k
    # of the prefill logits with beams 1..k-1 at -1e9
    lg = np.array(logits, np.float32)
    logp0 = lg - np.log(np.exp(lg - lg.max(-1, keepdims=True)
                               ).sum(-1, keepdims=True)) - lg.max(-1, keepdims=True)
    order = np.argsort(-logp0, axis=-1)[:, : 2 * k]            # (P, 2k)
    init_scores = np.full((p, k), -1e9, np.float32)
    init_scores[:, 0] = 0.0
    top_v = np.repeat(np.take_along_axis(logp0, order, -1)[:, None], k, 1)
    top_i = np.repeat(order[:, None], k, 1)                    # (P, k, 2k)
    state0 = _BeamState(
        scores=jnp.asarray(init_scores),
        last_token=jnp.zeros((p, k), jnp.int32),
        reorder=jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32), (p, k)),
        step=jnp.zeros((p,), jnp.int32),
        fin_count=jnp.zeros((p,), jnp.int32),
        pool_score=jnp.full((p, k), -jnp.inf, jnp.float32),
        pool_step=jnp.zeros((p, k), jnp.int32),
        pool_parent=jnp.zeros((p, k), jnp.int32),
        pool_token=jnp.zeros((p, k), jnp.int32),
        no_survivors=jnp.zeros((p,), bool),
    )
    first = jax.jit(jax.vmap(
        lambda st, tv, ti: _beam_transition(st, tv, ti, proto, k)))
    state, rec0 = first(state0, jnp.asarray(top_v),
                        jnp.asarray(top_i, jnp.int32))
    seen = jnp.zeros((p, k, llama_cfg.vocab_size), bool).at[
        jnp.arange(p)[:, None], jnp.arange(k)[None, :],
        state.last_token].set(True)

    parents = [np.asarray(rec0["parent"])]          # each (P, k)
    tokens = [np.asarray(rec0["token"])]
    alive_hist = [np.ones((p,), bool)]
    emitted = 1
    while emitted < gen.max_new_tokens:
        fin = np.asarray(state.fin_count)
        nosurv = np.asarray(state.no_survivors)
        if not ((fin < k) & ~nosurv).any():
            break
        n = min(chunk, gen.max_new_tokens - emitted)
        state, seen, gen_cache, records = _beam_chunk_device_grouped(
            params, state, seen, prefix, gen_cache, llama_cfg, proto, k, n)
        ra = np.asarray(records["alive"])           # (n, P)
        rp, rt = np.asarray(records["parent"]), np.asarray(records["token"])
        for i in range(n):
            parents.append(rp[i])
            tokens.append(rt[i])
            alive_hist.append(ra[i])
        emitted += n

    pool_score = np.asarray(state.pool_score)
    pool_step = np.asarray(state.pool_step)
    pool_parent = np.asarray(state.pool_parent)
    pool_token = np.asarray(state.pool_token)
    live_scores = np.asarray(state.scores)
    nosurv = np.asarray(state.no_survivors)
    alive_mat = np.stack(alive_hist)                # (T, P)

    results: List[List[int]] = []
    for v in range(p):
        def reconstruct(step: int, parent: int, token: int) -> List[int]:
            seq = [int(token)]
            b = int(parent)
            for t in range(step - 1, -1, -1):
                seq.append(int(tokens[t][v][b]))
                b = int(parents[t][v][b])
            return seq[::-1]

        best, best_seq = -np.inf, None
        for i in range(k):
            if np.isfinite(pool_score[v, i]) and pool_score[v, i] > best:
                best = float(pool_score[v, i])
                best_seq = reconstruct(int(pool_step[v, i]),
                                       int(pool_parent[v, i]),
                                       int(pool_token[v, i]))
        if best_seq is None:
            # nothing finished: normalized live beams compete. n_emit counts
            # this video's executed steps, discarding a zero-survivor step's
            # degenerate record (the single-prompt path pops it).
            n_emit = int(alive_mat[:, v].sum()) - (1 if nosurv[v] else 0)
            if n_emit > 0:
                t_last = n_emit - 1
                for b in range(k):
                    sc = live_scores[v, b] / (max(n_emit, 1)
                                              ** gen.length_penalty)
                    if sc > best:
                        best = float(sc)
                        best_seq = reconstruct(
                            t_last, int(parents[t_last][v][b]),
                            int(tokens[t_last][v][b]))
        results.append(best_seq if best_seq is not None else [])
    return results


def beam_search(
    params,
    inputs_embeds: jax.Array,   # (1, S, d)
    attention_mask: Optional[jax.Array],
    *,
    llama_cfg: LlamaConfig,
    gen: GenerationConfig,
) -> List[int]:
    """HF-style length-penalized beam search for a single prompt.

    The prompt is prefilled ONCE at batch 1; decode attends over the shared
    prompt prefix + a small per-beam generated cache (llama_decode_prefix),
    so memory is prompt + beams*max_new instead of beams*(prompt+max_new).

    Dispatches to the on-device chunked loop (one device call per 16 beam
    steps) whenever the config is device-supported; the step-wise host loop
    remains the fallback and the exactness oracle (tests/test_llama.py pins
    both against HF generate)."""
    k = gen.num_beams
    s = inputs_embeds.shape[1]
    if attention_mask is None:
        attention_mask = jnp.ones((1, s), jnp.int32)
    embeds, mask = _pad_prompt(inputs_embeds, attention_mask, gen.pad_to_multiple)
    if beam_device_supported(gen):
        return _beam_search_ondevice(params, embeds, mask,
                                     llama_cfg=llama_cfg, gen=gen)
    logits, prefix = _prefill(params, embeds, mask, llama_cfg, embeds.shape[1])
    gen_cache = init_kv_cache(llama_cfg, k, gen.max_new_tokens)

    beams: List[Tuple[float, List[int]]] = [(0.0, [])] + [(-1e9, [])] * (k - 1)
    finished: List[Tuple[float, List[int]]] = []
    pen = gen.repetition_penalty

    # first step: candidates from the prefill logits (one full transfer);
    # every later step transfers only (k, 2k) device-side top-k results
    lg = np.array(logits, np.float32)
    logp0 = lg - np.log(np.exp(lg - lg.max(-1, keepdims=True)).sum(-1, keepdims=True)) - lg.max(-1, keepdims=True)
    order = np.argsort(-logp0, axis=-1)[:, : 2 * k]
    top_v = np.repeat(np.take_along_axis(logp0, order, axis=-1), k, axis=0)
    top_i = np.repeat(order, k, axis=0)

    for step in range(gen.max_new_tokens):
        cand = []
        for bi, (score, ids) in enumerate(beams):
            for v, t in zip(top_v[bi], top_i[bi]):
                if step < gen.min_length and int(t) == gen.eos_token_id:
                    continue
                cand.append((score + float(v), ids + [int(t)], bi))
        cand.sort(key=lambda c: -c[0])

        new_beams, reorder, next_tokens = [], [], []
        for score, ids, bi in cand:
            stopped = (
                ids[-1] == gen.eos_token_id
                or any(_ends_with(ids, st) for st in gen.stop_sequences)
            )
            if stopped:
                finished.append((score / (len(ids) ** gen.length_penalty), ids))
            else:
                new_beams.append((score, ids))
                reorder.append(bi)
                next_tokens.append(ids[-1])
            if len(new_beams) == k:
                break
        if len(finished) >= k or not new_beams or step + 1 == gen.max_new_tokens:
            beams = new_beams or beams
            break
        while len(new_beams) < k:  # degenerate: pad with copies
            new_beams.append(new_beams[-1])
            reorder.append(reorder[-1])
            next_tokens.append(next_tokens[-1])
        beams = new_beams
        if pen != 1.0:
            # penalized form needs the full logprobs (the penalty demotes
            # per-beam seen tokens, reshuffling the top-2k); host applies
            # HF's beam-mode rule (_penalize_logp) on each beam's ids
            lp, gen_cache = _decode_step_logp_prefix(
                params, jnp.asarray(next_tokens, jnp.int32), prefix,
                gen_cache, jnp.asarray(reorder, jnp.int32), llama_cfg)
            lp = np.array(lp, np.float32)  # copy: device buffer is read-only
            for bi, (_, ids) in enumerate(beams):
                for t in set(ids):
                    v = lp[bi, t]
                    lp[bi, t] = v * pen if v < 0 else v / pen
            order2 = np.argsort(-lp, axis=-1)[:, : 2 * k]
            top_v = np.take_along_axis(lp, order2, axis=-1)
            top_i = order2
        else:
            tv, ti, gen_cache = _decode_step_topk_prefix(
                params, jnp.asarray(next_tokens, jnp.int32), prefix,
                gen_cache, jnp.asarray(reorder, jnp.int32), llama_cfg, 2 * k
            )
            top_v, top_i = np.asarray(tv), np.asarray(ti)

    if not finished:
        finished = [(score / (max(len(ids), 1) ** gen.length_penalty), ids)
                    for score, ids in beams]
    finished.sort(key=lambda c: -c[0])
    return finished[0][1]
