"""Continuous-batching greedy server: slot-based multi-stream decode.

The reference serves one request at a time through HF `generate`
(reference: stllm/conversation/conversation.py:231-243). On TPU, decode is
weight-HBM-bound (DESIGN.md), so a single stream leaves the chip ~90% idle
at the memory system level: every step reads all 3.3 GB of W4A16 weights to
advance one token. Batching B streams shares each weight read — measured
399 tok/s at B=8 vs 118 at B=1 (script/bench_decode.py --batch) — but an
offline fixed batch forces all requests to start and stop together.

This module adds the serving-side half: a slot-based continuous batcher.
The KV cache is one static-shape (B, max_len, H, D) buffer set per layer
with PER-ROW valid lengths (models/llama.py KVCache.length — the decode
layer already writes at each row's own offset and masks attention by
absolute position, so rows at different progress coexist in one program).
Requests are admitted into free slots as they arrive: a (1, S) prefill
program fills the row, the shared decode-chunk program advances all slots
together, and finished slots are refilled without stopping the others. Two
compiled programs total (plus one prefill/insert pair per prompt-length
bucket) serve an arbitrary request stream.

Greedy requests match the MVBench/VideoQA protocols (do_sample=False) and
are token-identical to `generation.generate` run alone: tests/test_serving.py
checks answer-for-answer equality. Sampled requests (do_sample=True, the
reference chat demo's default — stllm/conversation/conversation.py:231-243)
run EXACT nucleus sampling on device, vectorized per row, so greedy and
sampled streams share one decode program. Each sampled stream draws from
`fold_in(PRNGKey(seed), token_index)`, making its tokens reproducible and
independent of slot placement, co-tenants, and chunk size — a sampled
request returns the same answer in a busy mixed server as in an idle one.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from stllm_tpu.models.generation import (
    GenerationConfig, UnsupportedRequest, _decode_chunk_greedy,
    _decode_chunk_mixed, _ends_with, _first_token_sampled, _pad_kv_time,
    _pad_prompt, _prefill)
from stllm_tpu.models.llama import KVCache, LlamaConfig, init_kv_cache


@functools.partial(jax.jit, static_argnames=("w",))
def _pad_prefix_kv(prefix: KVCache, w: int) -> KVCache:
    """Zero-pad a stored (1, P, ...) prefix cache to time width ``w`` so a
    suffix delta-prefill can continue it. NOT donating: the stored prefix
    is reused by every later request that shares it (the donating variant
    is generation._grow_cache; both share generation._pad_kv_time)."""
    return _pad_kv_time(prefix, w)


@functools.partial(jax.jit, donate_argnums=(0,))
def _insert_slot(cache: KVCache, prefix: KVCache, slot: jax.Array
                 ) -> KVCache:
    """Copy a (1, S, H, D)-per-layer prefill cache into row ``slot`` of the
    batched cache and set that row's length. Stale tail entries beyond the
    new length are overwritten by decode writes before they ever become
    attendable (write-at-length precedes attend-up-to-length each step)."""
    def put(c, p):
        return jax.lax.dynamic_update_slice(
            c, p.astype(c.dtype), (slot, 0, 0, 0))

    new_k = tuple(put(c, p) for c, p in zip(cache.k, prefix.k))
    new_v = tuple(put(c, p) for c, p in zip(cache.v, prefix.v))
    length = cache.length.at[slot].set(prefix.length[0])
    ks = vs = None
    if cache.k_scale is not None:
        ks = tuple(jax.lax.dynamic_update_slice(c, p, (slot, 0, 0))
                   for c, p in zip(cache.k_scale, prefix.k_scale))
        vs = tuple(jax.lax.dynamic_update_slice(c, p, (slot, 0, 0))
                   for c, p in zip(cache.v_scale, prefix.v_scale))
    return KVCache(k=new_k, v=new_v, length=length, k_scale=ks, v_scale=vs)


class Request:
    def __init__(self, rid, inputs_embeds: jax.Array,
                 gen: GenerationConfig, seed: int = 0,
                 prefix: Optional[KVCache] = None, prefix_len: int = 0):
        assert inputs_embeds.ndim == 3 and inputs_embeds.shape[0] == 1
        self.rid = rid
        self.embeds = inputs_embeds
        self.gen = gen
        self.seed = seed
        self.prefix = prefix          # shared prompt-prefix KV (1, P, ...)
        self.prefix_len = prefix_len  # host-known valid length of `prefix`
        self.tokens: List[int] = []
        self.done = False


class ContinuousBatcher:
    """Slot-based greedy server over one model replica.

    >>> cb = ContinuousBatcher(params, cfg, slots=8, max_len=1024)
    >>> cb.submit("a", embeds_a, gen); cb.submit("b", embeds_b, gen)
    >>> answers = cb.run()   # {"a": [...tokens...], "b": [...]}
    New requests may be submitted between `step()` calls while others are
    mid-decode; `run()` drains the queue.
    """

    def __init__(self, params: Dict, cfg: LlamaConfig, *, slots: int = 8,
                 max_len: int = 1024, chunk: int = 8,
                 draft_params: Optional[Dict] = None,
                 draft_cfg: Optional[LlamaConfig] = None,
                 spec_k: int = 4, spec_rounds: int = 4):
        self.params = params
        self.cfg = cfg
        self.slots = slots
        self.max_len = max_len
        self.chunk = chunk
        # Speculative serving mode (models/speculative.py _spec_rounds):
        # with a distilled draft tower, each step runs ``spec_rounds``
        # draft-propose/target-verify rounds — every slot emits 1..spec_k+1
        # tokens per round, token-identical to plain greedy by the greedy-
        # acceptance rule. Spec mode serves GREEDY streams only (sampled
        # requests are rejected at submit; the spec-sampling residual scheme
        # is out of scope, and a sampled co-tenant would force the plain
        # path anyway).
        self.draft_params = draft_params
        self.draft_cfg = draft_cfg
        self.spec_k = spec_k
        self.spec_rounds = spec_rounds
        self.spec = draft_params is not None
        if self.spec:
            assert draft_cfg is not None
            assert draft_cfg.hidden == cfg.hidden, "draft shares embed space"
            # + (spec_k+1) slack: a verify round writes k+1 entries past the
            # committed length before rolling back
            self.draft_cache = init_kv_cache(draft_cfg, slots,
                                             max_len + spec_k + 1)
            max_len = max_len + spec_k + 1
        self.cache = init_kv_cache(cfg, slots, max_len)
        self.cur = jnp.zeros((slots,), jnp.int32)
        self.active: List[Optional[Request]] = [None] * slots
        self.queue: List[Request] = []
        self._finished: List[Request] = []
        # observability: blocking host pulls this batcher has issued (one
        # per admit first-token + one per decode chunk). Each pull costs a
        # full device round trip (~30 ms through the axon tunnel), which is
        # the serving wall-clock's main noise source — benches use this to
        # report tunnel-RT-corrected throughput (script/bench_serving.py).
        self.host_pulls = 0
        # per-slot sampling state (inert for greedy rows); keys live on
        # DEVICE — they are produced there (PRNGKey inside jit) and only
        # ever consumed there, so a host pull would be a wasted round trip
        self.keys = jnp.zeros((slots, 2), jnp.uint32)
        self.counters = np.zeros((slots,), np.int32)
        self.temp = np.ones((slots,), np.float32)
        self.topp = np.ones((slots,), np.float32)
        self.samp = np.zeros((slots,), bool)

    def submit(self, rid, inputs_embeds: jax.Array,
               gen: GenerationConfig = GenerationConfig(), *,
               seed: int = 0, prefix: Optional[KVCache] = None,
               prefix_len: int = 0):
        """``prefix``: a shared prompt-prefix KV cache (1, P, ...) with
        host-known valid length ``prefix_len`` — ``inputs_embeds`` is then
        ONLY the per-request suffix, delta-prefilled on top of a copy of
        the prefix at admit (vLLM-style cross-request prefix sharing:
        VideoQAServer reuses one video+system prefill across every question
        on the same video). The stored prefix is never donated."""
        if (gen.num_beams > 1 or gen.repetition_penalty != 1.0
                or gen.min_length > 1):
            raise UnsupportedRequest(
                f"request {rid!r}: the continuous batcher serves greedy and "
                "top-p-sampled streams; beam/penalty/min_length requests "
                "must go through generation.generate")
        if gen.do_sample and not 0.0 < gen.top_p <= 1.0:
            # a genuine config bug, not a capability gap: plain ValueError
            # so fallback-to-solo callers do NOT swallow it
            raise ValueError(
                f"request {rid!r}: top_p must be in (0, 1], got {gen.top_p}")
        if gen.do_sample and self.spec:
            raise UnsupportedRequest(
                f"request {rid!r}: this server runs speculative greedy "
                "decoding (spec-only mode); submit sampled requests to a "
                "non-draft server or generation.generate")
        if prefix is not None and self.spec:
            raise UnsupportedRequest(
                f"request {rid!r}: prefix sharing is not composed with "
                "speculative mode (the draft tower has no shared prefix)")
        s = inputs_embeds.shape[1]
        s_pad = prefix_len + s + (-s) % gen.pad_to_multiple
        if s_pad + gen.max_new_tokens > self.max_len:
            # reject per request instead of crashing the server mid-drain
            raise UnsupportedRequest(
                f"request {rid!r}: padded prompt ({s_pad}) + budget "
                f"({gen.max_new_tokens}) exceeds server max_len "
                f"({self.max_len})")
        self.queue.append(Request(rid, inputs_embeds, gen, seed,
                                  prefix, prefix_len))

    # -- internals --------------------------------------------------------

    def _admit(self):
        for slot in range(self.slots):
            if self.active[slot] is not None or not self.queue:
                continue
            req = self.queue.pop(0)
            emb, mask = _pad_prompt(
                req.embeds, jnp.ones(req.embeds.shape[:2], jnp.int32),
                req.gen.pad_to_multiple)
            s_pad = emb.shape[1]
            if req.prefix is not None:
                # shared-prefix admit: copy-pad the stored prefix KV to the
                # needed width, delta-prefill ONLY this request's suffix on
                # top (same attention sums as a from-scratch prefill of the
                # concatenated prompt — _prefill_delta's invariant)
                from stllm_tpu.models.generation import _prefill_delta

                w = max(req.prefix.k[0].shape[1],
                        req.prefix_len + s_pad)
                base = _pad_prefix_kv(req.prefix, w=w)
                logits, prefix = _prefill_delta(self.params, emb, mask,
                                                base, self.cfg)
                # Drop the request's handle on the shared prefix KV NOW:
                # the slot cache holds the delta-prefilled copy, and an
                # LRU-evicted prefix (~0.37 GiB at 7B bf16) must not stay
                # pinned on device for this request's whole decode just
                # because `req` sits in `active`/`_finished`.
                req.prefix = None
            else:
                # per-bucket (1, s_pad) prefill program; insert is
                # bucket-keyed too (prefix buffers are (1, s_pad, H, D))
                logits, prefix = _prefill(self.params, emb, mask, self.cfg,
                                          s_pad)
            self.cache = _insert_slot(self.cache, prefix,
                                      jnp.int32(slot))
            if self.spec:
                _, dprefix = _prefill(self.draft_params, emb, mask,
                                      self.draft_cfg, s_pad)
                self.draft_cache = _insert_slot(self.draft_cache, dprefix,
                                                jnp.int32(slot))
            req.embeds = None  # prompt embeddings are consumed; free them
            g = req.gen
            self.samp[slot] = g.do_sample
            self.temp[slot] = g.temperature
            self.topp[slot] = g.top_p
            self.counters[slot] = 1  # token 0 is sampled below
            self.host_pulls += 1
            if g.do_sample:
                tok, key = _first_token_sampled(
                    logits, jnp.int32(req.seed),
                    jnp.float32(g.temperature), jnp.float32(g.top_p))
                self.keys = self.keys.at[slot].set(key)
                first = int(np.asarray(tok)[0])
            else:
                first = int(np.asarray(jnp.argmax(logits, axis=-1))[0])
            self.cur = self.cur.at[slot].set(first)
            self.active[slot] = req
            self._emit(slot, [first])

    def _emit(self, slot: int, tokens: Sequence[int]):
        req = self.active[slot]
        for tok in tokens:
            if req.done:
                break
            req.tokens.append(tok)
            if tok == req.gen.eos_token_id or any(
                    _ends_with(req.tokens, st)
                    for st in req.gen.stop_sequences):
                req.done = True
            elif len(req.tokens) >= req.gen.max_new_tokens:
                req.done = True
        if req.done:
            self.active[slot] = None
            self._finished.append(req)
            self.samp[slot] = False  # freed rows fall back to argmax rows
            # Rewind the freed row's length. Idle rows still advance by
            # `chunk` per step until re-admitted — that is SAFE regardless
            # (dynamic_update_slice clamps writes at max_len-1 and _admit
            # resets the length), this reset just keeps the common case's
            # garbage writes inside the buffer.
            self.cache = self.cache._replace(
                length=self.cache.length.at[slot].set(0))
            if self.spec:
                self.draft_cache = self.draft_cache._replace(
                    length=self.draft_cache.length.at[slot].set(0))

    def step(self) -> List[Request]:
        """Admit queued requests, run one decode chunk, return requests
        that finished during this step (including any whose admit-time
        first token already completed them)."""
        self._admit()
        if any(r is not None for r in self.active):
            before = {s: r for s, r in enumerate(self.active)
                      if r is not None}
            if self.spec:
                from stllm_tpu.models.speculative import _spec_rounds

                (t_next, self.cache, self.draft_cache, emits,
                 cnts) = _spec_rounds(
                    self.params, self.draft_params, self.cur, self.cache,
                    self.draft_cache, tgt_cfg=self.cfg,
                    dft_cfg=self.draft_cfg, k=self.spec_k,
                    rounds=self.spec_rounds)
                self.host_pulls += 1
                emits_h, cnts_h = np.asarray(emits), np.asarray(cnts)
                self.cur = t_next
                for slot in before:
                    toks = []
                    for r in range(self.spec_rounds):
                        toks.extend(
                            int(t) for t in emits_h[r, slot, :cnts_h[r, slot]])
                    self._emit(slot, toks)
                finished, self._finished = self._finished, []
                return finished
            if self.samp.any():
                # jnp.array (copy=True), NOT jnp.asarray: the CPU backend
                # zero-copies aligned numpy buffers into jit arguments, and
                # this method mutates these arrays (counters advance, _emit
                # clears samp) while the dispatched chunk may still be
                # running asynchronously — an aliased buffer makes the
                # in-flight program read the mutated values (caught as a
                # nondeterministic sampled stream on the test backend).
                toks, self.cache = _decode_chunk_mixed(
                    self.params, self.cur, self.cache, self.cfg, self.chunk,
                    self.keys, jnp.array(self.counters),
                    jnp.array(self.temp), jnp.array(self.topp),
                    jnp.array(self.samp))
                self.counters += self.chunk
            else:
                # pure-greedy protocol traffic skips the per-step vocab sort
                toks, self.cache = _decode_chunk_greedy(
                    self.params, self.cur, self.cache, self.cfg, self.chunk)
            self.host_pulls += 1
            toks_h = np.asarray(toks)
            self.cur = toks[:, -1]
            for slot in before:
                self._emit(slot, [int(t) for t in toks_h[slot]])
        finished, self._finished = self._finished, []
        return finished

    def run(self) -> Dict[object, List[int]]:
        """Drain the queue and all active slots; returns rid -> tokens."""
        out: Dict[object, List[int]] = {}
        while (self.queue or self._finished
               or any(r is not None for r in self.active)):
            for req in self.step():
                out[req.rid] = req.tokens
        return out


class AnswerService:
    """Thread-safe blocking front-end over a ContinuousBatcher.

    Concurrent callers (e.g. web-demo request threads, one per user)
    call :meth:`answer` and block until their tokens are ready, while a
    single service thread advances ALL resident streams through the
    batcher's shared decode-chunk program — co-tenant answers share every
    weight read instead of serializing behind a chip lock. Tokens are
    identical to solo ``generation.generate`` (the batcher's contract,
    tests/test_serving.py), including sampled streams via the shared
    fold_in(PRNGKey(seed), token_index) rule.

    The batcher itself is NOT thread-safe; every touch happens under one
    condition variable, and the service thread only holds it across a
    single step() (one decode chunk), so submitters wait at most one
    chunk (~chunk × ms) to enqueue.
    """

    def __init__(self, batcher: ContinuousBatcher):
        import threading

        self.cb = batcher
        self._cond = threading.Condition()
        self._results: Dict[object, List[int]] = {}
        self._next = 0
        self._stop = False
        self._error: Optional[BaseException] = None
        self._thread = threading.Thread(
            target=self._loop, name="answer-service", daemon=True)
        self._thread.start()

    def close(self):
        with self._cond:
            self._stop = True
            self._cond.notify_all()
        self._thread.join()

    def answer(self, inputs_embeds: jax.Array,
               gen: GenerationConfig = GenerationConfig(), *,
               seed: int = 0) -> List[int]:
        """Submit one request and block until its tokens are complete.
        Raises ValueError (without blocking) for configs the batcher
        rejects — beam/penalty/min_length/overlong — so callers can fall
        back to solo generate."""
        with self._cond:
            if self._error is not None:
                raise RuntimeError(
                    "AnswerService is dead (step failed)") from self._error
            rid = self._next
            self._next += 1
            self.cb.submit(rid, inputs_embeds, gen, seed=seed)  # may raise
            self._cond.notify_all()
            while rid not in self._results:
                if self._error is not None:
                    raise RuntimeError(
                        "AnswerService died mid-request") from self._error
                self._cond.wait()
            return self._results.pop(rid)

    def _busy(self) -> bool:
        return bool(self.cb.queue) or any(
            r is not None for r in self.cb.active)

    def _loop(self):
        while True:
            with self._cond:
                while not self._stop and not self._busy():
                    self._cond.wait()
                if self._stop:
                    return
                try:
                    for req in self.cb.step():
                        self._results[req.rid] = req.tokens
                except BaseException as e:
                    # wake every waiter (they re-raise this), then exit the
                    # loop cleanly — re-raising here would only feed
                    # threading.excepthook noise, the error already reaches
                    # every current and future answer() caller
                    self._error = e
                    self._cond.notify_all()
                    return
                self._cond.notify_all()
