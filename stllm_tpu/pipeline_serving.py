"""Full-pipeline video-QA serving: encode interleaved with batched decode.

`serving.ContinuousBatcher` serves the DECODE half (it takes prompt
embeddings); production video QA also needs the encode half — ViT +
Q-Former + llama_proj over the request's frames — on the SAME chip. The
reference has no serving story at all: its MVBench/chat loops run one
sample end-to-end at a time (reference: stllm/test/mvbench/mv_bench.py:229-283,
stllm/conversation/conversation.py:222-247), leaving the chip idle during
every host step and the weight stream unshared across requests.

This module schedules both halves on one chip:

- A request = (frames uint8, prompt text around the video, GenerationConfig).
- Encode runs LAZILY — only when a decode slot is free for the result —
  so a burst of submissions doesn't serialize N encodes in front of the
  decode streams already in flight. One (1,T)-shaped jitted
  encode+assemble program per (T, prefix_len, suffix_len) bucket; its
  output embeddings stay on device and flow straight into the batcher's
  prefill (no host round-trip between the halves — through the axon
  tunnel a blocking pull costs ~30 ms, CLAUDE.md).
- Decode advances all active slots together through the batcher's shared
  chunk program; finished slots are refilled from the encode queue
  without stopping co-tenants.

Answers are token-identical to the offline path (encode_img ->
generation.generate) for greedy requests — pinned in
tests/test_pipeline_serving.py the same way tests/test_serving.py pins
the decode-only batcher.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from stllm_tpu.models.generation import GenerationConfig, UnsupportedRequest
from stllm_tpu.models.stllm import STLLMConfig, apply_video_input, encode_img
from stllm_tpu.serving import ContinuousBatcher


@functools.partial(jax.jit, static_argnames=("cfg",))
def _embed_suffix(params, suffix_ids, cfg: STLLMConfig):
    """Suffix-only embedding row for prefix-cache hits (no encode)."""
    return params["llama"]["embed_tokens"][suffix_ids].astype(cfg.llama.dtype)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _encode_assemble(params, frames, prefix_ids, suffix_ids, q_ids, q_mask,
                     cfg: STLLMConfig):
    """Encode one video and splice its tokens between the text embeddings.
    Module-level jit (one compile per shape bucket x cfg, shared across
    server instances); output embeddings stay on device for the batcher's
    prefill."""
    vid = encode_img(params, frames, cfg, q_ids, q_mask)
    vid = apply_video_input(params, vid, cfg)                # (1, V, D)
    table = params["llama"]["embed_tokens"]
    pre = table[prefix_ids].astype(vid.dtype)                 # (1, lp, D)
    suf = table[suffix_ids].astype(vid.dtype)                 # (1, ls, D)
    return jnp.concatenate([pre, vid, suf], axis=1)


class QARequest:
    def __init__(self, rid, frames, prefix_ids, suffix_ids, q_ids, q_mask,
                 gen: GenerationConfig, seed: int, prefix_key=None):
        self.cfg = None   # per-request encode cfg (auto merge-level)
        self.prefix_key = prefix_key
        self.rid = rid
        self.frames = frames
        self.prefix_ids = prefix_ids
        self.suffix_ids = suffix_ids
        self.q_ids = q_ids
        self.q_mask = q_mask
        self.gen = gen
        self.seed = seed


class VideoQAServer:
    """Continuous video-QA server over one model replica.

    >>> srv = VideoQAServer(params, cfg, slots=4, max_len=1024)
    >>> srv.submit("a", frames_a, prefix_ids, suffix_ids)
    >>> srv.submit("b", frames_b, prefix_ids, suffix_ids)
    >>> answers = srv.run()          # {"a": [...tokens...], "b": [...]}

    ``params`` is the full ST-LLM tree (vit / qformer / llama_proj /
    ln_vision / llama, quantized or not); ``frames`` is (1, T, H, W, 3)
    uint8 (CLIP normalization fuses into the encode graph); prefix/suffix
    are token-id rows (1, L) embedded through the LLM's embedding table
    around the video tokens, mirroring the reference prompt layout
    (stllm/test/mvbench/mv_bench.py:238-255: system + question, <video>,
    options + answer prompt).
    """

    def __init__(self, params: Dict, cfg: STLLMConfig, *, slots: int = 4,
                 max_len: int = 1024, chunk: int = 16,
                 batcher: Optional[ContinuousBatcher] = None,
                 prefix_cache_size: int = 2):
        self.params = params
        self.cfg = cfg
        self.batcher = batcher or ContinuousBatcher(
            params["llama"], cfg.llama, slots=slots, max_len=max_len,
            chunk=chunk)
        self.encode_queue: List[QARequest] = []
        # cross-request prefix sharing: requests submitted with the same
        # ``prefix_key`` (caller's video identity) reuse ONE system+video
        # prefill — later questions on the same video skip the encode AND
        # the ~600-token prefix prefill entirely (the vcgbench-consistency
        # shape: several questions per video). key -> (prefix KV (1, P),
        # P, q_ids guard, resolved encode cfg guard). ~0.37 GiB per 7B
        # bf16 entry at P≈700 (half with kv_int8) — LRU-capped.
        import collections

        self._prefix_lru = collections.OrderedDict()
        self._prefix_cache_size = prefix_cache_size

    # -- API -----------------------------------------------------------------

    def submit(self, rid, frames: jax.Array, prefix_ids, suffix_ids,
               gen: GenerationConfig = GenerationConfig(), *,
               qformer_text_ids=None, qformer_text_mask=None, seed: int = 0,
               prefix_key=None):
        """``prefix_key``: opaque identity of (video, system prompt) — same
        key => the system+video prefix KV is computed once and shared;
        internal guards (q_ids content, resolved encode cfg) force a fresh
        prefill when the Q-Former conditioning text or the auto-selected
        merge level differs, so a stale hit can never change answers."""
        assert frames.ndim == 5 and frames.shape[0] == 1, \
            "frames must be (1, T, H, W, C)"
        prefix_ids = jnp.asarray(prefix_ids, jnp.int32).reshape(1, -1)
        suffix_ids = jnp.asarray(suffix_ids, jnp.int32).reshape(1, -1)
        if qformer_text_ids is not None:
            qformer_text_ids = jnp.asarray(
                qformer_text_ids, jnp.int32).reshape(1, -1)
            if qformer_text_mask is None:
                qformer_text_mask = jnp.ones_like(qformer_text_ids)
            else:
                qformer_text_mask = jnp.asarray(
                    qformer_text_mask, jnp.int32).reshape(1, -1)
        # surface bad generation configs / over-long prompts at submit
        # time (the batcher re-checks the same formula at its own submit)
        t = frames.shape[1]
        v = self.cfg.num_video_tokens(t)
        plen = prefix_ids.shape[1] + v
        slen = suffix_ids.shape[1]
        if prefix_key is not None:
            # prefix-shared admit: the batcher pads ONLY the suffix on top
            # of the unpadded prefix length (serving.py ContinuousBatcher.
            # submit), which is up to pad_to_multiple-1 tokens larger than
            # padding the concatenation — mirror its exact formula here so
            # a request this check accepts can never be rejected mid-drain
            # inside step()/run().
            s_pad = plen + slen + (-slen) % gen.pad_to_multiple
        else:
            s = plen + slen
            s_pad = s + (-s) % gen.pad_to_multiple
        if s_pad + gen.max_new_tokens > self.batcher.max_len:
            raise UnsupportedRequest(
                f"request {rid!r}: padded prompt ({s_pad}) + budget "
                f"({gen.max_new_tokens}) exceeds server max_len "
                f"({self.batcher.max_len})")
        req = QARequest(rid, frames, prefix_ids, suffix_ids,
                        qformer_text_ids, qformer_text_mask, gen, seed,
                        prefix_key=prefix_key)
        # vit.merge_level == "auto": pick the merge level from this video's
        # own redundancy now (host-side stat, frames already in hand); the
        # encode step then uses the per-request resolved config
        from stllm_tpu.models.stllm import resolve_auto_merge

        req.cfg = resolve_auto_merge(self.cfg, frames)
        self.encode_queue.append(req)

    def _free_slots(self) -> int:
        b = self.batcher
        idle = sum(r is None for r in b.active)
        return max(0, idle - len(b.queue))

    def _prefix_guard(self, req):
        """Hashable content guard for a prefix-cache hit: the Q-Former
        conditioning text and the resolved encode config both shape the
        video embedding, so either changing must miss."""
        qb = (None if req.q_ids is None
              else bytes(np.asarray(req.q_ids).tobytes()))
        mb = (None if req.q_mask is None
              else bytes(np.asarray(req.q_mask).tobytes()))
        return (qb, mb, req.cfg or self.cfg)

    def _admit_one(self, req):
        key = req.prefix_key
        if key is not None and key in self._prefix_lru:
            pkv, plen, guard = self._prefix_lru[key]
            if guard == self._prefix_guard(req):
                self._prefix_lru.move_to_end(key)
                suf = _embed_suffix(self.params, req.suffix_ids,
                                    cfg=self.cfg)
                self.batcher.submit(req.rid, suf, req.gen, seed=req.seed,
                                    prefix=pkv, prefix_len=plen)
                return
        embeds = _encode_assemble(self.params, req.frames,
                                  req.prefix_ids, req.suffix_ids,
                                  req.q_ids, req.q_mask,
                                  cfg=req.cfg or self.cfg)
        if key is None:
            self.batcher.submit(req.rid, embeds, req.gen, seed=req.seed)
            return
        # first request of a key: prefill the system+video prefix ONCE and
        # store it; this request then rides the same shared path later
        # questions use (identical program shapes => identical numerics
        # across all same-key answers)
        from stllm_tpu.models.generation import _pad_prompt, _prefill

        plen = embeds.shape[1] - req.suffix_ids.shape[1]
        pemb, pmask = _pad_prompt(embeds[:, :plen],
                                  jnp.ones((1, plen), jnp.int32),
                                  req.gen.pad_to_multiple)
        _, pkv = _prefill(self.params["llama"], pemb, pmask,
                          self.cfg.llama, pemb.shape[1])
        self._prefix_lru[key] = (pkv, plen, self._prefix_guard(req))
        while len(self._prefix_lru) > self._prefix_cache_size:
            # NO explicit leaf.delete(): a queued batcher Request may still
            # hold this pkv as its `prefix` (several _admit_one calls can
            # run before batcher.step() admits them), and deleting live
            # buffers crashes the drain. Dropping the dict reference frees
            # the device memory as soon as the last in-flight request is
            # admitted (its _pad_prefix_kv makes a copy).
            self._prefix_lru.popitem(last=False)
        self.batcher.submit(req.rid, embeds[:, plen:], req.gen,
                            seed=req.seed, prefix=pkv, prefix_len=plen)

    def step(self) -> List:
        """Encode as many queued videos as there are free decode slots,
        hand their embeddings to the batcher, advance one decode chunk.
        Returns requests finished this step."""
        n = min(self._free_slots(), len(self.encode_queue))
        for _ in range(n):
            self._admit_one(self.encode_queue.pop(0))
        return self.batcher.step()

    def run(self) -> Dict[object, List[int]]:
        """Drain the encode queue and all decode slots; rid -> tokens."""
        out: Dict[object, List[int]] = {}
        b = self.batcher
        while (self.encode_queue or b.queue or b._finished
               or any(r is not None for r in b.active)):
            for req in self.step():
                out[req.rid] = req.tokens
        return out
