"""Multi-turn chat latency: full re-prefill vs PrefixSession KV reuse.

Every chat turn in the reference re-prefills the whole conversation through
HF generate (reference: stllm/conversation/conversation.py:222-243): system
text + ~600 video-embedding tokens + all previous turns. PrefixSession
(models/generation.py) keeps the conversation's KV across turns and prefills
only the delta (previous answer + new question), so turn-N latency stops
growing with history length.

Round-5 protocol (VERDICT #5): three arms on 7B W4A16 (fused, int8 head —
the production serving stack), each turn-1 prompt = 608 tokens (system +
576 video tokens + question), greedy:
  chat_608 — 4 turns, +48 tokens/turn, 32 new/turn (the round-4 arm)
  long_2k  — 12 turns, +128 tokens/turn (96-token answers), history ~2k
  long_4k  — 14 turns, +256 tokens/turn (192-token answers), history ~3.9k
             (max_positions lifted to 4352 for the synthetic long arm)
The long arms are where reuse must pay: full re-prefill cost grows with
history (BENCH_DECODE.json long_ctx shows 3x prefill cost at 2k), while the
session's delta prefill stays flat. Sessions size their KV buffer to the
current history bucket (generation._grow_cache), so turn 1 now runs at
solo-prefill attention cost — the round-4 turn-1 regression arm is reported
explicitly. Both arms run the conversation once to compile, then a timed
second conversation. Writes BENCH_PREFIX.json.

    python script/bench_prefix.py [arms...]       (one v5e chip)
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from stllm_tpu.models.generation import (
    GenerationConfig, PrefixSession, generate)
from stllm_tpu.models.llama import (
    VICUNA_7B, init_llama, quantize_llama_params_int4)

PROMPT0 = 608          # system + 576 video tokens + first question

ARMS = {
    #        turns, answer, question, max_len, max_positions
    "chat_608": (4, 32, 16, 2048, 2048),
    "long_2k": (12, 96, 32, 2304, 2304),
    "long_4k": (14, 192, 64, 4352, 4352),
}


def conversation_embs(params, rng, turns_n, answer, question, cfg):
    """Per-turn (embs, items) with the multi-turn chat structure. Text
    tokens are random ids embedded through the real table; the video block
    is a fixed random embedding slab (identity-matched across turns, as a
    held upload is)."""
    video = jnp.asarray(rng.normal(size=(1, 576, cfg.hidden)) * 0.02,
                        jnp.bfloat16)
    vref = PrefixSession._Ref(video)
    pre = list(rng.integers(10, 30000, 16))
    q0 = list(rng.integers(10, 30000, 16))
    table = params["embed_tokens"]

    def embed(ids):
        return table[jnp.asarray([ids], jnp.int32)].astype(jnp.bfloat16)

    embs = jnp.concatenate([embed(pre), video, embed(q0)], axis=1)
    items = ([("t", int(t)) for t in pre]
             + [("v", vref, j) for j in range(576)]
             + [("t", int(t)) for t in q0])
    assert embs.shape[1] == PROMPT0
    turns = [(embs, items)]
    for t in range(1, turns_n):
        ans = list(rng.integers(10, 30000, answer))
        q = list(rng.integers(10, 30000, question))
        embs = jnp.concatenate([embs, embed(ans), embed(q)], axis=1)
        items = items + [("t", int(i)) for i in ans] + [("t", int(i))
                                                        for i in q]
        turns.append((embs, items))
    return turns


def run_full(params, turns, gen, cfg, answer):
    ms = []
    for embs, _ in turns:
        t0 = time.perf_counter()
        out = generate(params, embs, llama_cfg=cfg, gen=gen)
        assert len(out[0]) == answer
        ms.append((time.perf_counter() - t0) * 1e3)
    return ms


def run_session(params, turns, gen, cfg, answer, max_len):
    sess = PrefixSession(params, cfg, max_len=max_len)
    ms, reused = [], []
    for embs, items in turns:
        t0 = time.perf_counter()
        out = sess.generate(embs, items, gen)
        assert len(out) == answer
        ms.append((time.perf_counter() - t0) * 1e3)
        reused.append(sess.last_reused)
    sess.release()
    return ms, reused


def run_arm(params, name):
    turns_n, answer, question, max_len, max_pos = ARMS[name]
    cfg = dataclasses.replace(VICUNA_7B, max_positions=max_pos)
    gen = GenerationConfig(max_new_tokens=answer, stop_sequences=(),
                           eos_token_id=-1, pad_to_multiple=64)
    rng = np.random.default_rng(0)
    turns = conversation_embs(params, rng, turns_n, answer, question, cfg)

    print(f"[{name}] compile pass ...", flush=True)
    run_full(params, turns, gen, cfg, answer)
    full = run_full(params, turns, gen, cfg, answer)
    print(f"[{name}] full re-prefill  per-turn ms: "
          f"{[round(m, 1) for m in full]}", flush=True)
    run_session(params, turns, gen, cfg, answer, max_len)
    sess_ms, reused = run_session(params, turns, gen, cfg, answer, max_len)
    print(f"[{name}] prefix session   per-turn ms: "
          f"{[round(m, 1) for m in sess_ms]}  reused: {reused}", flush=True)

    # TTFT (time-to-first-token) arms: whole-turn latency is decode-bound
    # (answer tokens cost the same either way); what prefix reuse actually
    # removes is the history re-prefill, which IS the TTFT. max_new=1
    # replays the same conversations measuring prefill+1 token.
    gen1 = dataclasses.replace(gen, max_new_tokens=1)
    run_full(params, turns, gen1, cfg, 1)
    ttft_full = run_full(params, turns, gen1, cfg, 1)
    run_session(params, turns, gen1, cfg, 1, max_len)
    ttft_sess, _ = run_session(params, turns, gen1, cfg, 1, max_len)
    print(f"[{name}] TTFT full {([round(m,1) for m in ttft_full])} "
          f"session {([round(m,1) for m in ttft_sess])}", flush=True)

    later_full = sum(full[1:]) / (turns_n - 1)
    later_sess = sum(sess_ms[1:]) / (turns_n - 1)
    history = PROMPT0 + (turns_n - 1) * (answer + question)
    return {
        "protocol": f"{turns_n}-turn video chat: turn-1 prompt {PROMPT0} "
                    f"tokens (576 video), each turn +{answer}-token answer "
                    f"+{question}-token question, {answer} greedy "
                    f"tokens/turn, final history {history} tokens",
        "turn_ms_full_reprefill": [round(m, 1) for m in full],
        "turn_ms_prefix_session": [round(m, 1) for m in sess_ms],
        "tokens_reused_per_turn": reused,
        "turn1_ratio_session_over_full": round(sess_ms[0] / full[0], 3),
        "turn2plus_avg_ms_full": round(later_full, 1),
        "turn2plus_avg_ms_session": round(later_sess, 1),
        "turn2plus_speedup": round(later_full / later_sess, 2),
        "last_turn_speedup": round(full[-1] / sess_ms[-1], 2),
        "ttft_ms_full": [round(m, 1) for m in ttft_full],
        "ttft_ms_session": [round(m, 1) for m in ttft_sess],
        "ttft_turn2plus_speedup": round(
            sum(ttft_full[1:]) / max(sum(ttft_sess[1:]), 1e-9), 2),
        "ttft_last_turn_speedup": round(ttft_full[-1] / ttft_sess[-1], 2),
        "note": "whole-turn speedup is bounded by decode (answer tokens "
                "cost the same either way); TTFT is what prefix reuse "
                "removes",
    }


def main():
    arms = sys.argv[1:] or list(ARMS)
    params = init_llama(jax.random.PRNGKey(0), VICUNA_7B)
    params = quantize_llama_params_int4(params, group=None, free_dense=True,
                                        quant_head=True, fuse=True)
    doc = {
        "stack": "7B W4A16 fused + int8 head, one v5e chip",
        "arms": {},
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_PREFIX.json")
    if os.path.exists(path):
        try:
            old = json.load(open(path))
            doc["arms"] = old.get("arms", {})
        except ValueError:
            pass
    for name in arms:
        doc["arms"][name] = run_arm(params, name)
        with open(path, "w") as f:
            json.dump(doc, f, indent=1)
        print(json.dumps({name: doc["arms"][name]}), flush=True)
    print(json.dumps({"written": path}))


if __name__ == "__main__":
    main()
