"""Multi-turn chat latency: full re-prefill vs PrefixSession KV reuse.

Every chat turn in the reference re-prefills the whole conversation through
HF generate (reference: stllm/conversation/conversation.py:222-243): system
text + ~600 video-embedding tokens + all previous turns. PrefixSession
(models/generation.py) keeps the conversation's KV across turns and prefills
only the delta (previous answer + new question, ~48 tokens), so turn-N
latency stops growing with history length.

Protocol: video-chat shape on 7B W4A16 (fused, int8 head — the production
serving stack): turn 1 prompt = 608 tokens (system + video + question), each
later turn appends a 32-token answer + 16-token question; 4 turns, greedy,
32 new tokens/turn. Both arms run the conversation once to compile, then a
timed second conversation. Writes BENCH_PREFIX.json.

    python script/bench_prefix.py            (one v5e chip)
"""

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

TURNS = 4
PROMPT0 = 608          # system + 576 video tokens + first question
ANSWER = 32
QUESTION = 16
MAX_LEN = 2048


def conversation_embs(params, rng):
    """Per-turn (embs, items) with the multi-turn chat structure. Text
    tokens are random ids embedded through the real table; the video block
    is a fixed random embedding slab (identity-matched across turns, as a
    held upload is)."""
    video = jnp.asarray(rng.normal(size=(1, 576, VICUNA_7B.hidden)) * 0.02,
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
    for t in range(1, TURNS):
        ans = list(rng.integers(10, 30000, ANSWER))
        q = list(rng.integers(10, 30000, QUESTION))
        embs = jnp.concatenate([embs, embed(ans), embed(q)], axis=1)
        items = items + [("t", int(i)) for i in ans] + [("t", int(i)) for i in q]
        turns.append((embs, items))
    return turns


def run_full(params, turns, gen):
    ms = []
    for embs, _ in turns:
        t0 = time.perf_counter()
        out = generate(params, embs, llama_cfg=VICUNA_7B, gen=gen)
        assert len(out[0]) == ANSWER
        ms.append((time.perf_counter() - t0) * 1e3)
    return ms


def run_session(params, turns, gen):
    sess = PrefixSession(params, VICUNA_7B, max_len=MAX_LEN)
    ms, reused = [], []
    for embs, items in turns:
        t0 = time.perf_counter()
        out = sess.generate(embs, items, gen)
        assert len(out) == ANSWER
        ms.append((time.perf_counter() - t0) * 1e3)
        reused.append(sess.last_reused)
    sess.release()
    return ms, reused


def main():
    params = init_llama(jax.random.PRNGKey(0), VICUNA_7B)
    params = quantize_llama_params_int4(params, group=None, free_dense=True,
                                        quant_head=True, fuse=True)
    gen = GenerationConfig(max_new_tokens=ANSWER, stop_sequences=(),
                           eos_token_id=-1, pad_to_multiple=64)
    rng = np.random.default_rng(0)
    turns = conversation_embs(params, rng)

    print("compile pass ...", flush=True)
    run_full(params, turns, gen)
    full = run_full(params, turns, gen)
    print(f"full re-prefill  per-turn ms: {[round(m, 1) for m in full]}",
          flush=True)
    run_session(params, turns, gen)
    sess_ms, reused = run_session(params, turns, gen)
    print(f"prefix session   per-turn ms: {[round(m, 1) for m in sess_ms]}"
          f"  reused: {reused}", flush=True)

    later_full = sum(full[1:]) / (TURNS - 1)
    later_sess = sum(sess_ms[1:]) / (TURNS - 1)
    doc = {
        "protocol": f"{TURNS}-turn video chat on 7B W4A16 fused + int8 head: "
                    f"turn-1 prompt {PROMPT0} tokens (576 video), each turn "
                    f"+{ANSWER}-token answer +{QUESTION}-token question, "
                    f"{ANSWER} greedy tokens/turn, one v5e chip",
        "turn_ms_full_reprefill": [round(m, 1) for m in full],
        "turn_ms_prefix_session": [round(m, 1) for m in sess_ms],
        "tokens_reused_per_turn": reused,
        "turn2plus_avg_ms_full": round(later_full, 1),
        "turn2plus_avg_ms_session": round(later_sess, 1),
        "turn2plus_speedup": round(later_full / later_sess, 2),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_PREFIX.json")
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
