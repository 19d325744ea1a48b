"""Speculative decoding THROUGH the continuous batcher, measured.

Two measurements merged into BENCH_SERVING.json as "speculative":

1. TRAINED mid-scale pair (the bench_spec_trained.py recipe: 4-layer
   4096-wide target trained to emit fixed answers, 1-layer distilled
   draft): drain the same request stream through the plain greedy server
   and the spec-mode server (serving.py draft_params) and compare sustained
   tok/s with REAL acceptance. The 1/4 draft-depth ratio is far worse than
   production's ~1/16 (a 2-layer draft on 32-layer 7B), so the speedup is a
   conservative floor for the mechanism at 7B.

2. 7B W4A16 overhead floor: the spec server with an UNTRAINED 2-layer
   draft (acceptance ~0 on random weights — every round pays a full draft
   propose + verify and emits 1 token) vs the plain server — the worst-case
   regression a badly-matched draft costs at production scale.

No weights on disk -> a real-acceptance 7B number is not measurable here
(PARITY.md); floor (2) x ratio (1) brackets it.

Run: python script/bench_spec_serving.py [train_steps] [distill_steps]
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
import optax

from script.bench_spec_trained import (
    ANSWER, CFG_D, CFG_T, N_PROMPTS, _train_step, build_data)
from stllm_tpu.models.distill import distill_draft
from stllm_tpu.models.generation import GenerationConfig
from stllm_tpu.models.llama import init_llama
from stllm_tpu.serving import ContinuousBatcher


def drain_tok_s(make_cb, reqs, iters=3):
    def once():
        cb = make_cb()
        for rid, emb, g, in reqs:
            cb.submit(rid, emb, g)
        t0 = time.perf_counter()
        out = cb.run()
        dt = time.perf_counter() - t0
        total = sum(len(v) for v in out.values())
        return out, total / dt

    base_out, _ = once()  # compile warmup
    best = 0.0
    for _ in range(iters):
        out, rate = once()
        assert out == base_out
        best = max(best, rate)
    return base_out, best


def trained_pair(train_steps, distill_steps):
    rng = np.random.default_rng(0)
    prompts, answers = build_data(rng)
    tgt = init_llama(jax.random.PRNGKey(0), CFG_T)
    opt = optax.adamw(3e-4)
    opt_state = opt.init(tgt)
    for it in range(train_steps):
        tgt, opt_state, loss = _train_step(tgt, opt_state, prompts, answers,
                                           opt)
        if (it + 1) % 100 == 0:
            print(f"target step {it+1}: loss {float(loss):.4f}", flush=True)
    del opt_state
    dft = init_llama(jax.random.PRNGKey(1), CFG_D)
    dft = distill_draft(
        tgt, dft,
        lambda i: (prompts[i % N_PROMPTS][None], answers[i % N_PROMPTS][None]),
        tgt_cfg=CFG_T, dft_cfg=CFG_D, steps=distill_steps,
        learning_rate=1e-3, log_every=100)
    return tgt, dft, prompts


def main():
    train_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    distill_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 300

    # ---- (1) trained mid-scale: plain vs spec server, real acceptance ----
    tgt, dft, prompts = trained_pair(train_steps, distill_steps)
    gen = GenerationConfig(max_new_tokens=ANSWER, eos_token_id=-1,
                           stop_sequences=(), pad_to_multiple=16)
    reqs = [(i, prompts[i % N_PROMPTS][None], gen) for i in range(16)]

    plain_out, plain = drain_tok_s(
        lambda: ContinuousBatcher(tgt, CFG_T, slots=4, max_len=128, chunk=8),
        reqs)
    spec_out, spec = drain_tok_s(
        lambda: ContinuousBatcher(tgt, CFG_T, slots=4, max_len=128,
                                  draft_params=dft, draft_cfg=CFG_D,
                                  spec_k=6, spec_rounds=3),
        reqs)
    assert spec_out == plain_out, "spec server diverged from plain greedy"
    trained = {
        "target": "4-layer 4096-wide trained LLaMA, 1-layer distilled draft "
                  "(depth ratio 1/4 — conservative vs production ~1/16)",
        "slots": 4, "n_requests": 16, "spec_k": 6, "spec_rounds": 3,
        "plain_tokens_per_s": round(plain, 1),
        "spec_tokens_per_s": round(spec, 1),
        "speedup": round(spec / plain, 2),
        "outputs_token_identical": True,
    }
    print(json.dumps(trained), flush=True)
    del tgt, dft

    # ---- (2) 7B W4A16 overhead floor: untrained draft, acceptance ~0 -----
    from stllm_tpu.models.llama import VICUNA_7B, quantize_llama_params_int4

    params = init_llama(jax.random.PRNGKey(0), VICUNA_7B)
    params = quantize_llama_params_int4(params, group=None, free_dense=True,
                                        quant_head=True, fuse=True)
    dft7_cfg = dataclasses.replace(VICUNA_7B, num_layers=2)
    dft7 = init_llama(jax.random.PRNGKey(9), dft7_cfg)
    dft7 = quantize_llama_params_int4(dft7, group=None, free_dense=True,
                                      quant_head=True, fuse=True)
    rng = np.random.default_rng(0)
    PROMPT, NEW = 512, 64
    gen7 = GenerationConfig(max_new_tokens=NEW, eos_token_id=-1,
                            stop_sequences=(), pad_to_multiple=64)
    reqs7 = [(i, jnp.asarray(rng.normal(size=(1, PROMPT, VICUNA_7B.hidden))
                             * 0.02, jnp.bfloat16), gen7) for i in range(16)]
    plain7_out, plain7 = drain_tok_s(
        lambda: ContinuousBatcher(params, VICUNA_7B, slots=8,
                                  max_len=PROMPT + NEW + 16, chunk=16),
        reqs7, iters=2)
    spec7_out, spec7 = drain_tok_s(
        lambda: ContinuousBatcher(params, VICUNA_7B, slots=8,
                                  max_len=PROMPT + NEW + 16,
                                  draft_params=dft7, draft_cfg=dft7_cfg,
                                  spec_k=4, spec_rounds=4),
        reqs7, iters=2)
    # On RANDOM bf16 7B weights exact equality is not the right check: the
    # verify step computes target logits through a different program shape
    # ((B, k+1)-token forward) than the plain 1-token chunk, and bf16
    # reduction-order jitter between the two compiled tilings flips argmax
    # at sub-margin ties (random-weight top-2 margins are tiny everywhere).
    # script/probe_spec_divergence.py pins it: first divergent token is the
    # rank-1 runner-up at a 0.036 bf16 top-2 margin — the same flip class
    # EQUIV_INT8.json quantifies. The algorithmic token-identity contract is
    # enforced where margins are real: the trained mid-scale assert above
    # and tests/test_serving.py's spec-mode suite.
    exact = sum(int(spec7_out[i] == plain7_out[i]) for i in plain7_out)
    first_div = [next((j for j, (a, b) in
                       enumerate(zip(plain7_out[i], spec7_out[i])) if a != b),
                      len(plain7_out[i])) for i in plain7_out]
    floor = {
        "stack": "7B fused W4A16, 2-layer untrained draft (acceptance ~0: "
                 "worst-case spec overhead at production scale)",
        "slots": 8, "n_requests": 16, "spec_k": 4, "spec_rounds": 4,
        "plain_tokens_per_s": round(plain7, 1),
        "spec_zero_acceptance_tokens_per_s": round(spec7, 1),
        "exact_match_streams": f"{exact}/16",
        "mean_first_divergence_token": round(float(np.mean(first_div)), 1),
        "divergence_class": "bf16 sub-margin argmax ties across program "
                            "shapes on random weights "
                            "(script/probe_spec_divergence.py: rank-1 token "
                            "at 0.036 top-2 margin); trained-weight outputs "
                            "are token-identical (section above + "
                            "tests/test_serving.py)",
    }
    print(json.dumps(floor), flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_SERVING.json")
    doc = json.load(open(path)) if os.path.exists(path) else {}
    doc["speculative"] = {"trained_midscale": trained,
                          "overhead_floor_7b": floor}
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
