"""7B speculative-decode bench: worst case (random draft, acceptance ~0)
and full-acceptance case (draft == target) on one v5e chip, plus the
tokens/s-vs-acceptance model from the measured components.

The speedup from a REAL (distilled) draft lands between the two measured
endpoints; without released weights the acceptance rate cannot be measured
here, so this records the mechanics' cost structure honestly:

  t_round(k) = (k+1) * t_draft_step + t_verify(k+1)
  ms/token   = t_round / (E[accepted]+1),  E = a(1-a^k)/(1-a) for accept a

Run: python script/bench_spec_decode.py [k]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from stllm_tpu.models.generation import GenerationConfig
from stllm_tpu.models.llama import (
    VICUNA_7B, init_llama, quantize_llama_params_int4)
from stllm_tpu.models.speculative import speculative_generate

PREFIX, NEW = 512, 64
DRAFT_CFG = dataclasses.replace(VICUNA_7B, num_layers=2)


def run(tgt, dft, dft_cfg, k, label):
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(1, PREFIX, VICUNA_7B.hidden)) * 0.02,
                      jnp.bfloat16)
    gen = GenerationConfig(max_new_tokens=NEW, stop_sequences=(),
                           eos_token_id=-1, pad_to_multiple=64)
    out, stats = speculative_generate(
        tgt, dft, emb, tgt_cfg=VICUNA_7B, dft_cfg=dft_cfg, gen=gen, k=k,
        return_stats=True)  # compile + warm
    assert len(out[0]) == NEW
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        out, stats = speculative_generate(
            tgt, dft, emb, tgt_cfg=VICUNA_7B, dft_cfg=dft_cfg, gen=gen, k=k,
            return_stats=True)
    ms_tok = (time.perf_counter() - t0) * 1e3 / (iters * NEW)
    print(f"{label:34s} {ms_tok:7.2f} ms/token  "
          f"(mean accepted {stats['mean_accepted']:.2f}/{k}, "
          f"{stats['rounds']} rounds)", flush=True)
    return ms_tok, stats


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    tgt = init_llama(jax.random.PRNGKey(0), VICUNA_7B)
    tgt = quantize_llama_params_int4(tgt, group=None, free_dense=True,
                                     quant_head=True, fuse=True)

    # full acceptance: the draft IS the target (same tree — no extra HBM);
    # every round emits k+1 tokens for ~2x one model's traffic
    best_ms, best_stats = run(tgt, tgt, VICUNA_7B, k, "draft=target (accept=1.0)")

    dft = init_llama(jax.random.PRNGKey(1), DRAFT_CFG)
    dft = quantize_llama_params_int4(dft, group=None, free_dense=True,
                                     quant_head=True, fuse=True)
    worst_ms, worst_stats = run(tgt, dft, DRAFT_CFG, k,
                                "random 2-layer draft (accept~0)")

    # decompose: worst ~= t_round (1 token/round); with the 2-layer draft,
    # t_round = (k+1) t_d + t_verify. The draft=target run gives
    # t_round' = (k+1)(t_T + ...) per k+1 tokens. Model the real-draft
    # curve from worst-case t_round at measured acceptance a.
    t_round = worst_ms * (worst_stats["tokens_per_round"])
    curve = {}
    for a in (0.5, 0.7, 0.8, 0.9):
        e = a * (1 - a ** k) / (1 - a)
        curve[str(a)] = round(t_round / (e + 1.0), 2)
    result = {
        "metric": "7B W4A16 speculative greedy decode (512-tok prefill, "
                  "64 new)",
        "k": k,
        "draft": "2-layer Vicuna-width tower, W4A16",
        "worst_case_ms_per_token": round(worst_ms, 2),
        "round_cost_ms": round(t_round, 2),
        "projected_ms_per_token_at_acceptance": curve,
        "full_acceptance_ms_per_token_draft_eq_target": round(best_ms, 2),
        "plain_greedy_baseline_ms": 8.46,
    }
    print(json.dumps(result))
    # merge-update: keep sections other runs own (e.g. trained_demo from
    # script/bench_spec_trained.py)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_SPEC.json")
    doc = json.load(open(path)) if os.path.exists(path) else {}
    doc.update(result)
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
