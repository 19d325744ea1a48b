"""Probe: WHERE and WHY does 7B random-weight spec serving diverge from
plain greedy?

bench_spec_serving.py's 7B overhead-floor assert tripped: spec-mode output
!= plain greedy on random bf16 weights, while the trained mid-scale pair and
every tiny fp32 test pin exact equality. Hypothesis: the verify step
computes target logits through a DIFFERENT program shape ((B, k+1)-token
forward) than the plain 1-token decode chunk — bf16 reduction order differs
between the two compiled matmul tilings, and random-weight top-2 logit
margins are tiny, so sub-margin argmax ties flip (the same flip class
EQUIV_INT8.json quantifies for int8 vs bf16).

This script decodes ONE 7B stream both ways, finds the first divergent
position, replays the plain path to that position, and prints the bf16
top-2 margin and the rank of the spec token there. Margin ~0 and rank 1
(i.e. the spec token was the runner-up within noise) confirms the tie
class; a large margin or a deep rank would mean a real logic bug.
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from stllm_tpu.models.generation import GenerationConfig
from stllm_tpu.models.llama import (
    VICUNA_7B, init_llama, quantize_llama_params_int4)
from stllm_tpu.serving import ContinuousBatcher

PROMPT, NEW = 512, 64


def main():
    params = init_llama(jax.random.PRNGKey(0), VICUNA_7B)
    params = quantize_llama_params_int4(params, group=None, free_dense=True,
                                        quant_head=True, fuse=True)
    dcfg = dataclasses.replace(VICUNA_7B, num_layers=2)
    dft = init_llama(jax.random.PRNGKey(9), dcfg)
    dft = quantize_llama_params_int4(dft, group=None, free_dense=True,
                                     quant_head=True, fuse=True)

    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(1, PROMPT, VICUNA_7B.hidden)) * 0.02,
                      jnp.bfloat16)
    gen = GenerationConfig(max_new_tokens=NEW, eos_token_id=-1,
                           stop_sequences=(), pad_to_multiple=64)

    def drain(spec: bool):
        kw = dict(draft_params=dft, draft_cfg=dcfg, spec_k=4,
                  spec_rounds=4) if spec else {}
        cb = ContinuousBatcher(params, VICUNA_7B, slots=1,
                               max_len=PROMPT + NEW + 16, chunk=16, **kw)
        cb.submit(0, emb, gen)
        return cb.run()[0]

    plain = drain(False)
    spec = drain(True)
    div = next((i for i, (a, b) in enumerate(zip(plain, spec)) if a != b),
               None)
    print(f"plain[:16]={plain[:16]}\nspec [:16]={spec[:16]}\n"
          f"first divergence at index: {div}", flush=True)
    if div is None:
        print("no divergence — cannot reproduce")
        return

    # replay the plain path to the divergent step and inspect the logits
    from stllm_tpu.models.generation import _prefill, _decode_step

    logits, cache = _prefill(params, emb, jnp.ones((1, PROMPT), jnp.int32),
                             VICUNA_7B, PROMPT + NEW + 16)
    toks = [int(jnp.argmax(logits, -1)[0])]
    for t in plain[:div]:
        logits, cache = _decode_step(params, jnp.asarray([t], jnp.int32),
                                     cache, VICUNA_7B)
    lg = np.asarray(logits[0], np.float32)
    order = np.argsort(-lg)
    margin = float(lg[order[0]] - lg[order[1]])
    spec_rank = int(np.where(order == spec[div])[0][0])
    print(f"plain top1={order[0]} (={plain[div]}), spec tok={spec[div]} "
          f"rank={spec_rank}, top1-top2 margin={margin:.5f}, "
          f"top1-spec gap={float(lg[order[0]] - lg[spec[div]]):.5f}")


if __name__ == "__main__":
    main()
