"""Long-context 7B decode: the kv-int8 crossover + H2O-budgeted decode.

At 512-token context the KV cache stream is small next to the W4A16 weight
stream (~3.5 GB/token-step), so kv_int8 measured latency-neutral (round 3b,
BENCH_DECODE.json). The cache read grows linearly with context — bf16 KV is
512 KB/token (32 layers x 2 x 4096 x 2B), i.e. ~2.1 GB per decode step at
4096 context — so int8 KV and H2O eviction (models/h2o.py, budget-capped
cache) must win somewhere past 512. This script measures WHERE.

Protocol: decode-only ms/token = (T(new=80) - T(new=16)) / 64, each arm the
best of ``iters`` full generate() calls — differencing removes the prefill
cost and the fixed per-call tunnel round-trip that pollute a plain
prefill+decode average (CLAUDE.md: only full-model timings with a host
barrier are trustworthy here).

    python script/bench_decode_longctx.py [contexts ...] (default 512 2048 4096)

Writes a "long_ctx" section into BENCH_DECODE.json (merged, not overwritten).
Reference capability being measured: HF KV-cache decode in the reference has
no long-context levers at all (stllm/conversation/conversation.py:231-243
caps at max_new_tokens on a dense fp16 cache).
"""

import dataclasses
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from stllm_tpu.models.generation import GenerationConfig, generate
from stllm_tpu.models.llama import (
    VICUNA_7B, init_llama, quantize_llama_params_int4)

ITERS = 3
H2O_BUDGET, H2O_RECENT = 1152, 128   # 1024 heavy hitters + 128-token window


def _decode_ms(params, cfg, prefix: int, label: str) -> float:
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(1, prefix, cfg.hidden)) * 0.02,
                      jnp.bfloat16)

    def run(new: int) -> float:
        gen = GenerationConfig(max_new_tokens=new, stop_sequences=(),
                               eos_token_id=-1, pad_to_multiple=64)
        generate(params, emb, llama_cfg=cfg, gen=gen)  # compile + warm
        best = float("inf")
        for _ in range(ITERS):
            t0 = time.perf_counter()
            generate(params, emb, llama_cfg=cfg, gen=gen)
            best = min(best, time.perf_counter() - t0)
        return best

    ms = (run(80) - run(16)) * 1e3 / 64
    print(f"{label:44s} ctx={prefix:5d}  {ms:6.2f} ms/token", flush=True)
    return round(ms, 2)


def _h2o_ms(params, cfg, prefix: int) -> float:
    from stllm_tpu.models.h2o import h2o_decode_chunk_greedy, h2o_prefill

    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(1, prefix, cfg.hidden)) * 0.02,
                      jnp.bfloat16)

    prefill = jax.jit(functools.partial(h2o_prefill, cfg=cfg,
                                        budget=H2O_BUDGET, recent=H2O_RECENT))
    hidden, cache = prefill(params, emb, None)
    from stllm_tpu.models.llama import lm_head
    tok = jnp.argmax(lm_head(params, hidden[:, -1:])[:, 0], -1).astype(jnp.int32)

    chunk = jax.jit(functools.partial(h2o_decode_chunk_greedy, cfg=cfg),
                    static_argnames=("n",))

    def run(new: int) -> float:
        toks, _ = chunk(params, tok, cache, n=new)    # compile + warm
        float(np.asarray(toks).sum())
        best = float("inf")
        for _ in range(ITERS):
            t0 = time.perf_counter()
            toks, _ = chunk(params, tok, cache, n=new)
            float(np.asarray(toks).sum())             # real tunnel barrier
            best = min(best, time.perf_counter() - t0)
        return best

    ms = (run(80) - run(16)) * 1e3 / 64
    print(f"{'int4f + H2O budget=' + str(H2O_BUDGET):44s} ctx={prefix:5d}  "
          f"{ms:6.2f} ms/token", flush=True)
    return round(ms, 2)


def main():
    contexts = [int(a) for a in sys.argv[1:]] or [512, 2048, 4096]
    params = init_llama(jax.random.PRNGKey(0), VICUNA_7B)
    params = quantize_llama_params_int4(params, group=None, free_dense=True,
                                        quant_head=True, fuse=True)

    section = {"protocol": "decode-only ms/token by differencing "
                           "(new=80 minus new=16)/64, best of "
                           f"{ITERS}, 7B fused W4A16 + int8 head, one v5e",
               "contexts": {}}
    kv8 = dataclasses.replace(VICUNA_7B, kv_int8=True)
    for ctx in contexts:
        row = {"kv_bf16": _decode_ms(params, VICUNA_7B, ctx, "int4f, bf16 KV"),
               "kv_int8": _decode_ms(params, kv8, ctx, "int4f, int8 KV")}
        if ctx > H2O_BUDGET:
            row[f"h2o_budget{H2O_BUDGET}"] = _h2o_ms(params, VICUNA_7B, ctx)
        section["contexts"][str(ctx)] = row

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_DECODE.json")
    doc = {}
    if os.path.exists(path):
        with open(path) as f:
            doc = json.load(f)
    doc["long_ctx"] = section
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(section))


if __name__ == "__main__":
    main()
