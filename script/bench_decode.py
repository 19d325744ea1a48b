"""7B greedy-decode latency: bf16 / int8 (W8A8) / int4 (W4A16) weights.

Decode is weight-bandwidth-bound (DESIGN.md): per token every decoder-layer
weight is read once, so ms/token tracks weight bytes. v5e floors at 819 GB/s:
bf16 ~16.4 ms, int8 ~8.5 ms, int4 ~4.3 ms (layer matmuls only). Round-2
production: int8 13.8 ms/token. This script measures the real path —
models.generation chunked greedy (16 tokens/device call) over the layer-major
KV cache after a 512-token prefill.

    python script/bench_decode.py int8 int4        # variants to run

Matches/beats: HF KV-cache decode loop driving the reference's answer
generation (reference: stllm/conversation/conversation.py:231-243).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from stllm_tpu.models.generation import GenerationConfig, generate
from stllm_tpu.models.llama import (
    VICUNA_7B, init_llama, quantize_llama_params, quantize_llama_params_int4)

PREFIX = 512
NEW = 64
KV8 = dataclasses.replace(VICUNA_7B, kv_int8=True)


def measure(params, label, iters=3, cfg=VICUNA_7B, batch=1):
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(batch, PREFIX, cfg.hidden)) * 0.02,
                      jnp.bfloat16)
    gen = GenerationConfig(max_new_tokens=NEW, stop_sequences=(),
                           eos_token_id=-1, pad_to_multiple=64)
    out = generate(params, emb, llama_cfg=cfg, gen=gen)  # compile+warm
    assert len(out) == batch and len(out[0]) == NEW
    t0 = time.perf_counter()
    for _ in range(iters):
        generate(params, emb, llama_cfg=cfg, gen=gen)
    dt = (time.perf_counter() - t0) / iters
    ms_tok = dt * 1e3 / NEW  # per decode STEP (all streams advance together)
    tput = batch * NEW / dt
    print(f"{label:34s} {ms_tok:7.2f} ms/step  {tput:7.0f} tok/s "
          f"(B={batch}, prefill+decode avg over {NEW} steps)", flush=True)
    return ms_tok


CONVERT = {
    "bf16": lambda p: p,
    # free_dense=True everywhere: 16 GB cannot hold dense+quantized 7B
    "int8": lambda p: quantize_llama_params(p, free_dense=True),
    "int4": lambda p: quantize_llama_params_int4(p, group=128,
                                                 free_dense=True),
    "int4pc": lambda p: quantize_llama_params_int4(p, group=None,
                                                   free_dense=True),
    "int4h8": lambda p: quantize_llama_params_int4(p, group=None,
                                                   free_dense=True,
                                                   quant_head=True),
    "int4kv8": lambda p: quantize_llama_params_int4(p, group=None,
                                                    free_dense=True,
                                                    quant_head=True),
    "int4f": lambda p: quantize_llama_params_int4(p, group=None,
                                                  free_dense=True,
                                                  quant_head=True,
                                                  fuse=True),
    # per-group scale A/B (VERDICT r4 #4): tighter quantization than
    # per-channel, at the cost of the Pallas epilogue scale fold and the
    # K-prepad lever (per-group scales cannot be K-padded, ops/quant.py)
    "int4g64": lambda p: quantize_llama_params_int4(p, group=64,
                                                    free_dense=True),
    "int4fg128": lambda p: quantize_llama_params_int4(p, group=128,
                                                      free_dense=True,
                                                      quant_head=True,
                                                      fuse=True),
}
CFG = {"int4kv8": KV8}
LABEL = {"bf16": "bf16 dense", "int8": "int8 W8A8",
         "int4": "int4 W4A16 (group=128)", "int4pc": "int4 W4A16 (per-chan)",
         "int4h8": "int4 W4A16 + int8 lm_head",
         "int4kv8": "int4 W4A16 + int8 head + int8 KV",
         "int4f": "int4 W4A16 fused qkv/gateup + int8 head",
         "int4g64": "int4 W4A16 (group=64)",
         "int4fg128": "int4 W4A16 fused + int8 head (group=128)"}


def main():
    # default to the two production paths; "int4" (group=128 scales) takes
    # the hoisted-XLA dequant fallback (the Pallas kernel folds scales into
    # its epilogue, which per-group K-varying scales cannot do)
    args = sys.argv[1:]
    batch = 1
    for a in list(args):  # `--batch 8` or `--batch=8`
        if a == "--batch":
            i = args.index(a)
            batch = int(args[i + 1])
            del args[i:i + 2]
        elif a.startswith("--batch="):
            batch = int(a.split("=", 1)[1])
            args.remove(a)
    variants = args or ["int8", "int4f"]
    results = {}
    for v in variants:
        # fresh init per variant: in-place free_dense conversion consumes
        # the dense tree
        params = init_llama(jax.random.PRNGKey(0), VICUNA_7B)
        params = CONVERT[v](params)
        results[v] = measure(params, LABEL[v], cfg=CFG.get(v, VICUNA_7B),
                             batch=batch)
        del params
    print(results)
    # sidecar for bench.py: the production decode number rides along the
    # round bench JSON without costing the driver a 7B compile.
    # Merge-preserving: long_ctx / scale-granularity sections written by
    # other invocations must survive.
    import json
    side = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_DECODE.json")
    doc = json.load(open(side)) if os.path.exists(side) else {}
    if batch == 1:
        if "int4f" in results:
            doc["decode_w4a16_ms_per_token"] = round(results["int4f"], 2)
            doc["protocol"] = ("512-token prefill + 64-token greedy, "
                               "fused W4A16 + int8 head, one v5e chip")
        if "int8" in results:
            doc["int8_ms_per_token"] = round(results["int8"], 2)
        grp = {v: round(results[v], 2) for v in
               ("int4pc", "int4", "int4g64", "int4f", "int4fg128")
               if v in results}
        if any(v in grp for v in ("int4", "int4g64", "int4fg128")):
            doc["w4a16_scale_granularity_ms_per_token"] = {
                "variants": {LABEL[v]: ms for v, ms in grp.items()},
                "note": "per-group (g=128/64) scales take the hoisted-XLA "
                        "dequant fallback: K-varying scales cannot fold "
                        "into the Pallas epilogue or K-prepad (ops/quant.py)",
            }
        with open(side, "w") as f:
            json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
