"""Profile one production greedy-decode chunk (16 tokens) on the 7B int4pc
stack and print the top device ops by total duration.

Answers: where do the ~4.7 ms/token of NON-matmul decode time go?
(script/probe_decode_budget.py: matmul skeleton 6.6 ms/token vs production
11.3 — attention, lm_head, norms, cache scatter, or per-op overhead.)

    python script/profile_decode.py [int4pc|int8]
"""

import glob
import gzip
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
    VICUNA_7B, init_llama, quantize_llama_params, quantize_llama_params_int4)

TRACE_DIR = "/tmp/decode_trace"


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "int4f"
    params = init_llama(jax.random.PRNGKey(0), VICUNA_7B)
    if variant == "int4pc":
        params = quantize_llama_params_int4(params, group=None,
                                            free_dense=True)
    elif variant == "int4f":  # production: fused qkv/gateup + int8 head
        params = quantize_llama_params_int4(params, group=None,
                                            free_dense=True,
                                            quant_head=True, fuse=True)
    elif variant == "int8":
        params = quantize_llama_params(params, free_dense=True)

    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(1, 512, VICUNA_7B.hidden)) * 0.02,
                      jnp.bfloat16)
    gen = GenerationConfig(max_new_tokens=32, stop_sequences=(),
                           eos_token_id=-1, pad_to_multiple=64)
    generate(params, emb, llama_cfg=VICUNA_7B, gen=gen)  # compile + warm
    print("warmed; tracing one generate call", flush=True)

    jax.profiler.start_trace(TRACE_DIR)
    generate(params, emb, llama_cfg=VICUNA_7B, gen=gen)
    jax.profiler.stop_trace()

    reports = sorted(glob.glob(
        os.path.join(TRACE_DIR, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not reports:
        print("no trace.json.gz produced; files:",
              glob.glob(os.path.join(TRACE_DIR, "**", "*"), recursive=True))
        return
    with gzip.open(reports[-1], "rt") as f:
        trace = json.load(f)
    events = [e for e in trace.get("traceEvents", [])
              if e.get("ph") == "X" and "dur" in e]
    # keep device-lane events only (TensorCore pids), drop host threads
    pid_names = {}
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "Device" in n or "/device" in n.lower()}
    agg = {}
    total = 0.0
    for e in events:
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        agg[name] = agg.get(name, 0.0) + e["dur"]
        total += e["dur"]
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
    print(f"pids seen: { {p: pid_names.get(p,'?') for p in {e.get('pid') for e in events}} }")
    print(f"total device-op time: {total/1e3:.2f} ms over the traced call")
    for name, dur in top:
        print(f"{dur/1e3:9.3f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
