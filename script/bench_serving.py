"""Continuous-batching server throughput on the 7B fused-W4A16 stack.

Submits N requests (512-token prompts, 64 new tokens each) to the
slot-based server (stllm_tpu/serving.py) and measures sustained generated
tokens/s including prefill interleave and slot refill — the serving-side
counterpart of the offline fixed-batch number (script/bench_decode.py
--batch 8: 399 tok/s with all streams in lockstep).

Run: python script/bench_serving.py [n_requests] [slots]
"""

import json
import os
import sys
import time

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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    slots = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    params = init_llama(jax.random.PRNGKey(0), VICUNA_7B)
    params = quantize_llama_params_int4(params, group=None, free_dense=True,
                                        quant_head=True, fuse=True)
    rng = np.random.default_rng(0)
    gen = GenerationConfig(max_new_tokens=NEW, eos_token_id=-1,
                           stop_sequences=(), pad_to_multiple=64)

    def make_cb():
        return ContinuousBatcher(params, VICUNA_7B, slots=slots,
                                 max_len=PROMPT + NEW + 16, chunk=16)

    gen_s = GenerationConfig(max_new_tokens=NEW, eos_token_id=-1,
                             stop_sequences=(), pad_to_multiple=64,
                             do_sample=True, top_p=0.9, temperature=0.8)

    def submit_all(cb, count, sampled_frac=0.0):
        for i in range(count):
            emb = jnp.asarray(
                rng.normal(size=(1, PROMPT, VICUNA_7B.hidden)) * 0.02,
                jnp.bfloat16)
            if i < count * sampled_frac:
                cb.submit(i, emb, gen_s, seed=i)
            else:
                cb.submit(i, emb, gen)

    # compile warmup (prefill bucket + insert + decode chunk)
    cb = make_cb()
    submit_all(cb, slots)
    cb.run()

    # in-session tunnel calibration: one blocking host pull of a trivial
    # jitted program ~= the pure round-trip cost every chunk boundary pays.
    # Reported alongside raw tok/s so numbers from different tunnel
    # sessions become comparable (round-3 vs round-4 drifted 15% on the
    # same code purely from session RT).
    tick = jax.jit(lambda x: x + 1)
    z = tick(jnp.zeros((), jnp.int32))  # compile
    float(z)
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        z = tick(z)
        float(z)
    tunnel_rt_ms = (time.perf_counter() - t0) / reps * 1e3

    # best-of-3 drains: each chunk boundary costs one blocking host pull
    # (~30 ms through the axon tunnel, ~96 per drain), so single-drain
    # timings swing +-30% with tunnel latency — take the best
    def drain(sampled_frac=0.0):
        cb = make_cb()
        submit_all(cb, n, sampled_frac)
        t0 = time.perf_counter()
        out = cb.run()
        dt = time.perf_counter() - t0
        total = sum(len(v) for v in out.values())
        assert len(out) == n and total == n * NEW
        return total, dt, cb.host_pulls

    total, dt, pulls = min((drain() for _ in range(3)), key=lambda r: r[1])
    # mixed greedy+sampled traffic: half the streams run on-device nucleus
    # sampling — measures the per-step (B, vocab) sort/cumsum epilogue cost
    cb = make_cb()
    submit_all(cb, slots, sampled_frac=0.5)
    cb.run()  # compile the mixed chunk
    total_s, dt_s, _ = min((drain(0.5) for _ in range(3)),
                           key=lambda r: r[1])

    # compute-only = wall clock minus the measured per-pull tunnel RT for
    # every blocking pull the drain issued: what the same code would
    # sustain on a locally-attached chip (upper bound; overlap between
    # pulls and device work makes the true local number slightly lower)
    compute_s = max(dt - pulls * tunnel_rt_ms / 1e3, 1e-9)
    result = {
        "metric": "continuous-batching sustained decode throughput "
                  "(7B fused W4A16, 512-tok prompts, 64 new, incl. "
                  "prefill interleave + slot refill)",
        "n_requests": n,
        "slots": slots,
        "tokens_per_s": round(total / dt, 1),
        "wall_s": round(dt, 2),
        "tunnel_rt_ms": round(tunnel_rt_ms, 2),
        "host_pulls_per_drain": pulls,
        "tunnel_corrected_tokens_per_s": round(total / compute_s, 1),
        "sampled_mix_tokens_per_s": round(total_s / dt_s, 1),
        "sampled_mix": "half greedy / half on-device top-p (0.9, T=0.8)",
        "offline_batch8_tokens_per_s": 399,
    }
    print(json.dumps(result))
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_SERVING.json")
    # merge-preserving: bench_spec_serving.py owns the "speculative" section
    doc = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                doc = json.load(f)
        except ValueError:
            doc = {}
    doc.update(result)
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
