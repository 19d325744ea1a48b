"""Beam-vs-greedy decode latency on the 7B model, one chip.

QA-bench decodes with num_beams=5 (reference: stllm/test/qabench/msvd_qa.py:111-115),
so beam latency is a benchmarked path. Round 1 left beam paying a per-token
host sync (~30 ms tunnel round-trip); the on-device chunked beam loop
(models/generation.py:_beam_chunk_device, 16 steps/device call) closes that
to ~2x one greedy stream for 5 simultaneous hypotheses. This script records
the actual numbers: 512-token prompt (QA-bench scale), 32 new tokens, int8
7B (see main()), random weights (latency is weight-value independent).

Run: python script/bench_beam.py [both|greedy|beam] [int8|int4]
Prints one JSON line with greedy/beam ms-per-token and the ratio.
(int4 = the fused W4A16 serving stack; beam shares each step's weight
reads across all 5 hypotheses, so halving weight bytes cuts beam latency
nearly as much as greedy's.)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from stllm_tpu.models.generation import GenerationConfig, beam_search, generate
from stllm_tpu.models.llama import VICUNA_7B, init_llama
from stllm_tpu.models.stllm import STLLMConfig

PROMPT = 512
NEW = 32
ITERS = 5


def main():
    cfg = STLLMConfig().llama  # Vicuna-7B dims
    params = init_llama(jax.random.PRNGKey(0), cfg)
    # int8 weights for BOTH paths: the bf16 beam-chunk program's hoisted
    # weight-layout copies put the compile-time estimate ~0.5 GB over the
    # 16 GB chip (13.5 GB weights + ~2.4 GB program temps); int8 is the
    # serving stack QA-bench ships anyway, and the beam-vs-greedy RATIO is
    # what this script exists to record.
    from stllm_tpu.models.llama import (
        quantize_llama_params, quantize_llama_params_int4)

    run_mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    assert run_mode in ("both", "greedy", "beam", "batched"), (
        f"usage: bench_beam.py [both|greedy|beam|batched] [int8|int4], got "
        f"{sys.argv[1:]}")
    wmode = sys.argv[2] if len(sys.argv) > 2 else "int8"
    assert wmode in ("int8", "int4"), wmode
    if wmode == "int4":
        params = quantize_llama_params_int4(params, group=None,
                                            free_dense=True,
                                            quant_head=True, fuse=True)
    else:
        params = quantize_llama_params(params, free_dense=True)
    rng = np.random.default_rng(0)
    embeds = jnp.asarray(rng.normal(size=(1, PROMPT, cfg.hidden)) * 0.02,
                         cfg.dtype)
    mask = jnp.ones((1, PROMPT), jnp.int32)

    # no eos/stops: force the full NEW tokens every iter for stable timing
    greedy_gen = GenerationConfig(max_new_tokens=NEW, stop_sequences=(),
                                  eos_token_id=-1)
    beam_gen = GenerationConfig(max_new_tokens=NEW, stop_sequences=(),
                                eos_token_id=-1, num_beams=5,
                                length_penalty=1.0)

    def run_greedy():
        out = generate(params, embeds, attention_mask=mask,
                       llama_cfg=cfg, gen=greedy_gen)
        assert len(out[0]) == NEW
        return out

    def run_beam():
        out = beam_search(params, embeds, mask, llama_cfg=cfg, gen=beam_gen)
        assert len(out) == NEW
        return out

    def time_fn(fn):
        fn()  # compile + warmup
        fn()
        times = []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            fn()
            times.append((time.perf_counter() - t0) * 1000)
        return float(np.percentile(times, 50))

    mode = run_mode
    out = {"metric": f"7B decode ms/token ({wmode} weights, 512-token "
                     "prompt, 32 new, one chip)"}
    if mode in ("both", "greedy"):
        greedy_ms = time_fn(run_greedy)
        out["greedy_ms_per_token"] = round(greedy_ms / NEW, 2)
        out["greedy_total_ms"] = round(greedy_ms, 1)
    if mode in ("both", "beam"):
        # drop the greedy executables: their weight-layout-copy temps plus
        # the beam program's would exceed the 16 GB chip during compile
        jax.clear_caches()
        beam_ms = time_fn(run_beam)
        out["beam5_ms_per_token"] = round(beam_ms / NEW, 2)
        out["beam5_total_ms"] = round(beam_ms, 1)
    if mode == "both":
        out["beam_over_greedy"] = round(beam_ms / greedy_ms, 2)
    if mode == "batched":
        # the eval-sweep form (VideoQA/VcgBench, thousands of videos at
        # beam=5: reference protocol stllm/test/qabench/msvd_qa.py:108-115):
        # P videos x 5 beams advance in ONE device program
        # (models/generation.py:beam_search_batched; per-video tokens
        # identical to solo beam_search, pinned in tests/test_llama.py).
        from stllm_tpu.models.generation import beam_search_batched

        p_videos = 8
        prompts = [jnp.asarray(
            rng.normal(size=(1, PROMPT, cfg.hidden)) * 0.02, cfg.dtype)
            for _ in range(p_videos)]

        def run_batched():
            res = beam_search_batched(params, prompts, llama_cfg=cfg,
                                      gen=beam_gen)
            assert len(res) == p_videos and len(res[0]) == NEW
            return res

        batched_ms = time_fn(run_batched)
        solo_ms = time_fn(run_beam)
        out = {"metric": f"batched beam-5 eval throughput ({wmode} weights, "
                         f"{p_videos} videos/program, 512-token prompts, "
                         f"{NEW} new, one chip)",
               "videos": p_videos,
               "batched_total_ms": round(batched_ms, 1),
               "batched_ms_per_token_per_video": round(
                   batched_ms / NEW / p_videos, 2),
               "solo_beam_total_ms": round(solo_ms, 1),
               "speedup_vs_solo_sweep": round(solo_ms * p_videos / batched_ms, 2),
               "videos_per_hour_per_chip": round(
                   p_videos * 3600e3 / batched_ms, 0)}
        side = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_BEAM.json")
        with open(side, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
