"""Sustained full-pipeline video-QA serving throughput on ONE chip.

One QA = 16-frame encode (EVA-ViT-g static-int8 + Q-Former + llama_proj)
-> prompt assembly (64 prefix + 512 video + 32 suffix tokens = 608) ->
Vicuna-7B prefill -> 16-token greedy answer; the same shape as
script/bench_pipeline.py's serial protocol (reference per-sample loop:
stllm/test/mvbench/mv_bench.py:229-283). Here the QAs flow through
`pipeline_serving.VideoQAServer`: encodes admit lazily into free decode
slots, decode advances all slots per chunk, so the 7B weight stream is
shared across co-resident answers.

Decode stack: fused W4A16 + int8 lm_head (BENCH_DECODE.json). ``--tome=L``
applies the token-merging encode schedule (BENCH_TOME.json levels).

Run: python script/bench_pipeline_serving.py [--tome=t_medium] [--slots=N]
Writes BENCH_PIPELINE_SERVING.json and prints one JSON line.
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

from stllm_tpu.models.generation import GenerationConfig
from stllm_tpu.models.stllm import STLLMConfig, init_stllm
from stllm_tpu.models.vit import EVA_VIT_G
from stllm_tpu.pipeline_serving import VideoQAServer

FRAMES = 16
PREFIX, SUFFIX, ANSWER = 64, 32, 16
N_REQUESTS = 16

# named schedules: ops/tome.py:MERGE_LEVELS (single source across scripts)
from stllm_tpu.ops.tome import level_kwargs as _tome_level_kwargs


def build(tome=None):
    from stllm_tpu.models.llama import quantize_llama_params_int4
    from stllm_tpu.models.vit import calibrate_vit_scales, quantize_vit_params

    cfg = STLLMConfig(vit=dataclasses.replace(EVA_VIT_G, gelu_approx=True),
                      video_input="all")
    if tome == "auto":
        # per-request level from each video's own redundancy, resolved at
        # submit time inside VideoQAServer (stllm.resolve_auto_merge)
        cfg = dataclasses.replace(
            cfg, vit=dataclasses.replace(cfg.vit, merge_level="auto"))
    elif tome:
        cfg = dataclasses.replace(
            cfg, vit=dataclasses.replace(cfg.vit, **_tome_level_kwargs(tome)))
    params = init_stllm(jax.random.PRNGKey(0), cfg, init_llama_params=True)
    params["vit"] = quantize_vit_params(params["vit"], free_dense=True)
    params["llama"] = quantize_llama_params_int4(
        params["llama"], group=None, free_dense=True, quant_head=True,
        fuse=True)
    rng = np.random.default_rng(0)
    calib = jnp.asarray(rng.integers(
        0, 256, (16, cfg.vit.image_size, cfg.vit.image_size, 3)), jnp.uint8)
    params["vit"] = calibrate_vit_scales(params["vit"], calib, cfg.vit)
    return params, cfg


def drain(params, cfg, slots, n, chunk=8, selected=None):
    """``cfg.vit.merge_level == "auto"`` gets MIXED traffic — alternating
    smooth synthetic video (merge-friendly) and iid noise (must select
    "off") — the regime the per-request selector exists for; fixed levels
    keep the original all-noise traffic (level forced, content-independent
    speed). ``selected`` (optional dict) counts the per-request levels."""
    rng = np.random.default_rng(1)
    gen = GenerationConfig(max_new_tokens=ANSWER, stop_sequences=(),
                           eos_token_id=-1, pad_to_multiple=64)
    vocab = cfg.llama.vocab_size
    mixed = cfg.vit.merge_level == "auto"

    from stllm_tpu.data.synth import noise_video, synth_video

    # one fixed request set per drain: under "auto" the level (and thus the
    # compiled encode program) depends on the CONTENT, so warmup and the
    # timed runs must see identical videos or a timed run pays a compile
    all_frames = []
    for i in range(n):
        if mixed and i % 2 == 0:
            f = synth_video(rng, FRAMES, cfg.vit.image_size)
        elif mixed:
            f = noise_video(rng, FRAMES, cfg.vit.image_size)
        else:
            f = rng.integers(
                0, 256,
                (1, FRAMES, cfg.vit.image_size, cfg.vit.image_size, 3))
        all_frames.append(jnp.asarray(f, jnp.uint8))
        if mixed and selected is not None:
            from stllm_tpu.ops.tome import select_merge_level

            lvl = select_merge_level(np.asarray(all_frames[-1]))
            selected[lvl] = selected.get(lvl, 0) + 1

    def submit_all(srv):
        for i in range(n):
            frames = all_frames[i]
            srv.submit(i, frames,
                       jnp.asarray(rng.integers(0, vocab, (1, PREFIX))),
                       jnp.asarray(rng.integers(0, vocab, (1, SUFFIX))), gen,
                       qformer_text_ids=jnp.asarray(
                           rng.integers(0, cfg.qformer.vocab_size, (1, 16))))

    # warm: compile encode+assemble, prefill, insert, decode chunk
    srv = VideoQAServer(params, cfg, slots=slots, max_len=768, chunk=chunk)
    submit_all(srv)
    out = srv.run()
    assert len(out) == n and all(len(t) == ANSWER for t in out.values())

    best = float("inf")
    for _ in range(3):
        srv = VideoQAServer(params, cfg, slots=slots, max_len=768,
                            chunk=chunk, batcher=None)
        submit_all(srv)
        t0 = time.perf_counter()
        out = srv.run()
        best = min(best, time.perf_counter() - t0)
        assert len(out) == n
    return best


def main():
    tome = next((a.split("=", 1)[1] for a in sys.argv
                 if a.startswith("--tome=")), None)
    slots = int(next((a.split("=", 1)[1] for a in sys.argv
                      if a.startswith("--slots=")), 4))
    params, cfg = build(tome)

    selected = {}
    t_serve = drain(params, cfg, slots, N_REQUESTS, selected=selected)
    t_serial = drain(params, cfg, 1, 4) * (N_REQUESTS / 4)

    doc = {
        "metric": "sustained video-QA serving on one v5e chip "
                  "(16-frame encode + 608-tok prefill + 16-tok greedy "
                  "answer per QA, encode interleaved with batched decode)",
        "stack": "static-int8 ViT + fused W4A16 LLaMA + int8 head"
                 + (f" + tome={tome}" if tome else ""),
        "slots": slots,
        "n_requests": N_REQUESTS,
        "qa_per_s": round(N_REQUESTS / t_serve, 2),
        "serial_qa_per_s": round(1.0 / (t_serial / N_REQUESTS), 2),
        "speedup_vs_serial": round(t_serial / t_serve, 2),
        "note": "serial arm = same server at slots=1 (one QA resident at a "
                "time); each admit costs one blocking first-token pull "
                "(~30 ms axon-tunnel RT), which a local chip would not pay",
    }
    if tome == "auto":
        doc["traffic"] = ("mixed: alternating smooth synthetic video and "
                          "iid noise; level resolved per request at submit")
        doc["auto_selected"] = selected
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_PIPELINE_SERVING.json")
    merged = {}
    if os.path.exists(path):
        with open(path) as f:
            merged = json.load(f)
    key = tome or "base"
    merged[key] = doc
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
