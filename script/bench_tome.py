"""Encode throughput at token-merging levels (full-size ViT-g + Q-Former,
64-frame video, one chip) on the headline static-int8 stack.

Usage: python script/bench_tome.py [iters]
Prints one JSON line per level and writes BENCH_TOME.json.
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

from stllm_tpu.models.stllm import STLLMConfig, encode_img, init_stllm
from stllm_tpu.models.vit import (
    EVA_VIT_G, calibrate_vit_scales, quantize_vit_params)

from stllm_tpu.ops.tome import MERGE_LEVELS

FRAMES = 64
# Named schedules live in ops/tome.py:MERGE_LEVELS (single source across
# all bench/equivalence scripts). Spatial levels: merge_schedule
# ((block, tokens_after), ...). Temporal levels: cross-frame folds that
# halve the frame rows (tokens/frame-equivalent is the honest FLOP knob,
# e.g. t_medium: 257 -> 144 -> 80) plus a post-trunk re-merge so the
# Q-Former cross-attends over ~the same token count as the spatial levels.
LEVELS = {k: v["merge_schedule"] for k, v in MERGE_LEVELS.items()
          if "temporal_schedule" not in v and k != "off"}
LEVELS = {"off": (), **LEVELS}
T_LEVELS = {k: (v["temporal_schedule"], v["merge_schedule"])
            for k, v in MERGE_LEVELS.items() if "temporal_schedule" in v}


def measure(cfg, params, frames, q_ids, q_mask, iters):
    @jax.jit
    def encode(params, frames):
        return encode_img(params, frames, cfg, q_ids, q_mask)

    encode(params, frames).block_until_ready()
    encode(params, frames).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = encode(params, frames)
    out.block_until_ready()
    return FRAMES * iters / (time.perf_counter() - t0)


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    only = sys.argv[2] if len(sys.argv) > 2 else ""   # substring filter
    cfg = STLLMConfig(vit=dataclasses.replace(EVA_VIT_G, gelu_approx=True))
    params = init_stllm(jax.random.PRNGKey(0), cfg, init_llama_params=False)
    params.pop("llama")

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.normal(size=(1, FRAMES, cfg.vit.image_size, cfg.vit.image_size, 3)),
        jnp.bfloat16)
    q_ids = jnp.asarray(rng.integers(0, cfg.qformer.vocab_size, (1, 16)),
                        jnp.int32)
    q_mask = jnp.ones((1, 16), jnp.int32)

    params["vit"] = quantize_vit_params(params["vit"], free_dense=True)
    params["vit"] = calibrate_vit_scales(
        params["vit"], frames.reshape(FRAMES, cfg.vit.image_size,
                                      cfg.vit.image_size, 3)[:16], cfg.vit)

    out = {}
    for name, sched in LEVELS.items():
        if only and only not in name:
            continue
        c = dataclasses.replace(
            cfg, vit=dataclasses.replace(cfg.vit, merge_schedule=sched))
        fps = measure(c, params, frames, q_ids, q_mask, iters)
        out[name] = round(fps, 1)
        print(json.dumps({"level": name, "schedule": list(sched),
                          "frames_per_s": round(fps, 1)}), flush=True)
    for name, (tsched, msched) in T_LEVELS.items():
        if only and only not in name:
            continue
        c = dataclasses.replace(
            cfg, vit=dataclasses.replace(cfg.vit, temporal_schedule=tsched,
                                         merge_schedule=msched))
        fps = measure(c, params, frames, q_ids, q_mask, iters)
        out[name] = round(fps, 1)
        print(json.dumps({"level": name, "temporal": list(tsched),
                          "post_trunk": list(msched),
                          "frames_per_s": round(fps, 1)}), flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_TOME.json")
    old = {}
    if os.path.exists(path):         # merge-preserving (filtered runs)
        try:
            with open(path) as f:
                old = json.load(f)
        except ValueError:
            old = {}
    old.update({"metric": "static-int8 encode fr/s at token-merge levels",
                "frames": FRAMES, **out})
    with open(path, "w") as f:
        json.dump(old, f, indent=1)


if __name__ == "__main__":
    main()
