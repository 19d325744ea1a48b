"""BTAdapter encoder benchmark — the PARITY-config encoder.

The reference's 54.9-MVBench QA config selects the BTAdapter ViT
(reference: config/instructblipbase_stllm_qa.yaml:3 ->
stllm/models/eva_btadapter.py:46-255), so this number is the honest
headline companion to bench.py's plain-ViT figure. 64 frames as 4 videos x
16 frames (the QA protocol's clip shape).

Ladder (measured, v5e-1):
  bf16 249.5 fr/s -> int8 static trunk + dynamic branch 384.7 (round 2)
  -> fully static (round 3, calibrate_btadapter_scales: branch spatial
     blocks take the packed-qkv kernel + static LN/GELU fusions, temporal
     layers static-scale matmuls) 392.3 fr/s
  -> static-int8 qkv attention in trunk + spatial branch (round 3,
     act_scales["attn"] + fused_qkv_attention_quant_static) 398.5 fr/s.

Physics: the branch adds ~11% matmul FLOPs on top of the trunk (3 spatial
blocks at full block cost + 3 temporal layers), so the FLOP-proportional
bound vs the 432.6 plain-ViT headline is ~390 fr/s — the fully-static
branch runs AT trunk efficiency; closing further would require changing the
reference's model math.

Writes BENCH_BTADAPTER.json {"btadapter_static_fps": ...} which bench.py
folds into the headline JSON line.
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

from stllm_tpu.models.btadapter import (
    btadapter_forward, calibrate_btadapter_scales, init_btadapter)
from stllm_tpu.models.vit import EVA_VIT_G, quantize_vit_params

F, T = 64, 16


def main():
    cfg = dataclasses.replace(EVA_VIT_G, gelu_approx=True)
    params = init_btadapter(jax.random.PRNGKey(0), cfg, depth=3)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.normal(size=(F, 224, 224, 3)), jnp.bfloat16)

    params = quantize_vit_params(params, free_dense=True)
    params = calibrate_btadapter_scales(params, frames[:16], cfg, num_frames=16)

    def measure(c):
        @jax.jit
        def enc(p, fr):
            return btadapter_forward(p, fr, c, num_frames=T)

        enc(params, frames).block_until_ready()
        enc(params, frames).block_until_ready()
        t0 = time.perf_counter()
        iters = 6
        for _ in range(iters):
            out = enc(params, frames)
        out.block_until_ready()
        return F * iters / (time.perf_counter() - t0)

    fps = measure(cfg)
    result = {"btadapter_static_fps": round(fps, 1),
              "config": "64 frames as 4x16, fully-static int8 trunk+branch"}

    # token-merge levels on the parity config (trunk merged, branch taps
    # unmerged via the origin map — models/btadapter.py; schedules match
    # script/bench_tome.py's plain-ViT levels, accuracy envelope in
    # TOME_EQUIV.json)
    from stllm_tpu.ops.tome import MERGE_LEVELS, level_kwargs

    levels = {k: v["merge_schedule"] for k, v in MERGE_LEVELS.items()
              if "temporal_schedule" not in v and k != "off"}
    result["tome_fps"] = {}
    for name, sched in levels.items():
        c = dataclasses.replace(cfg, merge_schedule=sched)
        f = measure(c)
        result["tome_fps"][name] = round(f, 1)
        print(json.dumps({"level": name, "frames_per_s": round(f, 1)}),
              flush=True)
    # temporal (cross-frame) fold levels — no post-trunk re-merge here:
    # BTAdapter output is full-res per-frame by construction (the branch
    # taps unmerge through the origin map), so only the trunk-fold part of
    # script/bench_tome.py's T_LEVELS applies.
    t_levels = {k: level_kwargs(k, post_trunk=False)["temporal_schedule"]
                for k in MERGE_LEVELS if "temporal_schedule" in MERGE_LEVELS[k]}
    for name, tsched in t_levels.items():
        c = dataclasses.replace(cfg, temporal_schedule=tsched)
        f = measure(c)
        result["tome_fps"][name] = round(f, 1)
        print(json.dumps({"level": name, "frames_per_s": round(f, 1)}),
              flush=True)
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_BTADAPTER.json")
    with open(out_path, "w") as f:
        json.dump(result, f)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
