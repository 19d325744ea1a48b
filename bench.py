"""Headline benchmark: frames/sec/chip for the ViT+Q-Former encode path
(full-size EVA-ViT-g + InstructBLIP Q-Former + llama_proj, 64-frame
MVBench-style video on ONE chip).

Headline = the int8 serving stack with CALIBRATED static activation scales
(ops/quant.py static section, models/vit.py:calibrate_vit_scales):
quantization fuses into the producers, so no standalone activation-quant
kernels remain. Dynamic-scale int8 and bf16 reported alongside. int8
answer-equivalence evidence: script/int8_equivalence.py / EQUIV_INT8.json —
greedy-answer flips vs bf16 occur only when the bf16 top1-top2 logit margin
is < 0.32 (trained-model multiple-choice margins sit far above), and the
reference itself serves in reduced precision (fp16 ViT,
stllm/models/eva_vit.py:440-442).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"int8_dynamic_fps", "bf16_fps"}.

Baseline: the reference encodes all 64 frames of a video in one
`encode_img` call (reference: stllm/models/st_llm.py:321-377) with eager
fp16 PyTorch on A100. A100 fp16 dense peak is 312 TFLOP/s; EVA-ViT-g
(1.0B params, 257 tokens) costs ~2*1.0e9*257 = 0.52 TFLOP/frame, so at a
typical 35-40% eager-mode MFU the reference encode runs ~200 frames/s/chip.
That estimate (200.0) is the vs_baseline denominator until a measured
A100 number replaces it.
"""

import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from stllm_tpu.models.stllm import STLLMConfig, encode_img, init_stllm
from stllm_tpu.models.vit import (
    EVA_VIT_G, calibrate_vit_scales, quantize_vit_params)

REFERENCE_A100_FPS = 200.0
FRAMES = 64


def measure(cfg, params, frames, q_ids, q_mask, iters=8):
    @jax.jit
    def encode(params, frames):
        return encode_img(params, frames, cfg, q_ids, q_mask)

    encode(params, frames).block_until_ready()  # compile + warmup
    encode(params, frames).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = encode(params, frames)
    out.block_until_ready()
    return FRAMES * iters / (time.perf_counter() - t0)


def main():
    # full size: EVA-ViT-g + InstructBLIP Q-Former + Vicuna dims, with the
    # TPU-fast GELU (tanh approx) on the ViT
    cfg = STLLMConfig(vit=dataclasses.replace(EVA_VIT_G, gelu_approx=True))
    params = init_stllm(jax.random.PRNGKey(0), cfg, init_llama_params=False)
    params.pop("llama")

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.normal(size=(1, FRAMES, cfg.vit.image_size, cfg.vit.image_size, 3)),
        jnp.bfloat16,
    )
    q_ids = jnp.asarray(rng.integers(0, cfg.qformer.vocab_size, (1, 16)), jnp.int32)
    q_mask = jnp.ones((1, 16), jnp.int32)

    bf16_fps = measure(cfg, params, frames, q_ids, q_mask)

    # dynamic-scale int8 (368 fr/s) is documented in DESIGN.md; bench keeps
    # to two measurements so the driver's time budget holds
    params["vit"] = quantize_vit_params(params["vit"], free_dense=True)
    params["vit"] = calibrate_vit_scales(
        params["vit"], frames.reshape(FRAMES, cfg.vit.image_size,
                                      cfg.vit.image_size, 3)[:16], cfg.vit)
    int8_fps = measure(cfg, params, frames, q_ids, q_mask)

    line = {
        "metric": "frames/sec/chip ViT+Q-Former encode (64-frame video, "
                  "int8 W8A8 static-scale serving stack; see EQUIV_INT8.json)",
        "value": round(int8_fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(int8_fps / REFERENCE_A100_FPS, 3),
        "bf16_fps": round(bf16_fps, 2),
    }
    # the PARITY-config (BTAdapter) encoder number, measured separately by
    # script/bench_btadapter.py (a third full-model compile would overrun
    # the driver's bench time budget; the sidecar JSON records the run)
    side = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_BTADAPTER.json")
    if os.path.exists(side):
        with open(side) as f:
            line["btadapter_static_fps"] = json.load(f)["btadapter_static_fps"]
    # 7B decode sidecar (script/bench_decode.py writes it; a 7B init +
    # compile here would overrun the driver's bench budget)
    dside = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_DECODE.json")
    if os.path.exists(dside):
        with open(dside) as f:
            dd = json.load(f)
        # defended default (round 5, EQUIV_INT8.json w4a16_depth_scaling):
        # int8 W8A8 is the conservative decode default — its logit error
        # stays ~4-6x below W4A16's at every measured depth and its
        # random-weight flip bound is 0.26 vs W4A16's 1.2 logits. W4A16 is
        # the opt-in fast mode for peaked answer protocols (MVBench
        # letters), where every trained arm is exact (n=32) and margins
        # (~19 logits) dwarf the depth-extrapolated perturbation.
        line["decode_int8_default_ms_per_token"] = dd.get(
            "int8_ms_per_token")
        line["decode_w4a16_ms_per_token"] = dd["decode_w4a16_ms_per_token"]
    # token-merging encode levels (FLOP reduction past the int8 roofline;
    # ops/tome.py, accuracy envelope in TOME_EQUIV.json). mild/medium/
    # aggressive are measured by script/bench_tome.py on this chip; the
    # headline `value` stays the merge-free parity-preserving stack.
    tside = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_TOME.json")
    if os.path.exists(tside):
        with open(tside) as f:
            t = json.load(f)
        line["tome_fps"] = {k: t[k] for k in
                            ("mild", "medium", "aggressive",
                             "t_mild", "t_medium", "t_aggressive")
                            if k in t}
        if line["tome_fps"]:
            best = max(line["tome_fps"].values())
            line["tome_best_vs_baseline"] = round(best / REFERENCE_A100_FPS, 3)
        # which level the accuracy evidence actually supports: the fastest
        # level whose TRAINED-model smooth-video arm keeps every first
        # token (TOME_EQUIV.json trained_levels, deepened proxy). Faster
        # levels remain opt-in with their envelope numbers attached.
        eq = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "TOME_EQUIV.json")
        if os.path.exists(eq):
            with open(eq) as f:
                trained = json.load(f).get("trained_levels", {}).get(
                    "levels", {})
            safe = [k for k, v in trained.items()
                    if v.get("smooth_video", {}).get(
                        "first_token_match", 0) >= 1.0
                    and k in line["tome_fps"]]
            if safe:
                flag = max(safe, key=lambda k: line["tome_fps"][k])
                line["tome_accuracy_defensible_level"] = flag
                line["tome_defensible_vs_baseline"] = round(
                    line["tome_fps"][flag] / REFERENCE_A100_FPS, 3)
    # full-pipeline QA serving sidecar (script/bench_pipeline_serving.py:
    # encode interleaved with batched decode on one chip)
    pside = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_PIPELINE_SERVING.json")
    if os.path.exists(pside):
        with open(pside) as f:
            p = json.load(f)
        line["serving_qa_per_s"] = {k: v["qa_per_s"] for k, v in p.items()}
    print(json.dumps(line))


if __name__ == "__main__":
    main()
