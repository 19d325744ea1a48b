"""Full-pipeline MVBench-style QA latency on ONE chip (p50, ms).

One QA = 16-frame encode (EVA-ViT-g + Q-Former + llama_proj) -> prompt
assembly (system/question text around the 16*32 video tokens, 608 total)
-> Vicuna-7B prefill -> 16-token greedy answer. This mirrors the reference's
per-sample MVBench loop (reference: stllm/test/mvbench/mv_bench.py:229-283 —
encode_img, option prompt, do_sample=False generate), with random weights
(latency is weight-value independent).

Run: python script/bench_pipeline.py   (needs the real TPU chip; the whole
bf16 stack is ~15.9 GB so it fits a single v5e-16GB with the KV cache).
Prints one JSON line. Not the headline bench — see bench.py for that.

``--from-video``: end-to-end INCLUDING video decode — synthesizes mp4 clips,
decodes 16 uniform frames per sample (native C++ FFmpeg reader when built,
cv2 fallback) + GroupScale/CenterCrop on a background thread that feeds the
chip one sample ahead (the DevicePrefetcher overlap pattern; reference
CUDA-stream PrefetchLoader, stllm/datasets/datasets/dataloader_utils.py:84-149).
Reports decode-only rate, QA-only rate, overlapped samples/s and overlap
efficiency. NOTE this host has ONE core (CLAUDE.md) — decode rate scales
per-core on a real TPU host; the OVERLAP efficiency is the architecture
measurement.
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

from stllm_tpu.models.generation import GenerationConfig, generate
from stllm_tpu.models.stllm import STLLMConfig, encode_img, init_stllm
from stllm_tpu.models.vit import EVA_VIT_G

FRAMES = 16
PREFIX_TOKENS = 64   # system + question text before the video
SUFFIX_TOKENS = 32   # options + "Best option:(" after the video
ANSWER_TOKENS = 16
ITERS = 9


def synth_videos(tmpdir, n, frames=128, w=320, h=240):
    import cv2

    paths = []
    rng = np.random.default_rng(1)
    base = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    for i in range(n):
        path = os.path.join(tmpdir, f"clip{i}.mp4")
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25, (w, h))
        assert vw.isOpened()
        for f in range(frames):
            img = np.roll(base, f * 3 + i, axis=1)
            vw.write(img)
        vw.release()
        paths.append(path)
    return paths


def decode_sample(path, image_size=224):
    """16 uniform frames -> GroupScale+CenterCrop uint8 (1,16,224,224,3)."""
    from stllm_tpu.data.processors import center_crop, scale_short_side
    from stllm_tpu.data.video_reader import open_video

    vr = open_video(path)
    n = len(vr)
    idx = np.linspace(0, n - 1, FRAMES).round().astype(int)
    frames = vr.get_batch(idx)                              # (16, H, W, 3)
    out = center_crop(scale_short_side(frames, image_size), image_size)
    return out[None]


def run_from_video(one_qa_frames, cfg, n_samples=16):
    import queue
    import tempfile
    import threading

    with tempfile.TemporaryDirectory() as td:
        paths = [synth_videos(td, 8)[i % 8] for i in range(n_samples)]
        # warm: decode one + compile QA
        fr0 = decode_sample(paths[0])
        one_qa_frames(jnp.asarray(fr0, jnp.uint8))
        one_qa_frames(jnp.asarray(fr0, jnp.uint8))

        t0 = time.perf_counter()
        decoded = [decode_sample(p) for p in paths]
        t_decode = time.perf_counter() - t0

        t0 = time.perf_counter()
        for d in decoded:
            one_qa_frames(jnp.asarray(d, jnp.uint8))
        t_qa = time.perf_counter() - t0

        # overlapped: background decode+device_put one sample ahead
        q: "queue.Queue" = queue.Queue(maxsize=2)

        def producer():
            for p in paths:
                q.put(jax.device_put(jnp.asarray(decode_sample(p), jnp.uint8)))
            q.put(None)

        t0 = time.perf_counter()
        th = threading.Thread(target=producer, daemon=True)
        th.start()
        while True:
            item = q.get()
            if item is None:
                break
            one_qa_frames(item)
        t_overlap = time.perf_counter() - t0

    serial = t_decode + t_qa
    bound = max(t_decode, t_qa)
    eff = ((serial - t_overlap) / (serial - bound)
           if serial > bound else 1.0)
    from stllm_tpu.data.video_reader import native_available

    return {
        "n_samples": n_samples,
        "decoder": "native/videodec" if native_available() else "cv2-fallback",
        "decode_only_samples_per_s": round(n_samples / t_decode, 2),
        "qa_only_samples_per_s": round(n_samples / t_qa, 2),
        "overlapped_samples_per_s": round(n_samples / t_overlap, 2),
        "overlap_efficiency": round(min(max(eff, 0.0), 1.0), 3),
        "note": "1-core host: decode rate scales per-core on a real TPU host",
    }


def main():
    int8 = "--int8" in sys.argv  # opt-in W8A8 ViT + LLaMA + int8 KV cache
    # --int4: W8A8 static ViT + fused W4A16 LLaMA + int8 head/KV — the
    # fastest serving stack (decode is weight-bandwidth-bound; DESIGN.md)
    int4 = "--int4" in sys.argv
    int8 = int8 or int4
    from_video = "--from-video" in sys.argv
    # --tome=LEVEL: token-merging encode (ops/tome.py; accuracy envelope
    # TOME_EQUIV.json, throughput ladder BENCH_TOME.json)
    tome = next((a.split("=", 1)[1] for a in sys.argv
                 if a.startswith("--tome=")), None)
    cfg = STLLMConfig(vit=dataclasses.replace(EVA_VIT_G, gelu_approx=True))
    if tome == "auto":
        # redundancy-adaptive: encode_video_for_inference /
        # resolve_auto_merge pick the level per video from its own frames
        cfg = dataclasses.replace(
            cfg, vit=dataclasses.replace(cfg.vit, merge_level="auto"))
    elif tome:
        from stllm_tpu.ops.tome import level_kwargs

        cfg = dataclasses.replace(
            cfg, vit=dataclasses.replace(cfg.vit, **level_kwargs(tome)))
    if int8:
        cfg = dataclasses.replace(
            cfg, llama=dataclasses.replace(cfg.llama, kv_int8=True))
    params = init_stllm(jax.random.PRNGKey(0), cfg, init_llama_params=True)
    if int8:
        from stllm_tpu.models.llama import (
            quantize_llama_params, quantize_llama_params_int4)
        from stllm_tpu.models.vit import quantize_vit_params

        # free_dense: dense+quantized 7B both resident would OOM a 16GB chip
        params["vit"] = quantize_vit_params(params["vit"], free_dense=True)
        if int4:
            params["llama"] = quantize_llama_params_int4(
                params["llama"], group=None, free_dense=True,
                quant_head=True, fuse=True)
        else:
            params["llama"] = quantize_llama_params(params["llama"],
                                                    free_dense=True)

    rng = np.random.default_rng(0)
    if int8:
        # headline serving stack uses calibrated static activation scales
        from stllm_tpu.models.vit import calibrate_vit_scales

        calib = jnp.asarray(rng.integers(
            0, 256, (16, cfg.vit.image_size, cfg.vit.image_size, 3)), jnp.uint8)
        params["vit"] = calibrate_vit_scales(params["vit"], calib, cfg.vit)
    frames = jnp.asarray(
        rng.integers(0, 256, (1, FRAMES, cfg.vit.image_size, cfg.vit.image_size, 3)),
        jnp.uint8,
    )
    q_ids = jnp.asarray(rng.integers(0, cfg.qformer.vocab_size, (1, 16)), jnp.int32)
    q_mask = jnp.ones((1, 16), jnp.int32)
    d = cfg.llama.hidden
    prefix = jnp.asarray(rng.normal(size=(1, PREFIX_TOKENS, d)) * 0.02, cfg.llama.dtype)
    suffix = jnp.asarray(rng.normal(size=(1, SUFFIX_TOKENS, d)) * 0.02, cfg.llama.dtype)

    auto_level = None
    if tome == "auto":
        # production shape: selection happens per video on the HOST frames
        # at upload (resolve_auto_merge); iid noise would select "off", so
        # the auto arm benches a smooth synthetic video — the traffic the
        # selector exists to speed up
        from stllm_tpu.data.synth import synth_video
        from stllm_tpu.models.stllm import resolve_auto_merge
        from stllm_tpu.ops.tome import select_merge_level

        host_frames = synth_video(np.random.default_rng(0), FRAMES,
                                  cfg.vit.image_size)
        auto_level = select_merge_level(host_frames)
        cfg = resolve_auto_merge(cfg, host_frames)
        frames = jnp.asarray(host_frames, jnp.uint8)

    @jax.jit
    def encode(params, frames, q_ids, q_mask):
        vid = encode_img(params, frames, cfg, q_ids, q_mask)  # (1,T,32,d)
        return vid.reshape(1, -1, d)

    gen = GenerationConfig(max_new_tokens=ANSWER_TOKENS, stop_sequences=(),
                           eos_token_id=-1)

    def one_qa():
        vid = encode(params, frames, q_ids, q_mask)
        embeds = jnp.concatenate([prefix, vid, suffix], axis=1)  # (1, 608, d)
        return generate(params["llama"], embeds, llama_cfg=cfg.llama, gen=gen)

    one_qa()  # compile + warmup
    one_qa()

    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        out = one_qa()
        times.append((time.perf_counter() - t0) * 1000)
    assert len(out[0]) == ANSWER_TOKENS
    p50 = float(np.percentile(times, 50))
    line = {
        "metric": "p50 e2e latency per MVBench QA (16-frame encode + 608-token "
                  "prefill + 16-token greedy, one chip)"
                  + (" [int4 W4A16 LLM + int8 ViT]" if int4
                     else " [int8 W8A8]" if int8 else ""),
        "value": round(p50, 1),
        "unit": "ms",
        "all_ms": [round(t, 1) for t in times],
    }
    if tome:
        line["tome_level"] = tome
        if auto_level:
            line["auto_selected"] = auto_level
            line["frames"] = "smooth synthetic video (selector input)"

    if from_video:
        def one_qa_frames(fr):
            vid = encode(params, fr, q_ids, q_mask)
            embeds = jnp.concatenate([prefix, vid, suffix], axis=1)
            return generate(params["llama"], embeds, llama_cfg=cfg.llama,
                            gen=gen)

        line["from_video"] = run_from_video(one_qa_frames, cfg)
    print(json.dumps(line))

    # persist keyed by stack+tome so arms accumulate across invocations
    key = ("int4" if int4 else "int8" if int8 else "bf16") + \
        (f"+tome={tome}" if tome else "")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_PIPELINE.json")
    doc = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                doc = json.load(f)
        except ValueError:
            pass
    doc[key] = line
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
