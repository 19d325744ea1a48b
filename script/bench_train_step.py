"""Measured training step on the real chip (one v5e, 16 GB).

The reference's actually-used training path is 8-GPU DeepSpeed instruction
tuning (reference: script/train/train.sh -> stllm/train/train_hf.py). One
v5e chip cannot hold the bf16 7B training state, so this measures the
frozen-LLM instruction-tuning configuration the reference ships (trainable =
BTAdapter + llama_proj + residual + LoRA; ViT trunk / Q-Former / LLaMA
frozen, reference: st_llm.py:182-185, 257-296) with the frozen LLaMA base in
weight-only int8 (QLoRA-style, ops/quant.py:w8a16_matmul — differentiable
w.r.t. activations, so LoRA/proj gradients are exact w.r.t. the quantized
base). Teacher pass + MVM on; remat on ViT and LLaMA.

Batch: 1 sample x 16 frames, seq 768 (512 video tokens + 256 text).

    python script/bench_train_step.py [--bf16-base] [--steps N]

Reports ms/step + samples/s; OOM on --bf16-base is an expected, documented
outcome (the bf16 base needs the FSDP mesh, MEM7B_V5E8.json).
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from stllm_tpu.data.packing import pack_training_batch, sample_video_mask
from stllm_tpu.models.llama import VICUNA_7B, quantize_llama_params
from stllm_tpu.models.lora import add_lora
from stllm_tpu.models.stllm import STLLMConfig, init_stllm
from stllm_tpu.models.vit import EVA_VIT_G
from stllm_tpu.train.step import (
    create_train_state, default_trainable, make_optimizer, make_train_step)

T_FRAMES = 16
SEQ = 768


def build_batch(cfg, rng):
    b = 1
    v = cfg.num_video_tokens(T_FRAMES)
    keep = sample_video_mask(rng, b, v)
    before = [list(rng.integers(10, 30000, 40))] * b
    after = [list(rng.integers(10, 30000, 60))] * b
    answer = [list(rng.integers(10, 30000, 100))] * b
    batch = pack_training_batch(before, after, answer, num_video=v,
                                seq_len=SEQ, pad_id=0, keep=keep)
    batch = {k: jnp.asarray(val) for k, val in batch.items()}
    batch["frames"] = jnp.asarray(
        rng.normal(size=(b, T_FRAMES, 224, 224, 3)), jnp.bfloat16)
    batch["qformer_input_ids"] = jnp.asarray(
        rng.integers(0, 30000, (b, 32)), jnp.int32)
    batch["qformer_attention_mask"] = jnp.ones((b, 32), jnp.int32)
    return batch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bf16-base", action="store_true",
                    help="keep the frozen LLaMA base in bf16 (expected OOM "
                         "on one 16 GB chip)")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--lora-r", type=int, default=16)
    ap.add_argument("--layers", type=int, default=32,
                    help="LLaMA depth (bisection aid)")
    ap.add_argument("--no-mask", action="store_true",
                    help="disable the MVM teacher pass (bisection aid)")
    args = ap.parse_args()

    cfg = STLLMConfig(
        vit_model="eva_btadapter_g",
        vit=dataclasses.replace(EVA_VIT_G, gelu_approx=True, remat=True),
        llama=dataclasses.replace(VICUNA_7B, remat=True,
                                  num_layers=args.layers,
                                  max_positions=2048),
        use_mask=not args.no_mask,
    )
    print("initializing full-size params ...", flush=True)
    if args.bf16_base:
        params = init_stllm(jax.random.PRNGKey(0), cfg)
    else:
        # ORDER MATTERS on 16 GB: the bf16 7B (13.5 GB) + ViT tower together
        # OOM at init. Build + quantize the LLaMA alone first (-> ~6.9 GB),
        # then add the vision tower.
        from stllm_tpu.models.llama import init_llama

        llama = init_llama(jax.random.PRNGKey(2), cfg.llama)
        llama = quantize_llama_params(llama, free_dense=True, a16=True)
        params = init_stllm(jax.random.PRNGKey(0), cfg,
                            init_llama_params=False)
        params["llama"] = llama  # init_llama_params=False leaves None here
    params = add_lora(params, jax.random.PRNGKey(1), r=args.lora_r)

    optimizer = make_optimizer(learning_rate=1e-4)
    state = create_train_state(params, optimizer, default_trainable())
    del params
    train_step = jax.jit(make_train_step(cfg, optimizer), donate_argnums=(0,))

    rng = np.random.default_rng(0)
    batch = build_batch(cfg, rng)
    print("compiling train step (7B MVM double pass; this takes a while) ...",
          flush=True)
    t0 = time.perf_counter()
    state, metrics = train_step(state, batch)
    jax.block_until_ready(metrics["loss"])
    print(f"compile+first step: {time.perf_counter()-t0:.0f}s  "
          f"loss={float(metrics['loss']):.3f}", flush=True)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = train_step(state, batch)
    jax.block_until_ready(metrics["loss"])
    dt = (time.perf_counter() - t0) / args.steps
    print(f"train step: {dt*1e3:.0f} ms/step  ({1.0/dt:.2f} samples/s, "
          f"micro-batch 1 x {T_FRAMES} frames, seq {SEQ})")
    print(f"loss={float(metrics['loss']):.3f} "
          f"grad_norm={float(metrics['grad_norm']):.3f}")


if __name__ == "__main__":
    main()
