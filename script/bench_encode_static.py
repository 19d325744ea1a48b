"""Focused static-int8 encode bench (the bench.py headline stack only —
skips the bf16 measurement so kernel A/Bs turn around in ~3 min).

    STLLM_FUSED_LN={0|1|proj|fc2} python script/bench_encode_static.py
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from stllm_tpu.models.stllm import STLLMConfig, encode_img, init_stllm
from stllm_tpu.models.vit import (
    EVA_VIT_G, FUSED_LN, calibrate_vit_scales, quantize_vit_params)

FRAMES = 64


def main():
    cfg = STLLMConfig(vit=dataclasses.replace(EVA_VIT_G, gelu_approx=True))
    params = init_stllm(jax.random.PRNGKey(0), cfg, init_llama_params=False)
    params.pop("llama")
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.normal(size=(1, FRAMES, cfg.vit.image_size, cfg.vit.image_size,
                         3)), jnp.bfloat16)
    q_ids = jnp.asarray(rng.integers(0, cfg.qformer.vocab_size, (1, 16)),
                        jnp.int32)
    q_mask = jnp.ones((1, 16), jnp.int32)
    params["vit"] = quantize_vit_params(params["vit"], free_dense=True)
    params["vit"] = calibrate_vit_scales(
        params["vit"], frames.reshape(FRAMES, cfg.vit.image_size,
                                      cfg.vit.image_size, 3)[:16], cfg.vit)

    @jax.jit
    def encode(params, frames):
        return encode_img(params, frames, cfg, q_ids, q_mask)

    encode(params, frames).block_until_ready()
    encode(params, frames).block_until_ready()
    t0 = time.perf_counter()
    iters = 8
    for _ in range(iters):
        out = encode(params, frames)
    out.block_until_ready()
    fps = FRAMES * iters / (time.perf_counter() - t0)
    print(f"FUSED_LN={FUSED_LN!r}: static int8 encode {fps:.1f} fr/s",
          flush=True)


if __name__ == "__main__":
    main()
