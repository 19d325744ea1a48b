"""Sharded inference correctness: encode + forward under FSDP/TP shardings
produce the same numbers as single-device execution, and the profiler trace
hook writes a trace."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stllm_tpu.models.llama import LlamaConfig
from stllm_tpu.models.qformer import QFormerConfig
from stllm_tpu.models.stllm import STLLMConfig, encode_img, init_stllm
from stllm_tpu.models.vit import ViTConfig
from stllm_tpu.parallel.mesh import make_mesh
from stllm_tpu.parallel.sharding import batch_shardings, stllm_param_shardings

TINY = STLLMConfig(
    vit=ViTConfig(image_size=28, patch_size=14, width=32, depth=2, heads=2,
                  mlp_hidden=64, dtype=jnp.float32, use_flash=False),
    qformer=QFormerConfig(hidden=16, num_layers=2, heads=2, intermediate=32,
                          encoder_width=32, num_query=4, vocab_size=64,
                          dtype=jnp.float32),
    llama=LlamaConfig(vocab_size=97, hidden=32, num_layers=2, heads=2,
                      intermediate=64, max_positions=256, dtype=jnp.float32),
    video_input="residual", residual_size=2,
)


def test_sharded_encode_matches_single_device():
    params = init_stllm(jax.random.PRNGKey(0), TINY)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (8, 4, 28, 28, 3)), jnp.uint8)
    ids = jnp.asarray(rng.integers(0, 64, (8, 5)), jnp.int32)
    mask = jnp.ones((8, 5), jnp.int32)

    single = encode_img(params, frames, TINY, ids, mask)

    mesh = make_mesh(data=4, model=2)
    p_sh = stllm_param_shardings(mesh, params, min_size=64)
    sharded_params = jax.device_put(params, p_sh)
    batch = {"frames": frames, "ids": ids, "mask": mask}
    sh = batch_shardings(mesh, batch)
    frames_s = jax.device_put(frames, sh["frames"])
    ids_s = jax.device_put(ids, sh["ids"])
    mask_s = jax.device_put(mask, sh["mask"])

    fn = jax.jit(lambda p, f, i, m: encode_img(p, f, TINY, i, m))
    sharded = fn(sharded_params, frames_s, ids_s, mask_s)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               rtol=2e-4, atol=2e-5)


def test_profiler_trace_hook(tmp_path):
    from stllm_tpu.data.packing import pack_training_batch
    from stllm_tpu.train.trainer import Trainer

    params = init_stllm(jax.random.PRNGKey(0), TINY)
    rng = np.random.default_rng(0)
    v = TINY.num_video_tokens(4)

    def loader():
        while True:
            b = pack_training_batch([[5, 6]] * 2, [[8]] * 2, [[11, 12]] * 2,
                                    num_video=v, seq_len=32, pad_id=0)
            b["frames"] = rng.normal(size=(2, 4, 28, 28, 3)).astype(np.float32)
            b["qformer_input_ids"] = rng.integers(0, 64, (2, 5)).astype(np.int32)
            b["qformer_attention_mask"] = np.ones((2, 5), np.int32)
            yield b

    prof = tmp_path / "trace"
    tr = Trainer(TINY, params, output_dir=str(tmp_path / "out"),
                 learning_rate=1e-3, log_freq=100, save_freq=100,
                 profile_dir=str(prof), profile_steps=(1, 2))
    tr.train(loader(), max_steps=3)
    traces = list(prof.rglob("*.trace.json.gz")) + list(prof.rglob("*.xplane.pb"))
    assert traces, f"no trace files under {prof}"


def test_tp_sharded_decode_matches_single_device():
    """Tensor-parallel 7B-style decode: the full generate loop (prefill +
    chunked greedy with KV cache) under a `model`-axis mesh emits the same
    tokens as single-device execution — GSPMD propagates the TP shardings
    through the cache carry."""
    from stllm_tpu.models.generation import GenerationConfig, generate
    from stllm_tpu.models.llama import init_llama

    cfg = TINY.llama
    params = init_llama(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(1)
    emb = jnp.asarray(rng.normal(size=(1, 7, cfg.hidden)) * 0.1, jnp.float32)
    gen = GenerationConfig(max_new_tokens=12, eos_token_id=-1,
                           stop_sequences=(), pad_to_multiple=8)
    single = generate(params, emb, llama_cfg=cfg, gen=gen)

    mesh = make_mesh(data=4, model=2)
    p_sh = stllm_param_shardings(mesh, {"llama": params}, min_size=64)
    sharded = jax.device_put({"llama": params}, p_sh)["llama"]
    got = generate(sharded, emb, llama_cfg=cfg, gen=gen)
    assert got == single
