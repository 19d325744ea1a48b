"""End-to-end weight loading through the zoo: an HF Vicuna-style directory
and a reference-named ST-LLM torch checkpoint, exactly as a user would point
configs at them (reference: st_llm.py:160-203 from_config loading)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import stllm_tpu.models.zoo  # noqa: F401
from stllm_tpu.models.zoo import STLLM

TINY_CFG = {
    "arch": "st_llm_hf",
    "model_type": "instructblip_vicuna0",
    "dtype": "fp32",
    "video_input": "residual",
    "residual_size": 2,
    "mvm_decode": True,
    "vit": {"image_size": 28, "patch_size": 14, "width": 32, "depth": 2,
            "heads": 2, "mlp_hidden": 64, "use_flash": False},
    "qformer": {"hidden": 16, "num_layers": 2, "heads": 2, "intermediate": 32,
                "encoder_width": 32, "num_query": 4, "vocab_size": 64},
    "llama": {"vocab_size": 128, "hidden": 32, "num_layers": 2, "heads": 2,
              "intermediate": 64, "max_positions": 128},
}


def test_hf_llama_dir_loading(tmp_path):
    """llama_model pointed at a saved HF LlamaForCausalLM -> identical logits."""
    import torch
    from transformers import LlamaConfig as HFConfig, LlamaForCausalLM

    hf_cfg = HFConfig(vocab_size=128, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=2, num_key_value_heads=2,
                      intermediate_size=64, max_position_embeddings=128,
                      tie_word_embeddings=False)
    torch.manual_seed(0)
    hf = LlamaForCausalLM(hf_cfg).eval()
    d = tmp_path / "vicuna"
    hf.save_pretrained(str(d))

    model = STLLM.from_config({**TINY_CFG, "llama_model": str(d)})
    ids = np.random.default_rng(0).integers(0, 128, (1, 6))
    with torch.no_grad():
        want = hf(torch.tensor(ids)).logits.numpy()

    from stllm_tpu.models.llama import llama_forward, lm_head

    hidden, _ = llama_forward(model.params["llama"],
                              input_ids=jnp.asarray(ids), cfg=model.cfg.llama)
    got = np.asarray(lm_head(model.params["llama"], hidden))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_stllm_release_checkpoint_loading(tmp_path):
    """ckpt with the reference's module names overlays the right families."""
    import torch

    rng = np.random.default_rng(0)
    d_llm, d_q, d_vit = 32, 16, 32
    state = {
        # llm_proj naming + 'model' wrapper like HF trainer saves
        "model.stllm_model.llm_proj.weight": rng.normal(size=(d_llm, d_q)).astype(np.float32),
        "model.stllm_model.llm_proj.bias": rng.normal(size=(d_llm,)).astype(np.float32),
        "model.stllm_model.ln_vision.weight": rng.normal(size=(d_vit,)).astype(np.float32),
        "model.stllm_model.ln_vision.bias": np.zeros(d_vit, np.float32),
        "model.stllm_model.down_proj.weight": rng.normal(size=(d_llm // 4, d_llm)).astype(np.float32),
        "model.stllm_model.down_proj.bias": np.zeros(d_llm // 4, np.float32),
        "model.stllm_model.up_proj.weight": rng.normal(size=(d_llm, d_llm // 4)).astype(np.float32),
        "model.stllm_model.up_proj.bias": np.zeros(d_llm, np.float32),
        "model.stllm_model.mvm_decoder.head.weight": rng.normal(size=(d_llm, d_llm)).astype(np.float32),
        "model.stllm_model.mvm_decoder.head.bias": np.zeros(d_llm, np.float32),
        "model.stllm_model.mvm_decoder.norm.weight": np.ones(d_llm, np.float32),
        "model.stllm_model.mvm_decoder.norm.bias": np.zeros(d_llm, np.float32),
    }
    ckpt = tmp_path / "stllm.pth"
    torch.save({"model": {k: torch.from_numpy(v) for k, v in state.items()}},
               str(ckpt))

    model = STLLM.from_config({**TINY_CFG, "ckpt": str(ckpt)})
    np.testing.assert_allclose(
        np.asarray(model.params["llama_proj"]["w"]),
        state["model.stllm_model.llm_proj.weight"].T, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(model.params["ln_vision"]["scale"]),
        state["model.stllm_model.ln_vision.weight"], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(model.params["residual"]["up"]["w"]),
        state["model.stllm_model.up_proj.weight"].T, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(model.params["mvm_decoder"]["head"]["w"]),
        state["model.stllm_model.mvm_decoder.head.weight"].T, rtol=1e-6)

    # end-to-end forward still works after the overlay
    from stllm_tpu.models.stllm import encode_video_for_inference

    frames = jnp.asarray(rng.integers(0, 256, (4, 28, 28, 3)), jnp.uint8)
    out = encode_video_for_inference(model.params, frames, model.cfg)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_serving_checkpoint_roundtrip(tmp_path):
    """Quantized serving trees (fused W4A16 + int8 head) save/load through
    orbax and generate identically — quantize once, serve many."""
    import jax
    import jax.numpy as jnp

    from stllm_tpu.models.generation import GenerationConfig, generate
    from stllm_tpu.models.llama import (
        LlamaConfig, init_llama, quantize_llama_params_int4)
    from stllm_tpu.train.checkpoint import (
        load_serving_params, save_serving_params)

    cfg = LlamaConfig(vocab_size=96, hidden=64, num_layers=2, heads=4,
                      intermediate=172, max_positions=64, dtype=jnp.float32)
    params = quantize_llama_params_int4(
        init_llama(jax.random.PRNGKey(5), cfg), group=None, fuse=True,
        quant_head=True)
    save_serving_params(str(tmp_path / "ckpt"), params)

    # abstract template: shapes/dtypes only, as a fresh server would build
    template = jax.eval_shape(lambda p: p, params)
    restored = load_serving_params(str(tmp_path / "ckpt"), template)
    assert restored["layers"][0]["qkv"]["w4"].dtype == jnp.int8

    emb = jax.random.normal(jax.random.PRNGKey(6), (1, 5, 64)) * 0.1
    gen = GenerationConfig(max_new_tokens=7, eos_token_id=-1,
                           stop_sequences=(), pad_to_multiple=8)
    want = generate(params, emb, llama_cfg=cfg, gen=gen)
    got = generate(restored, emb, llama_cfg=cfg, gen=gen)
    assert got == want
