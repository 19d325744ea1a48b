"""LoRA tests: identity at init, gradient flow under freeze_LLM, merge
equivalence, PEFT checkpoint conversion, zoo wiring."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stllm_tpu.models.llama import LlamaConfig, init_llama, llama_forward, lm_head
from stllm_tpu.models.lora import add_lora, convert_peft_lora, merge_lora
from stllm_tpu.train.step import default_trainable, partition_params, path_str

CFG = LlamaConfig(vocab_size=97, hidden=32, num_layers=2, heads=2,
                  intermediate=64, max_positions=128, dtype=jnp.float32)


@pytest.fixture(scope="module")
def base():
    params = {"llama": init_llama(jax.random.PRNGKey(0), CFG)}
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 97, (2, 8)), jnp.int32)
    embeds = params["llama"]["embed_tokens"][ids]
    return params, embeds


def _logits(params, embeds):
    hidden, _ = llama_forward(params["llama"], inputs_embeds=embeds, cfg=CFG)
    return lm_head(params["llama"], hidden)


def test_lora_identity_at_init(base):
    params, embeds = base
    withl = add_lora(params, jax.random.PRNGKey(1), r=4)
    np.testing.assert_allclose(
        np.asarray(_logits(params, embeds)),
        np.asarray(_logits(withl, embeds)), atol=1e-6)
    assert "q_lora" in withl["llama"]["layers"][0]
    assert "v_lora" in withl["llama"]["layers"][0]
    assert "k_lora" not in withl["llama"]["layers"][0]


def test_lora_changes_output_when_b_nonzero(base):
    params, embeds = base
    withl = add_lora(params, jax.random.PRNGKey(1), r=4)
    withl["llama"]["layers"][0]["q_lora"]["b"] = (
        jnp.ones_like(withl["llama"]["layers"][0]["q_lora"]["b"]) * 0.1)
    a = np.asarray(_logits(params, embeds))
    b = np.asarray(_logits(withl, embeds))
    assert np.abs(a - b).max() > 1e-4


def test_merge_matches_adapter(base):
    params, embeds = base
    withl = add_lora(params, jax.random.PRNGKey(1), r=4)
    for i in range(2):
        for t in ("q_lora", "v_lora"):
            withl["llama"]["layers"][i][t]["b"] = jnp.asarray(
                np.random.default_rng(i).normal(size=(4, 32)) * 0.05, jnp.float32)
    merged = merge_lora(withl)
    assert "q_lora" not in merged["llama"]["layers"][0]
    np.testing.assert_allclose(
        np.asarray(_logits(withl, embeds)),
        np.asarray(_logits(merged, embeds)), rtol=2e-4, atol=2e-5)


def test_freeze_policy_trains_lora_only_in_llm(base):
    params, _ = base
    withl = add_lora(params, jax.random.PRNGKey(1), r=4)
    train, _ = partition_params(withl, default_trainable())
    paths = {path_str(p) for p, _ in jax.tree_util.tree_leaves_with_path(train)}
    assert any("q_lora/a" in x for x in paths)
    assert not any(x.endswith("alpha") for x in paths)
    assert not any("/q/w" in x for x in paths)


def test_convert_peft_lora(base):
    params, embeds = base
    rng = np.random.default_rng(0)
    state = {
        "base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight":
            rng.normal(size=(4, 32)).astype(np.float32),
        "base_model.model.model.layers.0.self_attn.q_proj.lora_B.weight":
            rng.normal(size=(32, 4)).astype(np.float32) * 0.1,
    }
    out = convert_peft_lora(state, params)
    l0 = out["llama"]["layers"][0]["q_lora"]
    assert l0["a"].shape == (32, 4) and l0["b"].shape == (4, 32)
    logits = _logits(out, embeds)
    assert np.isfinite(np.asarray(logits)).all()


def test_zoo_lora_r():
    import stllm_tpu.models.zoo as zoo

    cfg = {
        "arch": "st_llm_hf", "model_type": "instructblip_vicuna0",
        "dtype": "fp32", "lora_r": 4,
        "vit": {"image_size": 28, "patch_size": 14, "width": 32, "depth": 2,
                "heads": 2, "mlp_hidden": 64, "use_flash": False},
        "qformer": {"hidden": 16, "num_layers": 2, "heads": 2,
                    "intermediate": 32, "encoder_width": 32, "num_query": 4,
                    "vocab_size": 64},
        "llama": {"vocab_size": 97, "hidden": 32, "num_layers": 2, "heads": 2,
                  "intermediate": 64, "max_positions": 128},
    }
    model = zoo.STLLM.from_config(cfg)
    assert "q_lora" in model.params["llama"]["layers"][0]


def test_add_lora_on_prepadded_int4_tree():
    """Regression (round 3b review): per-channel int4 storage may be
    K-pre-padded for the Pallas kernel, so adapter fan-in must come from
    the model config, not 2*w4.shape[0]. Covers the padded `down` target
    and fused qkv trees."""
    from stllm_tpu.models.generation import GenerationConfig, generate
    from stllm_tpu.models.llama import quantize_llama_params_int4

    cfg = LlamaConfig(vocab_size=97, hidden=64, num_layers=2, heads=4,
                      intermediate=172, max_positions=64, dtype=jnp.float32)
    params = init_llama(jax.random.PRNGKey(0), cfg)
    q4 = quantize_llama_params_int4(params, group=None)
    with_lora = add_lora({"llama": q4}, jax.random.PRNGKey(1), 4,
                         targets=("q", "v", "down"))["llama"]
    l0 = with_lora["layers"][0]
    assert l0["q_lora"]["a"].shape == (64, 4)
    assert l0["down_lora"]["a"].shape == (172, 4)      # true K, not padded
    assert l0["down_lora"]["b"].shape == (4, 64)
    gen = GenerationConfig(max_new_tokens=4, eos_token_id=-1,
                           stop_sequences=(), pad_to_multiple=8)
    emb = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 64)) * 0.1
    out = generate(with_lora, emb, llama_cfg=cfg, gen=gen)
    assert len(out[0]) == 4

    fused = quantize_llama_params_int4(params, group=None, fuse=True)
    with_lora_f = add_lora({"llama": fused}, jax.random.PRNGKey(3), 4)["llama"]
    assert with_lora_f["layers"][0]["q_lora"]["b"].shape == (4, 64)
    out_f = generate(with_lora_f, emb, llama_cfg=cfg, gen=gen)
    assert len(out_f[0]) == 4


def test_fused_tree_through_h2o_and_context_parallel():
    """Regression (round 3b review): the fused qkv/gateup serving form must
    work everywhere the split form does — H2O decode and the
    context-parallel layer both project through _qkv_proj now."""
    from stllm_tpu.models.h2o import h2o_decode_step, h2o_prefill
    from stllm_tpu.models.llama import quantize_llama_params_int4

    cfg = LlamaConfig(vocab_size=97, hidden=64, num_layers=2, heads=4,
                      intermediate=172, max_positions=64, dtype=jnp.float32)
    params = init_llama(jax.random.PRNGKey(5), cfg)
    fused = quantize_llama_params_int4(params, group=None, fuse=True)

    emb = jax.random.normal(jax.random.PRNGKey(6), (1, 6, 64)) * 0.1
    mask = jnp.ones((1, 6), jnp.int32)
    hidden, cache = h2o_prefill(fused, emb, mask, cfg, budget=16, recent=4)
    from stllm_tpu.models.llama import lm_head as head_fn
    nxt = jnp.argmax(head_fn(fused, hidden[:, -1:])[:, 0],
                     axis=-1).astype(jnp.int32)
    _, cache = h2o_decode_step(fused, nxt, cache, cfg)  # must not KeyError

    # context-parallel forward over a fused tree matches the dense forward
    from jax.sharding import Mesh
    from stllm_tpu.models.llama import llama_forward
    from stllm_tpu.parallel.context import context_parallel_forward

    emb_cp = jax.random.normal(jax.random.PRNGKey(7), (2, 64, 64)) * 0.1
    dense, _ = llama_forward(fused, inputs_embeds=emb_cp, cfg=cfg)
    mesh = Mesh(np.array(jax.devices()[:4]), ("cp",))
    cp = context_parallel_forward(fused, emb_cp, mesh, cfg, axis_name="cp")
    np.testing.assert_allclose(np.asarray(cp), np.asarray(dense),
                               rtol=2e-5, atol=2e-6)
