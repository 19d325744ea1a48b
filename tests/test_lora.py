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
