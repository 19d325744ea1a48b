"""Model zoo + config pipeline tests: YAML -> STLLMConfig -> params ->
checkpoint overlay; registry default-YAML merge."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import stllm_tpu.data  # noqa: F401  (processor registration)
import stllm_tpu.models.zoo  # noqa: F401  (model registration)
from stllm_tpu.common.config import Config
from stllm_tpu.common.registry import Registry
from stllm_tpu.convert.torch_to_jax import overlay_stllm_checkpoint
from stllm_tpu.models.zoo import STLLM, build_stllm_config, load_model_and_preprocess

TINY_MODEL_CFG = {
    "arch": "st_llm_hf",
    "model_type": "instructblip_vicuna0",
    "video_input": "residual",
    "residual_size": 2,
    "use_mask": True,
    "mvm_decode": True,
    "dtype": "fp32",
    "end_sym": "###",
    "vit": {"image_size": 28, "patch_size": 14, "width": 32, "depth": 2,
            "heads": 2, "mlp_hidden": 64, "use_flash": False},
    "qformer": {"hidden": 16, "num_layers": 2, "heads": 2, "intermediate": 32,
                "encoder_width": 32, "num_query": 4, "vocab_size": 64},
    "llama": {"vocab_size": 128, "hidden": 32, "num_layers": 2, "heads": 2,
              "intermediate": 64, "max_positions": 256},
}


def test_build_config_from_yaml_dict():
    cfg = build_stllm_config(TINY_MODEL_CFG)
    assert cfg.vit.width == 32 and cfg.llama.hidden == 32
    assert cfg.vit.dtype == jnp.float32
    assert cfg.video_input == "residual" and cfg.mvm_decode
    assert cfg.qformer_text_input  # instructblip default
    assert cfg.vit_model == "eva_clip_g"


def test_yaml_merge_schedules_become_tuples():
    """YAML lists for vit.merge_schedule / vit.temporal_schedule must land
    as nested tuples: ViTConfig is hashed as a static jit arg on the remat
    path, and a list-bearing dataclass is unhashable."""
    cfg = build_stllm_config({
        **TINY_MODEL_CFG,
        "vit": {**TINY_MODEL_CFG["vit"],
                "merge_schedule": [[1, 4]],
                "temporal_schedule": [[1, 2, 5]]},
    })
    assert cfg.vit.merge_schedule == ((1, 4),)
    assert cfg.vit.temporal_schedule == ((1, 2, 5),)
    hash(cfg.vit)  # must not raise


def test_btadapter_model_type_selects_branch():
    cfg = build_stllm_config({**TINY_MODEL_CFG,
                              "model_type": "instructblip_vicuna0_btadapter"})
    assert cfg.vit_model == "eva_btadapter_g"
    cfg2 = build_stllm_config({**TINY_MODEL_CFG, "model_type": "minigpt4_vicuna0"})
    assert not cfg2.qformer_text_input


def test_from_config_and_chat():
    model = STLLM.from_config(TINY_MODEL_CFG)
    assert "vit" in model.params and model.params["llama"] is not None
    assert "residual" in model.params and "mvm_decoder" in model.params
    chat = model.chat(image_size=28)
    assert chat.cfg is model.cfg
    fn = model.trainable_fn()
    assert fn("llama_proj/w") and not fn("llama/layers/0/q/w")


def test_registry_and_default_yaml_merge():
    cfg = Config("config/tiny_debug.yaml")
    mc = cfg.model_cfg
    assert mc["arch"] == "st_llm_hf"
    # defaults from stllm_tpu/configs/models/instructblip_vicuna0.yaml merged in
    assert mc["freeze_vit"] is True
    assert "q_former_model" in mc
    # experiment yaml wins over defaults
    assert mc["video_input"] == "residual"
    model = Registry.get_model_class(mc["arch"]).from_config(mc)
    assert model.cfg.llama.hidden == 32


def test_overlay_checkpoint():
    model = STLLM.from_config(TINY_MODEL_CFG)
    cfg = model.cfg
    rng = np.random.default_rng(0)
    d_llm, d_q = cfg.llama.hidden, cfg.qformer.hidden
    state = {
        # trainer-style prefix + reference llm_proj naming
        "model.stllm_model.llm_proj.weight": rng.normal(size=(d_llm, d_q)).astype(np.float32),
        "model.stllm_model.llm_proj.bias": rng.normal(size=(d_llm,)).astype(np.float32),
        "model.stllm_model.down_proj.weight": rng.normal(size=(d_llm // 4, d_llm)).astype(np.float32),
        "model.stllm_model.down_proj.bias": np.zeros(d_llm // 4, np.float32),
        "model.stllm_model.up_proj.weight": np.zeros((d_llm, d_llm // 4), np.float32),
        "model.stllm_model.up_proj.bias": np.zeros(d_llm, np.float32),
        "model.stllm_model.ln_vision.weight": np.ones(cfg.vit.width, np.float32),
        "model.stllm_model.ln_vision.bias": np.zeros(cfg.vit.width, np.float32),
        "model.stllm_model.mvm_decoder.head.weight": rng.normal(size=(d_llm, d_llm)).astype(np.float32),
        "model.stllm_model.mvm_decoder.head.bias": np.zeros(d_llm, np.float32),
        "model.stllm_model.mvm_decoder.norm.weight": np.ones(d_llm, np.float32),
        "model.stllm_model.mvm_decoder.norm.bias": np.zeros(d_llm, np.float32),
    }
    out = overlay_stllm_checkpoint(model.params, state, cfg)
    np.testing.assert_allclose(
        np.asarray(out["llama_proj"]["w"]),
        state["model.stllm_model.llm_proj.weight"].T, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out["residual"]["down"]["w"]),
        state["model.stllm_model.down_proj.weight"].T, rtol=1e-6)
    # untouched families keep their original values
    np.testing.assert_array_equal(
        np.asarray(out["qformer"]["query_tokens"]),
        np.asarray(model.params["qformer"]["query_tokens"]))


def test_minigpt4_mode_forward():
    """qformer_text_input=False end-to-end: stripped Q-Former embeddings,
    front BOS, end_sym answers (reference minigpt4_vicuna0 path)."""
    from stllm_tpu.data.packing import pack_training_batch

    cfg_dict = {**TINY_MODEL_CFG, "model_type": "minigpt4_vicuna0",
                "use_mask": False}
    model = STLLM.from_config(cfg_dict)
    assert not model.cfg.qformer_text_input
    assert model.params["qformer"]["embeddings"]["word"] is None

    from stllm_tpu.models.stllm import stllm_forward

    rng = np.random.default_rng(0)
    v = model.cfg.num_video_tokens(4)
    batch = pack_training_batch([[5, 6]] * 2, [[8]] * 2, [[11, 12]] * 2,
                                num_video=v, seq_len=64, pad_id=0, bos_id=1)
    batch = {k: jnp.asarray(x) for k, x in batch.items()}
    batch["frames"] = jnp.asarray(rng.normal(size=(2, 4, 28, 28, 3)), jnp.float32)
    out = stllm_forward(model.params, batch, model.cfg)
    assert np.isfinite(float(out["loss"]))


def test_load_model_and_preprocess():
    model, vis = load_model_and_preprocess(
        "st_llm_hf", "instructblip_vicuna0",
        overrides={k: v for k, v in TINY_MODEL_CFG.items()
                   if k not in ("arch", "model_type")},
    )
    assert model.cfg.llama.hidden == 32
    assert "train" in vis and "eval" in vis
    img = np.random.default_rng(0).integers(0, 256, (64, 64, 3)).astype(np.uint8)
    out = vis["eval"](img)
    assert out.shape[-1] == 3


def test_quant_int8_config_key():
    """model.quant_int8 converts ViT + LLaMA matmuls to W8A8 at load time;
    llama.kv_int8 flows through to the decode cache config."""
    cfg_dict = dict(TINY_MODEL_CFG)
    cfg_dict["quant_int8"] = True
    cfg_dict["llama"] = dict(TINY_MODEL_CFG["llama"], kv_int8=True)
    model = STLLM.from_config(cfg_dict)
    blk = model.params["vit"]["blocks"][0]
    assert "w_q" in blk["qkv"] and blk["qkv"]["w_q"].dtype == jnp.int8
    lyr = model.params["llama"]["layers"][0]
    assert "w_q" in lyr["gate"] and lyr["gate"]["w_q"].dtype == jnp.int8
    qf = model.params["qformer"]["layers"][0]
    assert "w_q" in qf["attention"]["q"]
    # embeddings stay dense arrays
    assert model.params["qformer"]["query_tokens"].dtype != jnp.int8
    # lm_head and embeddings stay dense
    assert "w" in model.params["llama"]["lm_head"]
    assert model.cfg.llama.kv_int8
    # forward still runs end-to-end (tiny encode)
    frames = jnp.zeros((1, 2, 28, 28, 3), jnp.float32)
    from stllm_tpu.models.stllm import encode_img

    out = encode_img(model.params, frames, model.cfg)
    assert out.shape[0] == 1
