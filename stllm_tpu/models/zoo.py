"""Model zoo: config-driven construction of the full ST-LLM stack.

Re-provides the reference's registered model entry point
(reference: stllm/models/st_llm.py:94-203 — registry name "st_llm_hf",
PRETRAINED_MODEL_CONFIG_DICT model-type table, from_config with optional
pretrained-weight loading and strict=False checkpoint overlay) for the
functional JAX design: the "model" is a small object bundling
(STLLMConfig, param tree, tokenizers) with helpers to build a Chat or a
trainable-partition policy.

Every weight source is optional and loaded only if its path exists — random
init otherwise — so debug configs run fully offline.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import zlib
from typing import Any, Callable, Dict, Mapping, Optional

import jax
import jax.numpy as jnp

from stllm_tpu.common.registry import Registry
from stllm_tpu.models.llama import VICUNA_7B, LlamaConfig
from stllm_tpu.models.qformer import INSTRUCT_BLIP_QFORMER, QFormerConfig
from stllm_tpu.models.stllm import STLLMConfig, init_stllm
from stllm_tpu.models.vit import EVA_VIT_G, ViTConfig

logger = logging.getLogger(__name__)

_DTYPES = {"bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16,
           "fp16": jnp.bfloat16,  # fp16 ckpts run as bf16 on TPU
           "fp32": jnp.float32, "float32": jnp.float32}


def _tuplify(v):
    """YAML lists -> nested tuples: config dataclasses are closed over /
    passed as static jit args, so every field must stay hashable (e.g.
    vit.merge_schedule / vit.temporal_schedule from a YAML `vit:` block)."""
    return tuple(_tuplify(x) for x in v) if isinstance(v, list) else v


def _sub_config(base, overrides: Mapping, dtype) -> Any:
    fields = {f.name for f in dataclasses.fields(base)}
    kw = {k: _tuplify(v) for k, v in (overrides or {}).items() if k in fields}
    return dataclasses.replace(base, dtype=dtype, **kw)


def build_stllm_config(cfg: Mapping) -> STLLMConfig:
    """YAML model section -> STLLMConfig. Recognizes the reference's keys
    (video_input, residual_size, use_mask, mvm_decode, qformer_text_input,
    max_txt_len, end_sym, model_type *_btadapter) plus optional debug size
    overrides under ``vit:``/``qformer:``/``llama:``."""
    dtype = _DTYPES.get(str(cfg.get("dtype", cfg.get("vit_precision", "bf16"))).lower(),
                        jnp.bfloat16)
    model_type = cfg.get("model_type", "instructblip_vicuna0")
    vit_model = cfg.get("vit_model")
    if vit_model is None:
        vit_model = "eva_btadapter_g" if str(model_type).endswith("_btadapter") \
            else "eva_clip_g"
    qformer_text_input = cfg.get("qformer_text_input",
                                 "instructblip" in str(model_type))
    vit_over = dict(cfg.get("vit") or {})
    llama_over = dict(cfg.get("llama") or {})
    level = vit_over.get("merge_level", "")
    if level and level != "auto":
        # concrete names expand to their schedules here (one source:
        # ops/tome.py MERGE_LEVELS); "auto" stays and resolves per video
        # at the inference entry points
        from stllm_tpu.ops.tome import level_kwargs

        for k, v in level_kwargs(level).items():
            vit_over.setdefault(k, v)
        vit_over["merge_level"] = ""
    if cfg.get("use_grad_checkpoint", False):
        # reference: per-ViT-block checkpointing (eva_vit.py:336-337) and
        # gradient_checkpointing_enable on the LLM (st_llm.py:186-187)
        vit_over.setdefault("remat", True)
        llama_over.setdefault("remat", True)
    return STLLMConfig(
        vit=_sub_config(EVA_VIT_G, vit_over, dtype),
        qformer=_sub_config(INSTRUCT_BLIP_QFORMER, cfg.get("qformer"), dtype),
        llama=_sub_config(VICUNA_7B, llama_over, dtype),
        video_input=cfg.get("video_input", "residual"),
        residual_size=cfg.get("residual_size", 4),
        use_mask=cfg.get("use_mask", False),
        mvm_decode=cfg.get("mvm_decode", False),
        qformer_text_input=qformer_text_input,
        vit_model=vit_model,
        btadapter_depth=cfg.get("btadapter_depth", 3),
        max_txt_len=cfg.get("max_txt_len", 32),
        end_sym=cfg.get("end_sym", "\n"),
    )


@Registry.register_model("st_llm_hf")
class STLLM:
    """Bundled (cfg, params, tokenizers) with reference-style construction."""

    PRETRAINED_MODEL_CONFIG_DICT = {
        "instructblip_vicuna0": "configs/models/instructblip_vicuna0.yaml",
        "instructblip_vicuna0_btadapter": "configs/models/instructblip_vicuna0_btadapter.yaml",
        "minigpt4_vicuna0": "configs/models/minigpt4_vicuna0.yaml",
        "minigpt4_vicuna0_btadapter": "configs/models/minigpt4_vicuna0_btadapter.yaml",
    }

    def __init__(self, cfg: STLLMConfig, params: Dict,
                 llama_tokenizer=None, qformer_tokenizer=None,
                 model_cfg: Optional[Mapping] = None):
        self.cfg = cfg
        self.params = params
        self.llama_tokenizer = llama_tokenizer
        self.qformer_tokenizer = qformer_tokenizer
        self.model_cfg = dict(model_cfg or {})

    # -- construction ------------------------------------------------------

    @classmethod
    def from_config(cls, model_cfg: Mapping, seed: int = 0) -> "STLLM":
        cfg = build_stllm_config(model_cfg)
        params = init_stllm(jax.random.PRNGKey(seed), cfg)
        params = cls._load_weights(params, cfg, model_cfg)
        lora_r = int(model_cfg.get("lora_r", 0) or 0)
        if lora_r > 0:
            from stllm_tpu.models.lora import add_lora

            params = add_lora(params, jax.random.PRNGKey(seed + 1), lora_r,
                              float(model_cfg.get("lora_alpha", 32)))
        if model_cfg.get("quant_int8", False):
            # inference-only W8A8 (ops/quant.py): ViT blocks, Q-Former and
            # LLaMA decoder matmuls become int8 (BTAdapter branch params and
            # llama_proj — the direct producer of LLM input embeddings —
            # stay dense). Pair with `llama: {kv_int8: true}` for an int8
            # KV cache.
            from stllm_tpu.models.llama import quantize_llama_params
            from stllm_tpu.models.vit import quantize_vit_params
            from stllm_tpu.ops.quant import quantize_tree_linears

            params["vit"] = quantize_vit_params(params["vit"], free_dense=True)
            params["qformer"] = quantize_tree_linears(params["qformer"],
                                                      free_dense=True)
            params["llama"] = quantize_llama_params(params["llama"],
                                                    free_dense=True)
        llama_tok = cls._load_llama_tokenizer(model_cfg.get("llama_model"))
        qformer_tok = cls._load_bert_tokenizer(model_cfg.get("bert_model")) \
            if cfg.qformer_text_input else None
        return cls(cfg, params, llama_tok, qformer_tok, model_cfg)

    @staticmethod
    def _load_weights(params: Dict, cfg: STLLMConfig, model_cfg: Mapping) -> Dict:
        from stllm_tpu.convert import torch_to_jax as cvt

        vit_path = model_cfg.get("vit_model_path")
        if vit_path and os.path.exists(vit_path):
            logger.info("Loading ViT weights from %s", vit_path)
            state = cvt.load_torch_file(vit_path)
            if cfg.vit_model == "eva_btadapter_g":
                params["vit"] = cvt.convert_btadapter(state, cfg.vit,
                                                      cfg.btadapter_depth)
            else:
                params["vit"] = cvt.convert_eva_vit(state, cfg.vit)

        q_path = model_cfg.get("q_former_model")
        if q_path and os.path.exists(str(q_path)):
            logger.info("Loading Q-Former weights from %s", q_path)
            state = cvt.load_torch_file(str(q_path))
            params["qformer"] = cvt.convert_qformer(state, cfg.qformer)

        llama_dir = model_cfg.get("llama_model")
        if llama_dir and os.path.isdir(str(llama_dir)):
            logger.info("Loading LLaMA weights from %s", llama_dir)
            state = cvt.load_sharded_hf(str(llama_dir))
            params["llama"] = cvt.convert_hf_llama(state, cfg.llama)

        ckpt = model_cfg.get("ckpt")
        if ckpt and os.path.exists(str(ckpt)) and not os.path.isdir(str(ckpt)):
            logger.info("Load BLIP2-LLM Checkpoint: %s", ckpt)
            state = cvt.load_torch_file(str(ckpt))
            params = cvt.overlay_stllm_checkpoint(params, state, cfg,
                                                  cfg.btadapter_depth)
        return params

    @staticmethod
    def _load_llama_tokenizer(llama_dir):
        if not llama_dir or not os.path.isdir(str(llama_dir)):
            return None
        try:
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(str(llama_dir), use_fast=False)
            tok.pad_token = tok.eos_token if tok.pad_token is None else tok.pad_token
            return tok
        except Exception as e:  # noqa: BLE001
            logger.warning("LLaMA tokenizer load failed: %s", e)
            return None

    @staticmethod
    def _load_bert_tokenizer(bert_dir):
        if not bert_dir or not os.path.isdir(str(bert_dir)):
            return None
        try:
            from transformers import BertTokenizer

            tok = BertTokenizer.from_pretrained(str(bert_dir))
            tok.add_special_tokens({"bos_token": "[DEC]"})
            return tok
        except Exception as e:  # noqa: BLE001
            logger.warning("BERT tokenizer load failed: %s", e)
            return None

    # -- helpers -----------------------------------------------------------

    def chat(self, image_size: int = 224):
        from stllm_tpu.conversation import Chat

        return Chat(self.params, self.cfg, self.llama_tokenizer,
                    qformer_tokenizer=self.qformer_tokenizer,
                    image_size=image_size)

    def trainable_fn(self) -> Callable[[str], bool]:
        from stllm_tpu.train.step import default_trainable

        return default_trainable(
            freeze_vit=self.model_cfg.get("freeze_vit", True),
            freeze_qformer=self.model_cfg.get("freeze_qformer", True),
            freeze_llm=self.model_cfg.get("freeze_LLM", True),
        )


class ToyHashTokenizer:
    """Deterministic word-hash tokenizer with exact decode via a reverse map.
    Installed by ensure_tokenizers() for offline/debug runs — outputs are
    gibberish but every code path (encode, stop sequences, decode) runs.
    Hashing is crc32, not builtin hash(): PYTHONHASHSEED salts hash() per
    process, so "deterministic" would otherwise only hold within one run."""

    def __init__(self, vocab_size: int, reserve: int = 10):
        self.vocab_size = vocab_size
        self.reserve = reserve
        self.rev: Dict[int, str] = {}

    def encode(self, text, add_special_tokens=False):
        ids = [1] if add_special_tokens else []
        for w in text.split(" "):
            t = self.reserve + (zlib.crc32(w.encode())
                                % (self.vocab_size - self.reserve))
            self.rev[t] = w
            ids.append(t)
        return ids

    def decode(self, ids):
        return " ".join(self.rev.get(int(t), "<unk>") for t in ids if t > 1)


def ensure_tokenizers(model: STLLM, warn: bool = True) -> STLLM:
    """Install toy tokenizers when real ones are unavailable (offline runs)."""
    if model.llama_tokenizer is None:
        if warn:
            logger.warning(
                "no LLaMA tokenizer (set model.llama_model to a checkpoint "
                "dir); using a toy hash tokenizer — outputs will be gibberish "
                "but exercise the full pipeline")
        model.llama_tokenizer = ToyHashTokenizer(model.cfg.llama.vocab_size)
    if model.cfg.qformer_text_input and model.qformer_tokenizer is None:
        model.qformer_tokenizer = ToyHashTokenizer(
            model.cfg.qformer.vocab_size, reserve=2)
    return model


def load_model_and_preprocess(arch: str, model_type: str,
                              overrides: Optional[Mapping] = None):
    """Reference-style loader (reference: stllm/models/__init__.py:113):
    returns (model, vis_processors dict)."""
    from stllm_tpu.common.config import Config, load_yaml
    from stllm_tpu.data.processors import (
        Blip2ImageEvalProcessor, Blip2ImageTrainProcessor,
    )
    import pathlib

    model_cls = Registry.get_model_class(arch)
    default = model_cls.PRETRAINED_MODEL_CONFIG_DICT[model_type]
    root = pathlib.Path(__file__).resolve().parent.parent
    cfg = load_yaml(root / default)
    model_cfg = dict(cfg.get("model", {}))
    model_cfg["model_type"] = model_type
    model_cfg.update(overrides or {})
    model = model_cls.from_config(model_cfg)
    pre = cfg.get("preprocess", {}).get("vis_processor", {})
    vis = {
        "train": Blip2ImageTrainProcessor.from_config(pre.get("train")),
        "eval": Blip2ImageEvalProcessor.from_config(pre.get("eval")),
    }
    return model, vis
