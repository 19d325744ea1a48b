"""torch checkpoint -> JAX param pytree converters.

Covers the four checkpoint families the reference loads
(reference: SURVEY.md §7 / stllm/models/st_llm.py:149-201):
  1. eva_vit_g.pth           (LAVIS EVA-ViT-g)        -> vit.py params
  2. instruct_blip_*.pth     (Q-Former + projections)  -> qformer.py params
  3. Vicuna/LLaMA HF weights                          -> llama.py params
  4. ST-LLM release ckpts    (incl. llm_proj->llama_proj rename, strict=False)

All converters take a flat ``state_dict``-like mapping of numpy arrays (the
caller loads .pth via ``torch.load(map_location='cpu')`` or safetensors) and
report missing/unexpected keys like the reference's load logs.
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def _t(x) -> np.ndarray:
    """torch tensor / numpy -> numpy (no torch import required for numpy input)."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


class KeyTracker:
    """Tracks which source keys were consumed; reports leftovers like the
    reference's strict=False load logging."""

    def __init__(self, state: Mapping[str, Any], name: str):
        self.state = dict(state)
        self.used = set()
        self.missing = []
        self.name = name

    def take(self, key: str, optional: bool = False) -> Optional[np.ndarray]:
        if key in self.state:
            self.used.add(key)
            return _t(self.state[key])
        if not optional:
            self.missing.append(key)
        return None

    def has(self, key: str) -> bool:
        return key in self.state

    def finish(self) -> Tuple[list, list]:
        unexpected = [k for k in self.state if k not in self.used]
        if self.missing:
            logger.warning("%s: %d missing keys (e.g. %s)", self.name,
                           len(self.missing), self.missing[:5])
        if unexpected:
            logger.info("%s: %d unexpected keys ignored (e.g. %s)", self.name,
                        len(unexpected), unexpected[:5])
        return self.missing, unexpected


def _linear(tk: KeyTracker, prefix: str, bias: bool = True) -> Dict:
    """torch nn.Linear (out,in) -> {"w": (in,out), "b": (out,)}"""
    p = {"w": _maybe(tk.take(f"{prefix}.weight"), lambda w: w.T)}
    if bias:
        b = tk.take(f"{prefix}.bias", optional=True)
        if b is not None:
            p["b"] = b
    return p


def _norm(tk: KeyTracker, prefix: str) -> Dict:
    return {"scale": tk.take(f"{prefix}.weight"), "bias": tk.take(f"{prefix}.bias")}


def _maybe(x, fn: Callable):
    return None if x is None else fn(x)


def _to_dtype(tree, dtype):
    import jax.numpy as jnp

    def cast(leaf):
        if leaf is None:
            return None
        arr = jnp.asarray(leaf)
        if arr.dtype in (jnp.float32, jnp.float16, jnp.bfloat16, jnp.float64):
            return arr.astype(dtype)
        return arr

    import jax
    return jax.tree_util.tree_map(cast, tree)


# ---------------------------------------------------------------------------
# EVA ViT-g
# ---------------------------------------------------------------------------

def convert_eva_vit(state: Mapping[str, Any], cfg, dtype=None) -> Dict:
    """LAVIS eva_vit_g.pth naming -> stllm_tpu.models.vit params.

    torch patch_embed.proj is Conv2d(3, width, 14, stride=14) with weight
    (width, 3, 14, 14); our patchify emits features ordered (ph, pw, C), so the
    kernel permutes to (14, 14, 3, width) then flattens.
    """
    tk = KeyTracker(state, "eva_vit")
    conv_w = tk.take("patch_embed.proj.weight")  # (D, C, ph, pw)
    d = conv_w.shape[0]
    w = conv_w.transpose(2, 3, 1, 0).reshape(-1, d)  # (ph*pw*C, D)
    params: Dict = {
        "patch_embed": {"w": w, "b": tk.take("patch_embed.proj.bias")},
        "cls_token": tk.take("cls_token"),
        "pos_embed": tk.take("pos_embed"),
        "blocks": [],
    }
    for i in range(cfg.depth):
        pre = f"blocks.{i}"
        if not tk.has(f"{pre}.norm1.weight"):
            break
        params["blocks"].append(
            {
                "norm1": _norm(tk, f"{pre}.norm1"),
                "qkv": {"w": tk.take(f"{pre}.attn.qkv.weight").T},
                "q_bias": tk.take(f"{pre}.attn.q_bias"),
                "v_bias": tk.take(f"{pre}.attn.v_bias"),
                "proj": _linear(tk, f"{pre}.attn.proj"),
                "norm2": _norm(tk, f"{pre}.norm2"),
                "fc1": _linear(tk, f"{pre}.mlp.fc1"),
                "fc2": _linear(tk, f"{pre}.mlp.fc2"),
            }
        )
    tk.finish()
    if dtype is None:
        dtype = cfg.dtype
    params = _to_dtype(params, dtype)
    # resample pos embed if image size differs from the checkpoint's
    from stllm_tpu.models.vit import interpolate_pos_embed

    params["pos_embed"] = interpolate_pos_embed(params["pos_embed"], cfg.num_patches)
    return params


def convert_btadapter(state: Mapping[str, Any], cfg, depth: int = 3, dtype=None) -> Dict:
    """BTAdapter checkpoint naming (reference: stllm/models/eva_btadapter.py
    — BTAdapter_cls / BTAdapter_position / BTAdapter_T.{i} / BTAdapter_S.{i},
    trunk keys as in eva_vit) -> stllm_tpu.models.btadapter params."""
    trunk_state = {k: v for k, v in state.items() if not k.startswith("BTAdapter")}
    params = convert_eva_vit(trunk_state, cfg, dtype=dtype)
    params["btadapter"] = convert_btadapter_branch(
        {k: v for k, v in state.items() if k.startswith("BTAdapter")},
        cfg, depth, dtype=dtype)
    return params


# ---------------------------------------------------------------------------
# HF LLaMA / Vicuna
# ---------------------------------------------------------------------------

def convert_hf_llama(state: Mapping[str, Any], cfg, dtype=None) -> Dict:
    """HF LlamaForCausalLM state_dict -> stllm_tpu.models.llama params."""
    tk = KeyTracker(state, "llama")

    def pfx(key: str) -> str:
        # accept both "model.layers..." and "layers..." roots
        return key if tk.has(key) else key.removeprefix("model.")

    params: Dict = {
        "embed_tokens": tk.take(pfx("model.embed_tokens.weight")),
        "norm": {"scale": tk.take(pfx("model.norm.weight"))},
        "lm_head": {"w": tk.take("lm_head.weight").T},
        "layers": [],
    }
    for i in range(cfg.num_layers):
        pre_full = f"model.layers.{i}"
        pre = pre_full if tk.has(f"{pre_full}.input_layernorm.weight") else f"layers.{i}"
        if not tk.has(f"{pre}.input_layernorm.weight"):
            break
        params["layers"].append(
            {
                "input_norm": {"scale": tk.take(f"{pre}.input_layernorm.weight")},
                "q": _linear(tk, f"{pre}.self_attn.q_proj", bias=False),
                "k": _linear(tk, f"{pre}.self_attn.k_proj", bias=False),
                "v": _linear(tk, f"{pre}.self_attn.v_proj", bias=False),
                "o": _linear(tk, f"{pre}.self_attn.o_proj", bias=False),
                "post_norm": {"scale": tk.take(f"{pre}.post_attention_layernorm.weight")},
                "gate": _linear(tk, f"{pre}.mlp.gate_proj", bias=False),
                "up": _linear(tk, f"{pre}.mlp.up_proj", bias=False),
                "down": _linear(tk, f"{pre}.mlp.down_proj", bias=False),
            }
        )
    tk.finish()
    return _to_dtype(params, dtype if dtype is not None else cfg.dtype)


# ---------------------------------------------------------------------------
# Q-Former (LAVIS/BLIP-2 BERT naming)
# ---------------------------------------------------------------------------

def convert_qformer(state: Mapping[str, Any], cfg, dtype=None,
                    prefix: str = "Qformer.bert.") -> Dict:
    """BLIP-2/InstructBLIP Q-Former state_dict -> stllm_tpu.models.qformer params.

    Handles the LAVIS layout: query_tokens at top level, BERT weights under
    ``Qformer.bert.``, cross-attention every ``cross_attention_freq`` layers.
    """
    tk = KeyTracker(state, "qformer")

    def attn(pre: str) -> Dict:
        return {
            "q": _linear(tk, f"{pre}.self.query"),
            "k": _linear(tk, f"{pre}.self.key"),
            "v": _linear(tk, f"{pre}.self.value"),
            "out": _linear(tk, f"{pre}.output.dense"),
            "out_norm": _norm(tk, f"{pre}.output.LayerNorm"),
        }

    params: Dict = {
        "query_tokens": tk.take("query_tokens"),
        "embeddings": {
            "word": tk.take(f"{prefix}embeddings.word_embeddings.weight", optional=True),
            "position": tk.take(f"{prefix}embeddings.position_embeddings.weight", optional=True),
            "norm": _norm(tk, f"{prefix}embeddings.LayerNorm"),
        },
        "layers": [],
    }
    for i in range(cfg.num_layers):
        pre = f"{prefix}encoder.layer.{i}"
        if not tk.has(f"{pre}.attention.self.query.weight"):
            break
        layer = {
            "attention": attn(f"{pre}.attention"),
            "intermediate_query": _linear(tk, f"{pre}.intermediate_query.dense"),
            "output_query": {
                "dense": _linear(tk, f"{pre}.output_query.dense"),
                "norm": _norm(tk, f"{pre}.output_query.LayerNorm"),
            },
        }
        if tk.has(f"{pre}.crossattention.self.query.weight"):
            layer["crossattention"] = attn(f"{pre}.crossattention")
        if tk.has(f"{pre}.intermediate.dense.weight"):
            layer["intermediate"] = _linear(tk, f"{pre}.intermediate.dense")
            layer["output"] = {
                "dense": _linear(tk, f"{pre}.output.dense"),
                "norm": _norm(tk, f"{pre}.output.LayerNorm"),
            }
        params["layers"].append(layer)
    tk.finish()
    return _to_dtype(params, dtype if dtype is not None else cfg.dtype)


def hf_qformer_to_lavis(state: Mapping[str, Any]) -> Dict[str, Any]:
    """Rename HF (Instruct)BlipQFormerModel keys to the LAVIS layout that
    ``convert_qformer`` consumes (attention.attention -> attention.self,
    embeddings.layernorm -> embeddings.LayerNorm, add Qformer.bert. prefix)."""
    out = {}
    for k, v in state.items():
        nk = k
        nk = nk.replace("attention.attention.", "attention.self.")
        nk = nk.replace("crossattention.attention.", "crossattention.self.")
        nk = nk.replace("embeddings.layernorm.", "embeddings.LayerNorm.")
        if nk != "query_tokens":
            nk = "Qformer.bert." + nk
        out[nk] = v
    return out


# ---------------------------------------------------------------------------
# ST-LLM release checkpoints (partial, strict=False semantics)
# ---------------------------------------------------------------------------

def rename_stllm_keys(state: Mapping[str, Any]) -> Dict[str, Any]:
    """Apply the reference's key surgery: llm_proj -> llama_proj
    (reference: stllm/models/st_llm.py:198-200)."""
    return {k.replace("llm_proj", "llama_proj"): v for k, v in state.items()}


def overlay_stllm_checkpoint(params: Dict, state: Mapping[str, Any], cfg,
                             btadapter_depth: int = 3) -> Dict:
    """Overlay an ST-LLM release / trainer checkpoint onto an existing param
    tree with strict=False semantics (reference: st_llm.py:189-201 — key
    surgery llm_proj->llama_proj, partial load, leftover logging).

    Handles the reference module families: visual_encoder.* (incl BTAdapter_*),
    ln_vision.*, Qformer.* + query_tokens, llama_proj, down_proj/up_proj
    (residual module), mvm_decoder.*; wrapper prefixes 'model.' /
    'stllm_model.' are stripped.
    """
    state = rename_stllm_keys(state)
    flat: Dict[str, np.ndarray] = {}
    for k, v in state.items():
        for pre in ("model.stllm_model.", "stllm_model.", "model."):
            if k.startswith(pre):
                k = k[len(pre):]
                break
        flat[k] = _t(v)

    def sub(prefix: str) -> Dict[str, np.ndarray]:
        return {k[len(prefix):]: v for k, v in flat.items() if k.startswith(prefix)}

    out = dict(params)
    vit_state = sub("visual_encoder.")
    if vit_state:
        has_branch = any(k.startswith("BTAdapter") for k in vit_state)
        trunk_full = "patch_embed.proj.weight" in vit_state
        if trunk_full and has_branch:
            out["vit"] = convert_btadapter(vit_state, cfg.vit, depth=btadapter_depth)
        elif trunk_full:
            out["vit"] = convert_eva_vit(vit_state, cfg.vit)
        elif has_branch:
            # trainable-only checkpoint: just the BTAdapter branch, grafted
            # onto the existing trunk
            vit = dict(out.get("vit") or {})
            vit["btadapter"] = convert_btadapter_branch(
                {k: v for k, v in vit_state.items() if k.startswith("BTAdapter")},
                cfg.vit, btadapter_depth)
            out["vit"] = vit
    if "ln_vision.weight" in flat:
        out["ln_vision"] = {"scale": flat["ln_vision.weight"],
                            "bias": flat["ln_vision.bias"]}
    q_state = {k: v for k, v in flat.items()
               if k.startswith("Qformer.") or k == "query_tokens"}
    if any(k.startswith("Qformer.") for k in q_state):
        out["qformer"] = convert_qformer(q_state, cfg.qformer)
    if "llama_proj.weight" in flat:
        out["llama_proj"] = {"w": flat["llama_proj.weight"].T,
                             "b": flat["llama_proj.bias"]}
    if "down_proj.weight" in flat:
        out["residual"] = {
            "down": {"w": flat["down_proj.weight"].T, "b": flat["down_proj.bias"]},
            "up": {"w": flat["up_proj.weight"].T, "b": flat["up_proj.bias"]},
        }
    if "mvm_decoder.head.weight" in flat:
        out["mvm_decoder"] = {
            "head": {"w": flat["mvm_decoder.head.weight"].T,
                     "b": flat["mvm_decoder.head.bias"]},
            "norm": {"scale": flat["mvm_decoder.norm.weight"],
                     "bias": flat["mvm_decoder.norm.bias"]},
        }
    return out


def convert_btadapter_branch(state: Mapping[str, Any], cfg, depth: int = 3,
                             dtype=None) -> Dict:
    """Just the BTAdapter_* branch keys (trainable-only checkpoints)."""
    tk = KeyTracker(dict(state), "btadapter_branch")
    temp, spatial = [], []
    for i in range(depth):
        t_pre, s_pre = f"BTAdapter_T.{i}", f"BTAdapter_S.{i}"
        temp.append({
            "norm1": _norm(tk, f"{t_pre}.norm1"),
            "qkv": {"w": tk.take(f"{t_pre}.attn.qkv.weight").T},
            "q_bias": tk.take(f"{t_pre}.attn.q_bias"),
            "v_bias": tk.take(f"{t_pre}.attn.v_bias"),
            "proj": _linear(tk, f"{t_pre}.attn.proj"),
            "temporal_fc": _linear(tk, f"{t_pre}.temporal_fc"),
        })
        spatial.append({
            "norm1": _norm(tk, f"{s_pre}.norm1"),
            "qkv": {"w": tk.take(f"{s_pre}.attn.qkv.weight").T},
            "q_bias": tk.take(f"{s_pre}.attn.q_bias"),
            "v_bias": tk.take(f"{s_pre}.attn.v_bias"),
            "proj": _linear(tk, f"{s_pre}.attn.proj"),
            "norm2": _norm(tk, f"{s_pre}.norm2"),
            "fc1": _linear(tk, f"{s_pre}.mlp.fc1"),
            "fc2": _linear(tk, f"{s_pre}.mlp.fc2"),
        })
    branch = {
        "cls": tk.take("BTAdapter_cls"),
        "time_embed": tk.take("BTAdapter_position.weight"),
        "temp": temp,
        "spatial": spatial,
    }
    tk.finish()
    return _to_dtype(branch, dtype if dtype is not None else cfg.dtype)


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth/.bin (torch pickle) or .safetensors file to numpy dict."""
    if str(path).endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "model" in state and isinstance(state["model"], dict):
        state = state["model"]
    return {k: _t(v) for k, v in state.items()}


def load_sharded_hf(model_dir: str) -> Dict[str, np.ndarray]:
    """Merge HF sharded weights (pytorch_model-*-of-*.bin or *.safetensors),
    mirroring the reference's sharded loader (stllm/models/st_llm.py:149-158)."""
    import glob
    import os

    state: Dict[str, np.ndarray] = {}
    shards = sorted(glob.glob(os.path.join(model_dir, "*.safetensors"))) or sorted(
        glob.glob(os.path.join(model_dir, "pytorch_model*.bin"))
    )
    if not shards:
        raise FileNotFoundError(f"no weight shards in {model_dir}")
    for shard in shards:
        state.update(load_torch_file(shard))
    return state
