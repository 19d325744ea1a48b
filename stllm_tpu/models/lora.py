"""LoRA adapters for the LLaMA q/v projections.

TPU-native equivalent of the reference's PEFT integration
(reference: stllm/models/st_llm.py:165-177 — LoraConfig(r, alpha,
target_modules=["q_proj","v_proj"], dropout .05) + the peft forward
monkey-patch in stllm/models/peft_model.py, which only exists to thread the
samples dict through the wrapper and is unnecessary here).

Design: LoRA factors live INSIDE the layer param dict ("q_lora"/"v_lora"
siblings of "q"/"v"); the LLaMA layer adds x@A@B * (alpha/r) when present.
Because params are a plain pytree, "wrap/unwrap/merge" are tree ops:
``merge_lora`` folds the update into the base weight for inference.
PEFT init semantics preserved: A ~ kaiming-uniform(a=sqrt(5)), B = 0 (the
adapter starts as identity). Dropout is a train-time regularizer the jitted
step omits (documented divergence).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

TARGETS = ("q", "v")  # reference target_modules q_proj/v_proj


def lora_scale(layer_lora: Dict) -> float:
    return float(layer_lora["alpha"]) / layer_lora["a"].shape[1]


def add_lora(params: Dict, rng: jax.Array, r: int, alpha: float = 32.0,
             targets: Sequence[str] = TARGETS) -> Dict:
    """Attach LoRA factors to every llama layer (in a copied tree)."""
    llama = dict(params["llama"])
    layers = []
    keys = jax.random.split(rng, len(llama["layers"]) * len(targets))
    ki = iter(keys)
    hidden = llama["embed_tokens"].shape[1]
    for layer in llama["layers"]:
        layer = dict(layer)
        for t in targets:
            if t not in layer and t in ("q", "k", "v") and "qkv" in layer:
                # fused serving tree: adapters still address the split
                # names (applied to the split outputs in _qkv_proj)
                fused = layer["qkv"]
                d_in = hidden
                d_out = (fused.get("w4_scale", fused.get("w_scale"))
                         .shape[-1] // 3)
                adapter_dtype = jnp.bfloat16
                bound = (6.0 / d_in) ** 0.5
                layer[f"{t}_lora"] = {
                    "a": jax.random.uniform(next(ki), (d_in, r), jnp.float32,
                                            -bound, bound
                                            ).astype(adapter_dtype),
                    "b": jnp.zeros((r, d_out), adapter_dtype),
                    "alpha": jnp.asarray(alpha, jnp.float32),
                }
                continue
            base = layer[t]
            if "w" in base:
                d_in, d_out = base["w"].shape
            elif "w4" in base:
                # int4-packed rows are K/2, but per-channel storage may be
                # K-PRE-PADDED for the Pallas kernel (ops/quant.py), so the
                # packed shape cannot recover the true K. All LoRA-eligible
                # projections except `down` consume the hidden vector; for
                # `down` the fan-in is `up`'s fan-out.
                d_out = base["w4"].shape[1]
                if t == "down":
                    up = layer.get("up") or layer.get("gateup")
                    d_in = (up["w4_scale"].shape[-1] // 2
                            if "gateup" in layer else up["w4_scale"].shape[-1])
                else:
                    d_in = hidden
            else:               # w_q / w_q16 int8 forms keep (K, N)
                wq = base.get("w_q", base.get("w_q16"))
                d_in, d_out = wq.shape
            adapter_dtype = (base["w"].dtype if "w" in base
                             else jnp.bfloat16)  # quantized base: bf16 adapters
            bound = (6.0 / d_in) ** 0.5  # kaiming-uniform a=sqrt(5) on (r, d_in)
            layer[f"{t}_lora"] = {
                "a": jax.random.uniform(next(ki), (d_in, r),
                                        jnp.float32, -bound, bound
                                        ).astype(adapter_dtype),
                "b": jnp.zeros((r, d_out), adapter_dtype),
                "alpha": jnp.asarray(alpha, jnp.float32),
            }
        layers.append(layer)
    llama["layers"] = layers
    out = dict(params)
    out["llama"] = llama
    return out


def apply_lora(layer: Dict, name: str, h: jax.Array, base_out: jax.Array) -> jax.Array:
    """base_out + h @ A @ B * alpha/r when the adapter exists."""
    lora = layer.get(f"{name}_lora")
    if lora is None:
        return base_out
    scale = lora["alpha"].astype(jnp.float32) / lora["a"].shape[1]
    delta = (h @ lora["a"]) @ lora["b"]
    return base_out + delta * scale.astype(delta.dtype)


def merge_lora(params: Dict, targets: Sequence[str] = TARGETS) -> Dict:
    """Fold adapters into the base weights and drop them (inference export)."""
    llama = dict(params["llama"])
    layers = []
    for layer in llama["layers"]:
        layer = dict(layer)
        for t in targets:
            lora = layer.pop(f"{t}_lora", None)
            if lora is not None:
                scale = float(lora["alpha"]) / lora["a"].shape[1]
                w = layer[t]["w"].astype(jnp.float32) + (
                    lora["a"].astype(jnp.float32) @ lora["b"].astype(jnp.float32)
                ) * scale
                layer[t] = {**layer[t], "w": w.astype(layer[t]["w"].dtype)}
        layers.append(layer)
    llama["layers"] = layers
    out = dict(params)
    out["llama"] = llama
    return out


def convert_peft_lora(state, params: Dict, dtype=None) -> Dict:
    """Overlay PEFT lora_A/lora_B checkpoint keys
    (base_model.model.model.layers.{i}.self_attn.{q,v}_proj.lora_{A,B}.weight)
    onto the param tree."""
    import numpy as np

    llama = dict(params["llama"])
    layers = [dict(l) for l in llama["layers"]]
    for k, v in state.items():
        if "lora_" not in k:
            continue
        parts = k.split(".")
        i = int(parts[parts.index("layers") + 1])
        proj = [p for p in parts if p.endswith("_proj")][0][0]  # 'q' or 'v'
        ab = "a" if "lora_A" in k else "b"
        arr = np.asarray(v).T  # torch (out,in) -> (in,out)
        tgt = layers[i].setdefault(f"{proj}_lora", {"alpha": jnp.asarray(32.0)})
        tgt[ab] = jnp.asarray(arr, dtype or layers[i][proj]["w"].dtype)
    llama["layers"] = layers
    out = dict(params)
    out["llama"] = llama
    return out
