"""Q-Former: BERT encoder with query tokens + periodic cross-attention.

TPU-native re-design of the reference's vendored LAVIS Q-Former
(reference: stllm/models/Qformer.py — BertLayer FFN routing :378-484,
embeddings :56-108, config from bert-base-uncased via
stllm/models/blip2.py:46-59). Faithful semantics:

  - query tokens (32) are concatenated BEFORE text embeddings; the embedding
    LayerNorm is applied to the concatenation (Qformer.py:101-106);
  - cross-attention (K/V from the 1408-wide ViT sequence) exists on layers
    where ``layer % cross_attention_freq == 0`` and only query positions
    cross-attend (Qformer.py:429-445);
  - query and text positions use SEPARATE FFNs (intermediate_query/output_query
    vs intermediate/output, Qformer.py:449-464);
  - post-norm residuals, LN eps 1e-12, exact GELU (bert-base-uncased).

The decoder/UniLM path (BertLMHeadModel generation) is legacy in the reference
main path and is not re-provided; ST-LLM only uses the encoder.

Static shapes: query_len is a compile-time constant; text is padded and masked.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from stllm_tpu.ops.attention import mha_reference
from stllm_tpu.ops.layers import gelu, init_layer_norm, init_linear, layer_norm, linear


@dataclasses.dataclass(frozen=True)
class QFormerConfig:
    hidden: int = 768
    num_layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    encoder_width: int = 1408
    cross_attention_freq: int = 2
    num_query: int = 32
    vocab_size: int = 30523          # bert-base-uncased + [DEC]
    max_positions: int = 512
    ln_eps: float = 1e-12
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.hidden // self.heads


INSTRUCT_BLIP_QFORMER = QFormerConfig()


def init_qformer(rng: jax.Array, cfg: QFormerConfig, text_input: bool = True) -> Dict:
    """Random init. ``text_input=False`` mirrors the reference stripping word/pos
    embeddings and the text FFN when qformer_text_input is off
    (reference: stllm/models/st_llm.py:277-283)."""
    ks = iter(jax.random.split(rng, 4 + 12 * cfg.num_layers))
    d, m = cfg.hidden, cfg.intermediate

    def attn(kv_width: int) -> Dict:
        return {
            "q": init_linear(next(ks), d, d, cfg.dtype),
            "k": init_linear(next(ks), kv_width, d, cfg.dtype),
            "v": init_linear(next(ks), kv_width, d, cfg.dtype),
            "out": init_linear(next(ks), d, d, cfg.dtype),
            "out_norm": init_layer_norm(d, cfg.dtype),
        }

    params: Dict = {
        "query_tokens": (jax.random.normal(next(ks), (1, cfg.num_query, d)) * 0.02).astype(cfg.dtype),
        "embeddings": {
            "word": (jax.random.normal(next(ks), (cfg.vocab_size, d)) * 0.02).astype(cfg.dtype) if text_input else None,
            "position": (jax.random.normal(next(ks), (cfg.max_positions, d)) * 0.02).astype(cfg.dtype) if text_input else None,
            "norm": init_layer_norm(d, cfg.dtype),
        },
        "layers": [],
    }
    for i in range(cfg.num_layers):
        layer: Dict = {
            "attention": attn(d),
            "intermediate_query": init_linear(next(ks), d, m, cfg.dtype),
            "output_query": {
                "dense": init_linear(next(ks), m, d, cfg.dtype),
                "norm": init_layer_norm(d, cfg.dtype),
            },
        }
        if i % cfg.cross_attention_freq == 0:
            layer["crossattention"] = attn(cfg.encoder_width)
        if text_input:
            layer["intermediate"] = init_linear(next(ks), d, m, cfg.dtype)
            layer["output"] = {
                "dense": init_linear(next(ks), m, d, cfg.dtype),
                "norm": init_layer_norm(d, cfg.dtype),
            }
        params["layers"].append(layer)
    return params


def _mha(attn_params: Dict, x: jax.Array, kv: jax.Array, cfg: QFormerConfig,
         kv_mask: Optional[jax.Array]) -> jax.Array:
    b, n, _ = x.shape
    m = kv.shape[1]
    q = linear(attn_params["q"], x).reshape(b, n, cfg.heads, cfg.head_dim)
    k = linear(attn_params["k"], kv).reshape(b, m, cfg.heads, cfg.head_dim)
    v = linear(attn_params["v"], kv).reshape(b, m, cfg.heads, cfg.head_dim)
    out = mha_reference(q, k, v, kv_mask=kv_mask)
    out = linear(attn_params["out"], out.reshape(b, n, cfg.hidden))
    return out


def _post_norm_residual(dense_out: jax.Array, residual: jax.Array, norm: Dict,
                        eps: float) -> jax.Array:
    return layer_norm(norm, dense_out + residual, eps)


def qformer_forward(
    params: Dict,
    *,
    encoder_hidden_states: jax.Array,          # (B, S_img, encoder_width)
    input_ids: Optional[jax.Array] = None,     # (B, T) padded
    attention_mask: Optional[jax.Array] = None,  # (B, T) 1=real
    encoder_mask: Optional[jax.Array] = None,  # (B, S_img)
    query_embeds: Optional[jax.Array] = None,  # default: params["query_tokens"]
    cfg: QFormerConfig = INSTRUCT_BLIP_QFORMER,
) -> jax.Array:
    """Returns (B, num_query + T, hidden); callers slice [:, :num_query]."""
    b = encoder_hidden_states.shape[0]
    emb = params["embeddings"]
    if query_embeds is None:
        query_embeds = jnp.broadcast_to(
            params["query_tokens"], (b, cfg.num_query, cfg.hidden)
        ).astype(cfg.dtype)
    q_len = query_embeds.shape[1]

    if input_ids is not None:
        t = input_ids.shape[1]
        tok = emb["word"][input_ids].astype(cfg.dtype)
        pos = emb["position"][jnp.arange(t)][None].astype(cfg.dtype)
        x = jnp.concatenate([query_embeds, tok + pos], axis=1)
        if attention_mask is None:
            attention_mask = jnp.ones((b, t), jnp.int32)
        self_mask = jnp.concatenate(
            [jnp.ones((b, q_len), attention_mask.dtype), attention_mask], axis=1
        )
    else:
        x = query_embeds
        self_mask = jnp.ones((b, q_len), jnp.int32)

    # embedding LayerNorm applies to the full (query + text) concatenation
    x = layer_norm(emb["norm"], x, cfg.ln_eps)

    for i, layer in enumerate(params["layers"]):
        att = _mha(layer["attention"], x, x, cfg, kv_mask=self_mask)
        x = _post_norm_residual(att, x, layer["attention"]["out_norm"], cfg.ln_eps)

        q_part, t_part = x[:, :q_len], x[:, q_len:]
        if "crossattention" in layer and layer["crossattention"] is not None:
            ca = _mha(layer["crossattention"], q_part, encoder_hidden_states, cfg,
                      kv_mask=encoder_mask)
            q_part = _post_norm_residual(
                ca, q_part, layer["crossattention"]["out_norm"], cfg.ln_eps
            )

        # separate FFNs for query vs text positions
        q_ffn = linear(layer["output_query"]["dense"],
                       gelu(linear(layer["intermediate_query"], q_part)))
        q_part = _post_norm_residual(q_ffn, q_part, layer["output_query"]["norm"], cfg.ln_eps)
        if t_part.shape[1] > 0:
            t_ffn = linear(layer["output"]["dense"],
                           gelu(linear(layer["intermediate"], t_part)))
            t_part = _post_norm_residual(t_ffn, t_part, layer["output"]["norm"], cfg.ln_eps)
            x = jnp.concatenate([q_part, t_part], axis=1)
        else:
            x = q_part
    return x
