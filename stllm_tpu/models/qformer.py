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

The decoder/UniLM path is also provided (unused by the ST-LLM main path but
part of the reference surface): ``unilm_attention_mask`` replicates the
seq2seq causal+prefix mask of ``BertModel.get_extended_attention_mask``
(reference: stllm/models/Qformer.py:713-802 — queries attend only queries,
text attends all queries + causal text), and ``qformer_lm_forward`` /
``qformer_lm_generate`` replicate ``BertLMHeadModel`` (reference:
stllm/models/Qformer.py:968-1128): tied-embedding MLM head
(transform dense -> GELU -> LN -> decoder tied to word embeddings + bias),
shifted CE with label_smoothing=0.1 (reference :1079), greedy decode.

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
         kv_mask: Optional[jax.Array], mask: Optional[jax.Array] = None
         ) -> jax.Array:
    b, n, _ = x.shape
    m = kv.shape[1]
    q = linear(attn_params["q"], x).reshape(b, n, cfg.heads, cfg.head_dim)
    k = linear(attn_params["k"], kv).reshape(b, m, cfg.heads, cfg.head_dim)
    v = linear(attn_params["v"], kv).reshape(b, m, cfg.heads, cfg.head_dim)
    out = mha_reference(q, k, v, kv_mask=kv_mask, mask=mask)
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
    self_attn_mask: Optional[jax.Array] = None,  # (B, Q+T, Q+T) bool, True=attend
) -> jax.Array:
    """Returns (B, num_query + T, hidden); callers slice [:, :num_query].

    ``self_attn_mask`` overrides the default bidirectional padding mask with
    a full (from, to) mask — used by the UniLM decoder path
    (unilm_attention_mask)."""
    b = encoder_hidden_states.shape[0]
    emb = params["embeddings"]
    if query_embeds is None:
        query_embeds = jnp.broadcast_to(
            params["query_tokens"], (b, cfg.num_query, cfg.hidden)
        ).astype(cfg.dtype)
    q_len = query_embeds.shape[1]

    if input_ids is not None:
        from stllm_tpu.ops.spmd import constrain_batched

        t = input_ids.shape[1]
        # Pin the embedding-gather output to batch-over-'data' under a mesh:
        # unconstrained, GSPMD replicate-then-repartitions this gather
        # ("Involuntary full rematerialization" in the sharded train step).
        tok = constrain_batched(emb["word"][input_ids].astype(cfg.dtype))
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

    if self_attn_mask is not None:
        self_mask3, self_mask = self_attn_mask.astype(bool), None
    else:
        self_mask3 = None

    for i, layer in enumerate(params["layers"]):
        att = _mha(layer["attention"], x, x, cfg, kv_mask=self_mask,
                   mask=self_mask3)
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


# ---------------------------------------------------------------------------
# UniLM decoder path (reference: stllm/models/Qformer.py:713-802, :968-1128)
# ---------------------------------------------------------------------------

def unilm_attention_mask(attention_mask: jax.Array, query_len: int
                         ) -> jax.Array:
    """Seq2seq causal+prefix self-attention mask.

    Replicates ``BertModel.get_extended_attention_mask(is_decoder=True,
    has_query=True)`` (reference: stllm/models/Qformer.py:713-802): the
    causal triangle is built over the TEXT positions, query rows are
    prepended as ZEROS (queries never attend text), prefix COLUMNS are ones
    (every position attends all queries), and the padding mask multiplies in
    on the to-axis. ``attention_mask``: (B, query_len + T) 1=real. Returns
    (B, query_len + T, query_len + T) boolean, True = attend.
    """
    b, total = attention_mask.shape
    t = total - query_len
    causal = jnp.tril(jnp.ones((t, t), bool))              # text x text
    rows_q = jnp.zeros((query_len, t), bool)               # queries ban text
    right = jnp.concatenate([rows_q, causal], axis=0)      # (Q+T, T)
    left = jnp.ones((total, query_len), bool)              # all attend queries
    full = jnp.concatenate([left, right], axis=1)          # (Q+T, Q+T)
    return full[None] & attention_mask.astype(bool)[:, None, :]


def init_qformer_lm(rng: jax.Array, cfg: QFormerConfig) -> Dict:
    """init_qformer + the BertOnlyMLMHead params (reference Qformer.py's
    ``cls.predictions``: transform dense -> GELU -> LN -> decoder tied to the
    word embeddings, plus a free bias)."""
    k1, k2 = jax.random.split(rng)
    params = init_qformer(k1, cfg, text_input=True)
    params["cls"] = {
        "transform": init_linear(k2, cfg.hidden, cfg.hidden, cfg.dtype),
        "transform_norm": init_layer_norm(cfg.hidden, cfg.dtype),
        "bias": jnp.zeros((cfg.vocab_size,), jnp.float32),
    }
    return params


def qformer_lm_logits(params: Dict, hidden: jax.Array, cfg: QFormerConfig
                      ) -> jax.Array:
    """MLM head over hidden states: transform -> GELU -> LN -> tied decoder.
    Returns fp32 logits (B, T, vocab)."""
    cls = params["cls"]
    h = gelu(linear(cls["transform"], hidden))
    h = layer_norm(cls["transform_norm"], h, cfg.ln_eps)
    w = params["embeddings"]["word"]                       # (vocab, d), tied
    logits = jnp.dot(h.astype(w.dtype), w.T,
                     preferred_element_type=jnp.float32)
    return logits + cls["bias"]


def qformer_lm_forward(
    params: Dict,
    *,
    input_ids: jax.Array,                      # (B, T)
    encoder_hidden_states: jax.Array,          # (B, S_img, encoder_width)
    attention_mask: Optional[jax.Array] = None,   # (B, T) 1=real
    encoder_mask: Optional[jax.Array] = None,
    labels: Optional[jax.Array] = None,        # (B, T), -100 = ignore
    label_smoothing: float = 0.1,              # reference Qformer.py:1079
    cfg: QFormerConfig = INSTRUCT_BLIP_QFORMER,
):
    """BertLMHeadModel forward (reference: stllm/models/Qformer.py:987-1093):
    UniLM-masked decoder pass with query prefix, logits over TEXT positions,
    and (with ``labels``) the shifted next-token CE with label smoothing.
    Returns logits (B, T, vocab) or (loss, logits)."""
    b, t = input_ids.shape
    if attention_mask is None:
        attention_mask = jnp.ones((b, t), jnp.int32)
    full_mask = jnp.concatenate(
        [jnp.ones((b, cfg.num_query), attention_mask.dtype), attention_mask],
        axis=1)
    hidden = qformer_forward(
        params,
        encoder_hidden_states=encoder_hidden_states,
        input_ids=input_ids,
        attention_mask=attention_mask,
        encoder_mask=encoder_mask,
        cfg=cfg,
        self_attn_mask=unilm_attention_mask(full_mask, cfg.num_query),
    )
    logits = qformer_lm_logits(params, hidden[:, cfg.num_query:], cfg)
    if labels is None:
        return logits
    # shifted CE, mean over non-ignored, label_smoothing as in torch
    # CrossEntropyLoss (reference :1078-1083)
    lg = logits[:, :-1].astype(jnp.float32)
    lb = labels[:, 1:]
    valid = lb != -100
    lb_safe = jnp.where(valid, lb, 0)
    logp = jax.nn.log_softmax(lg, axis=-1)
    nll = -jnp.take_along_axis(logp, lb_safe[..., None], axis=-1)[..., 0]
    smooth = -logp.mean(axis=-1)
    per_tok = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    denom = jnp.maximum(valid.sum(), 1)
    loss = jnp.where(valid, per_tok, 0.0).sum() / denom
    return loss, logits


def qformer_lm_generate(
    params: Dict,
    encoder_hidden_states: jax.Array,
    *,
    bos_token_id: int,
    eos_token_id: Optional[int] = None,
    max_new_tokens: int = 20,
    encoder_mask: Optional[jax.Array] = None,
    cfg: QFormerConfig = INSTRUCT_BLIP_QFORMER,
):
    """Greedy decode through the UniLM path (reference BertLMHeadModel
    generation, Qformer.py:1100-1117). Full re-forward per step — this head
    is a parity surface, not a serving path (the ST-LLM main path never
    decodes through the Q-Former; answers come from LLaMA)."""
    b = encoder_hidden_states.shape[0]
    ids = [[bos_token_id] for _ in range(b)]
    done = [False] * b
    for _ in range(max_new_tokens):
        input_ids = jnp.asarray(ids, jnp.int32)
        logits = qformer_lm_forward(
            params, input_ids=input_ids,
            encoder_hidden_states=encoder_hidden_states,
            encoder_mask=encoder_mask, cfg=cfg)
        nxt = jnp.argmax(logits[:, -1], axis=-1)
        for i in range(b):
            tok = int(nxt[i]) if not done[i] else (eos_token_id or 0)
            ids[i].append(tok)
            if eos_token_id is not None and tok == eos_token_id:
                done[i] = True
        if eos_token_id is not None and all(done):
            break
    return [row[1:] for row in ids]
