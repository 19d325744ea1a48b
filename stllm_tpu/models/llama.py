"""LLaMA decoder (Vicuna-7B), TPU-native.

Replaces the reference's HF ``LlamaForCausalLM`` backbone
(reference: stllm/models/st_llm.py:45-203 subclasses it; the optional CUDA
flash-attn variant lives at stllm/models/modeling_llama_mem.py). Semantics
follow LLaMA-1 / Vicuna-7B v1.1: RMSNorm (eps 1e-6), RoPE theta 10000,
SwiGLU MLP (intermediate 11008), 32 layers x 32 heads x 128 head_dim,
vocab 32000, untied lm_head.

TPU-first choices:
  - single jittable ``llama_forward`` serving both prefill (Pallas causal flash
    attention) and KV-cache decode (single-step attention against a static
    max-length cache via dynamic_update_slice — no dynamic shapes);
  - ``inputs_embeds`` first-class (ST-LLM always splices video embeddings);
  - bf16 params, fp32 RMSNorm stats and fp32 logits.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from stllm_tpu.ops.attention import flash_attention, mha_reference
from stllm_tpu.ops.layers import init_linear, init_rms_norm, linear, rms_norm, swiglu_mlp
from stllm_tpu.ops.rope import apply_rope, rope_table


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden: int = 4096
    num_layers: int = 32
    heads: int = 32
    intermediate: int = 11008
    max_positions: int = 2048
    rms_eps: float = 1e-6
    rope_theta: float = 10000.0
    dtype: Any = jnp.bfloat16
    remat: bool = False
    use_flash: Optional[bool] = None
    # int8 KV cache (see KVCache docstring) — inference-only memory saver
    kv_int8: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden // self.heads


VICUNA_7B = LlamaConfig()


class KVCache(NamedTuple):
    """Static-shape KV cache, LAYER-MAJOR pytree: k/v are length-``layers``
    tuples of (B, max_len, heads, head_dim) arrays; ``length`` is the number
    of valid positions (per batch row).

    Per-layer tuples instead of one stacked (layers, ...) array on purpose:
    the decode step updates each layer's buffer with a one-token
    dynamic_update_slice, and XLA aliases donated per-layer buffers in
    place — whereas the stacked form forces a slice-out + re-stack that
    copies the WHOLE cache every step (measured +1.35 ms/token on 7B decode,
    ~10%).

    int8 mode (``cfg.kv_int8``): k/v hold per-(token, head) symmetric int8
    values and ``k_scale``/``v_scale`` (tuples of (B, max_len, heads) fp32)
    hold the scales — cache memory drops ~2x (long-video contexts, beam
    fan-out, batched serving), at int8-rounding noise on attention only.
    The reference has no KV-cache compression (HF fp16 cache)."""

    k: Tuple[jax.Array, ...]
    v: Tuple[jax.Array, ...]
    length: jax.Array  # (B,) int32
    k_scale: Optional[Tuple[jax.Array, ...]] = None
    v_scale: Optional[Tuple[jax.Array, ...]] = None


def init_kv_cache(cfg: LlamaConfig, batch: int, max_len: int,
                  dtype=None) -> KVCache:
    shape = (batch, max_len, cfg.heads, cfg.head_dim)
    n = cfg.num_layers
    if cfg.kv_int8:
        return KVCache(
            k=tuple(jnp.zeros(shape, jnp.int8) for _ in range(n)),
            v=tuple(jnp.zeros(shape, jnp.int8) for _ in range(n)),
            length=jnp.zeros((batch,), jnp.int32),
            k_scale=tuple(jnp.ones(shape[:-1], jnp.float32) for _ in range(n)),
            v_scale=tuple(jnp.ones(shape[:-1], jnp.float32) for _ in range(n)),
        )
    dtype = dtype or cfg.dtype
    return KVCache(
        k=tuple(jnp.zeros(shape, dtype) for _ in range(n)),
        v=tuple(jnp.zeros(shape, dtype) for _ in range(n)),
        length=jnp.zeros((batch,), jnp.int32),
    )


def _quant_kv(x: jax.Array):
    """(..., D) -> per-(...)-row int8 values + fp32 scales (...,)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.where(amax == 0.0, 1.0, amax / 127.0)
    return jnp.round(xf / scale).astype(jnp.int8), scale[..., 0]


def _dequant_kv(q: jax.Array, scale: jax.Array, dtype) -> jax.Array:
    return (q.astype(jnp.float32) * scale[..., None]).astype(dtype)


def init_llama(rng: jax.Array, cfg: LlamaConfig) -> Dict:
    ks = iter(jax.random.split(rng, 3 + 7 * cfg.num_layers))
    d, m = cfg.hidden, cfg.intermediate
    params: Dict = {
        "embed_tokens": (jax.random.normal(next(ks), (cfg.vocab_size, d)) * 0.02).astype(cfg.dtype),
        "norm": init_rms_norm(d, cfg.dtype),
        "lm_head": init_linear(next(ks), d, cfg.vocab_size, cfg.dtype, bias=False),
        "layers": [],
    }
    for _ in range(cfg.num_layers):
        params["layers"].append(
            {
                "input_norm": init_rms_norm(d, cfg.dtype),
                "q": init_linear(next(ks), d, d, cfg.dtype, bias=False),
                "k": init_linear(next(ks), d, d, cfg.dtype, bias=False),
                "v": init_linear(next(ks), d, d, cfg.dtype, bias=False),
                "o": init_linear(next(ks), d, d, cfg.dtype, bias=False),
                "post_norm": init_rms_norm(d, cfg.dtype),
                "gate": init_linear(next(ks), d, m, cfg.dtype, bias=False),
                "up": init_linear(next(ks), d, m, cfg.dtype, bias=False),
                "down": init_linear(next(ks), m, d, cfg.dtype, bias=False),
            }
        )
    return params


def _qkv_proj(layer: Dict, h: jax.Array, b: int, s: int, cfg: LlamaConfig):
    """q/k/v projections; a ``qkv`` key holds the three weights fused along
    N (decode-bandwidth form — one weight-stream kernel call instead of
    three). LoRA deltas apply to the split outputs either way."""
    from stllm_tpu.models.lora import apply_lora

    if "qkv" in layer:
        q, k, v = jnp.split(linear(layer["qkv"], h), 3, axis=-1)
    else:
        q, k, v = (linear(layer["q"], h), linear(layer["k"], h),
                   linear(layer["v"], h))
    q = apply_lora(layer, "q", h, q).reshape(b, s, cfg.heads, cfg.head_dim)
    k = apply_lora(layer, "k", h, k).reshape(b, s, cfg.heads, cfg.head_dim)
    v = apply_lora(layer, "v", h, v).reshape(b, s, cfg.heads, cfg.head_dim)
    return q, k, v


def _layer(
    layer: Dict,
    x: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    positions: jax.Array,
    attn_mask: Optional[jax.Array],
    cfg: LlamaConfig,
    cache_kv: Optional[Tuple[jax.Array, jax.Array]],
    cache_len: Optional[jax.Array],
) -> Tuple[jax.Array, Optional[Tuple[jax.Array, jax.Array]]]:
    b, s, d = x.shape
    h = rms_norm(layer["input_norm"], x, cfg.rms_eps)
    q, k, v = _qkv_proj(layer, h, b, s, cfg)
    q = apply_rope(q, cos, sin, positions)
    k = apply_rope(k, cos, sin, positions)

    if cache_kv is None:
        # prefill: causal attention with padding mask
        out = flash_attention(
            q, k, v, causal=True, kv_mask=attn_mask, use_pallas=cfg.use_flash
        )
        new_cache = (k, v)
    else:
        # decode / prefill-into-cache: write new k/v at each row's offset, then
        # attend causally against absolute positions (kv_pos <= cache_len + i).
        quantized = len(cache_kv) == 4
        if quantized:
            ck, cv, cks, cvs = cache_kv  # int8 values + (B, max_len, H) scales
        else:
            ck, cv = cache_kv            # (B, max_len, H, D)

        def write(c, new):
            def row(c_row, new_row, off):
                return jax.lax.dynamic_update_slice(c_row, new_row.astype(c_row.dtype), (off, 0, 0))
            return jax.vmap(row)(c, new, cache_len)

        if quantized:
            kq, ks = _quant_kv(k)
            vq, vs = _quant_kv(v)
            ck, cv = write(ck, kq), write(cv, vq)

            def write_scale(c, new):
                def row(c_row, new_row, off):
                    return jax.lax.dynamic_update_slice(c_row, new_row, (off, 0))
                return jax.vmap(row)(c, new, cache_len)

            cks, cvs = write_scale(cks, ks), write_scale(cvs, vs)
            ak, av = _dequant_kv(ck, cks, x.dtype), _dequant_kv(cv, cvs, x.dtype)
        else:
            ck, cv = write(ck, k), write(cv, v)
            ak, av = ck, cv
        max_len = ck.shape[1]
        kv_pos = jnp.arange(max_len)[None, None, :]                    # (1,1,max)
        q_abs = cache_len[:, None, None] + jnp.arange(s)[None, :, None]  # (B,s,1)
        mask = kv_pos <= q_abs
        out = mha_reference(q, ak, av, mask=mask)
        new_cache = (ck, cv, cks, cvs) if quantized else (ck, cv)

    out = linear(layer["o"], out.reshape(b, s, d))
    x = x + out
    h2 = rms_norm(layer["post_norm"], x, cfg.rms_eps)
    x = x + swiglu_mlp(layer, h2)
    return x, new_cache


def llama_forward(
    params: Dict,
    *,
    input_ids: Optional[jax.Array] = None,
    inputs_embeds: Optional[jax.Array] = None,
    attention_mask: Optional[jax.Array] = None,  # (B, S) validity of the inputs
    positions: Optional[jax.Array] = None,        # (B, S) absolute positions
    cache: Optional[KVCache] = None,
    cfg: LlamaConfig = VICUNA_7B,
) -> Tuple[jax.Array, Optional[KVCache]]:
    """Returns (hidden_states (B,S,d), updated cache or None).

    Prefill: pass cache=None (no cache kept) or a fresh ``init_kv_cache`` —
    with a cache the computed k/v are written at offset 0..S and length set.
    Decode: pass the running cache; positions default to cache.length.
    """
    if inputs_embeds is None:
        inputs_embeds = params["embed_tokens"][input_ids].astype(cfg.dtype)
    x = inputs_embeds.astype(cfg.dtype)
    b, s, _ = x.shape

    cos, sin = rope_table(cfg.head_dim, cfg.max_positions, cfg.rope_theta)
    if positions is None:
        if cache is not None:
            positions = cache.length[:, None] + jnp.arange(s)[None, :]
        else:
            positions = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))

    quantized = cache is not None and cache.k_scale is not None
    new_k, new_v, new_ks, new_vs = [], [], [], []
    layer_fn = _layer
    if cfg.remat:
        layer_fn = jax.checkpoint(_layer, static_argnums=(6,))

    for i, layer in enumerate(params["layers"]):
        if cache is None:
            cache_kv = None
        elif quantized:
            cache_kv = (cache.k[i], cache.v[i],
                        cache.k_scale[i], cache.v_scale[i])
        else:
            cache_kv = (cache.k[i], cache.v[i])
        x, updated = layer_fn(
            layer, x, cos, sin, positions, attention_mask, cfg,
            cache_kv, cache.length if cache is not None else None,
        )
        if cache is not None:
            new_k.append(updated[0])
            new_v.append(updated[1])
            if quantized:
                new_ks.append(updated[2])
                new_vs.append(updated[3])

    x = rms_norm(params["norm"], x, cfg.rms_eps)
    new_cache = None
    if cache is not None:
        valid = (
            attention_mask.sum(axis=-1).astype(jnp.int32)
            if attention_mask is not None
            else jnp.full((b,), s, jnp.int32)
        )
        new_cache = KVCache(
            k=tuple(new_k), v=tuple(new_v),
            length=cache.length + valid,
            k_scale=tuple(new_ks) if quantized else None,
            v_scale=tuple(new_vs) if quantized else None,
        )
    return x, new_cache


def llama_decode_prefix(
    params: Dict,
    inputs_embeds: jax.Array,      # (B, 1, d) — one new token per beam/row
    prefix: KVCache,               # (layers, P, S, H, D) shared prompt cache(s)
    gen: KVCache,                  # (layers, B, G, H, D) per-row generated cache
    cfg: LlamaConfig,
) -> Tuple[jax.Array, KVCache]:
    """Single-token decode against SHARED prompt prefixes plus per-row
    generated caches — beam search stores each prompt's KV once instead of
    num_beams times (the reference's HF beam replicates the whole cache;
    on one 16 GB chip that OOMs 7B at beam 5 x 512-token prompts).

    GROUPED form: B = P * k rows, row r attends prefix row r // k. P = 1 is
    single-prompt beam search; P > 1 is the batched-eval form (P videos x
    k beams advancing in ONE program — the reference VideoQA protocol is
    beam 5 per video, reference: stllm/test/qabench/msvd_qa.py:108-115).
    The beam axis enters the prefix attention only as an einsum broadcast,
    never as a materialized copy.

    Attention concatenates the two score segments before one softmax, so the
    result is bit-equivalent to attending over a physically-replicated cache.
    Returns (hidden (B, 1, d), updated gen cache).
    """
    x = inputs_embeds.astype(cfg.dtype)
    b, s, d = x.shape
    assert s == 1, "prefix decode is single-token"
    p = prefix.k[0].shape[0]
    assert b % p == 0, (b, p)
    kr = b // p
    prefix_len = prefix.length                          # (P,) per-video
    plen_rows = jnp.repeat(prefix_len, kr)              # (B,)
    positions = (plen_rows + gen.length)[:, None]       # (B, 1) absolute
    cos, sin = rope_table(cfg.head_dim, cfg.max_positions, cfg.rope_theta)

    s_p = prefix.k[0].shape[1]
    g_max = gen.k[0].shape[1]
    mask_p = (jnp.arange(s_p)[None, :]
              < prefix_len[:, None])[:, None, None, :]  # (P,1,1,S)
    mask_g = jnp.arange(g_max)[None, :] <= gen.length[:, None]      # (B,G)

    quantized = prefix.k_scale is not None
    new_k, new_v, new_ks, new_vs = [], [], [], []
    for i, layer in enumerate(params["layers"]):
        h = rms_norm(layer["input_norm"], x, cfg.rms_eps)
        q, k, v = _qkv_proj(layer, h, b, s, cfg)
        q = apply_rope(q, cos, sin, positions)
        k = apply_rope(k, cos, sin, positions)

        if quantized:
            k, ks = _quant_kv(k)
            v, vs = _quant_kv(v)

        gk = jax.vmap(lambda c, n, off: jax.lax.dynamic_update_slice(
            c, n.astype(c.dtype), (off, 0, 0)))(gen.k[i], k, gen.length)
        gv = jax.vmap(lambda c, n, off: jax.lax.dynamic_update_slice(
            c, n.astype(c.dtype), (off, 0, 0)))(gen.v[i], v, gen.length)
        new_k.append(gk)
        new_v.append(gv)
        if quantized:
            gks = jax.vmap(lambda c, n, off: jax.lax.dynamic_update_slice(
                c, n, (off, 0)))(gen.k_scale[i], ks, gen.length)
            gvs = jax.vmap(lambda c, n, off: jax.lax.dynamic_update_slice(
                c, n, (off, 0)))(gen.v_scale[i], vs, gen.length)
            new_ks.append(gks)
            new_vs.append(gvs)
            pk_i = _dequant_kv(prefix.k[i], prefix.k_scale[i], x.dtype)
            pv_i = _dequant_kv(prefix.v[i], prefix.v_scale[i], x.dtype)
            gk_i = _dequant_kv(gk, gks, x.dtype)
            gv_i = _dequant_kv(gv, gvs, x.dtype)
        else:
            pk_i, pv_i, gk_i, gv_i = prefix.k[i], prefix.v[i], gk, gv

        # (P, kr, H, 1, S_p) + (B, H, 1, G): one softmax over both segments
        qt = q.transpose(0, 2, 1, 3)                    # (B, H, 1, D)
        qg = qt.reshape(p, kr, cfg.heads, 1, cfg.head_dim)
        pk = pk_i.transpose(0, 2, 1, 3)                 # (P, H, S_p, D)
        pv = pv_i.transpose(0, 2, 1, 3)
        gkt = gk_i.transpose(0, 2, 1, 3)
        gvt = gv_i.transpose(0, 2, 1, 3)
        scale = cfg.head_dim ** -0.5
        s_pfx = (jnp.einsum("pbhqd,phkd->pbhqk", qg, pk)
                 * scale).astype(jnp.float32)           # (P, kr, H, 1, S)
        s_gen = (jnp.einsum("bhqd,bhkd->bhqk", qt, gkt)
                 * scale).astype(jnp.float32)           # (B, H, 1, G)
        s_pfx = jnp.where(mask_p[:, None], s_pfx, -1e30)
        s_gen = jnp.where(mask_g[:, None, None, :], s_gen, -1e30)
        logits = jnp.concatenate(
            [s_pfx.reshape(b, cfg.heads, 1, s_p), s_gen], axis=-1)
        w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        w_p, w_g = w[..., :s_p], w[..., s_p:]
        out = (jnp.einsum("pbhqk,phkd->pbhqd",
                          w_p.reshape(p, kr, cfg.heads, 1, s_p), pv
                          ).reshape(b, cfg.heads, 1, cfg.head_dim)
               + jnp.einsum("bhqk,bhkd->bhqd", w_g, gvt))
        out = out.transpose(0, 2, 1, 3).reshape(b, s, d)

        x = x + linear(layer["o"], out)
        h2 = rms_norm(layer["post_norm"], x, cfg.rms_eps)
        x = x + swiglu_mlp(layer, h2)

    x = rms_norm(params["norm"], x, cfg.rms_eps)
    new_gen = KVCache(k=tuple(new_k), v=tuple(new_v),
                      length=gen.length + 1,
                      k_scale=tuple(new_ks) if quantized else None,
                      v_scale=tuple(new_vs) if quantized else None)
    return x, new_gen


def quantize_llama_params(params: Dict, free_dense: bool = False,
                          a16: bool = False) -> Dict:
    """Inference-time W8A8 conversion (ops/quant.py) of every decoder-layer
    matmul (q/k/v/o/gate/up/down — 96% of weight bytes on 7B). Embeddings,
    lm_head and norms stay dense: the head drives token choice directly and
    is kept at full precision (standard int8-LLM practice). Decode is
    weight-bandwidth-bound, so halving weight bytes is a direct latency win;
    prefill additionally gets the ~1.65x int8 MXU rate. The reference has no
    quantization (fp16 HF LLaMA; its 4/8-bit hooks are unused plumbing,
    reference: stllm/train/train_hf.py:238-241).

    ``free_dense=True`` deletes each dense weight buffer as soon as its
    quantized copy exists — required to convert a 7B tree in place on a
    16 GB chip (dense+quantized both resident would OOM). The input tree is
    unusable afterwards.

    ``a16=True`` marks every converted linear for the weight-only
    differentiable form (ops/quant.py:w8a16_matmul) — the QLoRA-style
    frozen-base configuration for training with a quantized LLM: int8
    weight bytes, bf16 activations, gradients flow w.r.t. activations."""
    from stllm_tpu.ops.quant import quantize_linear_params

    out = dict(params)
    out["layers"] = []
    for layer in params["layers"]:
        l = dict(layer)
        for name in ("q", "k", "v", "o", "gate", "up", "down"):
            l[name] = quantize_linear_params(layer[name], free_dense=free_dense)
            if a16:  # rename: the w_q16 KEY selects the a16 form statically
                l[name]["w_q16"] = l[name].pop("w_q")
        out["layers"].append(l)
    return out


def quantize_llama_params_int4(params: Dict, group: Optional[int] = 128,
                               free_dense: bool = False,
                               quant_head: bool = False,
                               fuse: bool = False) -> Dict:
    """W4A16 conversion of the decoder-layer matmuls (ops/quant.py int4
    section): int4 PACKED weight bytes with bf16 compute — decode is
    weight-bandwidth-bound, so halving the bytes halves the per-token
    weight-read floor again vs int8 (~8.5 -> ~4.3 ms on 7B). ``group``
    selects per-group scales along K (tighter, default 128); ``group=None``
    uses per-output-channel scales (scales fold into the dot epilogue).
    Embeddings / norms stay dense; ``quant_head=True`` additionally stores
    the lm_head as weight-only int8 (``w_q16`` — halves the 262 MB/token
    head read; logits stay fp32-accumulated, see ``lm_head``).

    ``fuse=True`` packs q|k|v and gate|up each as ONE weight along N (the
    ``qkv``/``gateup`` layer keys) — 4 weight-stream kernel calls per layer
    instead of 7; measured 0.53 ms/token on the 7B matmul skeleton
    (script/probe_decode_budget.py w4 vs w4fuse). Per-output-channel scales
    make the fused math bit-identical to unfused. Layers carrying unmerged
    LoRA adapters are left unfused (adapters address the split names;
    merge_lora first for serving)."""
    from stllm_tpu.ops.quant import (
        quantize_linear_params, quantize_linear_params_int4)

    out = dict(params)
    out["layers"] = []
    for layer in params["layers"]:
        l = dict(layer)
        fusable = fuse and not any(k.endswith("_lora") for k in layer)
        plain = ("q", "k", "v", "o", "gate", "up", "down")
        if fusable:
            for names, fused_name in ((("q", "k", "v"), "qkv"),
                                      (("gate", "up"), "gateup")):
                assert all(layer[n].get("b") is None or "b" not in layer[n]
                           for n in names)
                w = jnp.concatenate([layer[n]["w"] for n in names], axis=1)
                l[fused_name] = quantize_linear_params_int4(
                    {"w": w}, group=group, free_dense=True)
                for n in names:
                    if free_dense and isinstance(layer[n]["w"], jax.Array):
                        layer[n]["w"].delete()
                    del l[n]
            plain = ("o", "down")
        for name in plain:
            l[name] = quantize_linear_params_int4(
                layer[name], group=group, free_dense=free_dense)
        out["layers"].append(l)
    if quant_head:
        h = quantize_linear_params(params["lm_head"], free_dense=free_dense)
        out["lm_head"] = {"w_q16": h.pop("w_q"), "w_scale": h["w_scale"]}
    return out


def lm_head(params: Dict, hidden: jax.Array) -> jax.Array:
    """Logits in fp32 (matmul in the param dtype with fp32 accumulation —
    upcasting the operands would run an 8x-slower fp32 MXU matmul).
    Accepts the weight-only int8 form (``w_q16`` key, see quant_head in the
    quantizers): per-token decode reads 262 MB of bf16 head weights
    (~0.32 ms on v5e), halved by int8 storage; logits keep bf16-grade
    accuracy (weights rounded, activations untouched)."""
    head = params["lm_head"]
    if "w_q16" in head:
        # int8 codes upcast into the dot (convert-folded), logits kept fp32
        y = jax.lax.dot_general(
            hidden.astype(jnp.bfloat16), head["w_q16"].astype(jnp.bfloat16),
            (((hidden.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return y * head["w_scale"].astype(jnp.float32)
    w = head["w"]
    return jnp.dot(hidden.astype(w.dtype), w,
                   preferred_element_type=jnp.float32)


def prefill_with_cache(
    params: Dict,
    inputs_embeds: jax.Array,
    attention_mask: jax.Array,
    max_len: int,
    cfg: LlamaConfig,
) -> Tuple[jax.Array, KVCache]:
    """Run prefill and return (hidden, cache) where the cache holds the prompt.

    Prompts must be RIGHT-padded; cache.length = per-row valid count so decode
    writes land immediately after each row's real prompt.
    """
    b, s, _ = inputs_embeds.shape
    cache = init_kv_cache(cfg, b, max_len)
    # fresh cache (length 0): k/v writes land at offset 0, attention is causal
    return llama_forward(
        params,
        inputs_embeds=inputs_embeds,
        attention_mask=attention_mask,
        cache=cache,
        cfg=cfg,
    )
