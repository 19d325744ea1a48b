"""EVA-ViT-g visual encoder, TPU-native.

Re-design of the reference's EVA ViT (reference: stllm/models/eva_vit.py:246-443,
hyperparams at :416-428): patch 14, width 1408, depth 39, 16 heads (head_dim 88),
MLP hidden 6144 (mlp_ratio 4.3637), abs pos embed, pre-norm blocks with
q/v-only qkv bias (k bias fixed at zero), LN eps 1e-6, returns all 257 tokens.

TPU-first choices:
  - NHWC images; patch embedding as reshape+matmul (stride == kernel so a conv
    is just a blocked matmul the MXU loves).
  - flash-attention (Pallas) over tokens, frames batched on the leading axis
    (B·T frames per call — the reference loops DataParallel-style instead).
  - params bf16, LayerNorm stats fp32 (reference keeps fp16 weights + fp32 LN).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

# Epilogue-carried LN in the static-int8 encode (see _vit_blocks_fused_static);
# env hook for A/B benchmarking: "1" fuses both sites, "proj"/"fc2" one site.
# Default OFF from the measured matrix (v5e, 64-frame static encode, fr/s):
# off 432.6 / proj 432.5 / fc2 421.0 / both 419.2 — the proj site is
# exactly neutral on top of the int8-qkv path and the fc2 site loses (the
# K=6144 matmul's k-exit epilogue stalls its longer k-pipeline), so the
# simple per-block path stays the default and the kernel remains available
# for A/Bs.
FUSED_LN = os.environ.get("STLLM_FUSED_LN", "0")
FUSED_LN = {"0": False, "1": "both"}.get(FUSED_LN, FUSED_LN)

# Static-int8 qkv feeding attention (round 3): the qkv matmul epilogue emits
# int8 with calibrated per-third (q/k/v) scales, halving the attention
# kernel's HBM read; "1" = s8 QK^T on the MXU, "bf16" = in-VMEM upcast dot,
# "0" = off (bf16 qkv, round-2 path). Measured (same harness as above):
# int8 dot 432.6 / bf16-upcast 424.2 / off 426.8 fr/s.
INT8_QKT = os.environ.get("STLLM_INT8_QKT", "1")

from stllm_tpu.ops.attention import (
    flash_attention, fused_qkv_attention, fused_qkv_attention_quant,
    fused_qkv_attention_quant_static)
from stllm_tpu.ops.layers import gelu, init_layer_norm, init_linear, layer_norm, linear


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1408
    depth: int = 39
    heads: int = 16
    mlp_hidden: int = 6144  # int(1408 * 4.3637)
    ln_eps: float = 1e-6
    dtype: Any = jnp.bfloat16
    remat: bool = False
    # attention backend: None = auto (pallas on TPU for long sequences)
    use_flash: Optional[bool] = None
    # tanh-approximate GELU: ~11% faster end-to-end on TPU (erf is an
    # expensive transcendental on the VPU); numerics differ from the torch
    # reference's exact GELU at ~1e-3 relative, so parity tests keep False.
    gelu_approx: bool = False
    # Staged token merging (ops/tome.py): ((block_idx, tokens_after), ...)
    # applied BEFORE the given block — e.g. ((13, 193), (26, 145)) runs
    # blocks 0-12 at 257 tokens, 13-25 at 193, 26-38 at 145. () = off.
    # FLOP-reduction lever past the int8 roofline wall; accuracy envelope in
    # TOME_EQUIV.json (script/tome_equivalence.py).
    merge_schedule: tuple = ()
    # Temporal (cross-frame) folding: ((block_idx, group, tokens_after), ...)
    # applied BEFORE the given block — ``group`` adjacent frame rows fold
    # into one super-frame row (ops/tome.py:fold_frames), immediately merged
    # down to ``tokens_after`` so no block ever runs at the concatenated
    # length. Exploits ADJACENT-FRAME redundancy, which spatial merging
    # can't see (each frame row merges independently). Output is unmerged
    # back to per-frame full resolution at trunk exit (the Q-Former
    # interface needs per-frame rows); combine with a merge_schedule entry
    # at block == depth to re-merge spatially for the Q-Former if desired.
    # Folds compound: two (g=2) folds -> 4 frames/row. Requires
    # num_frames % prod(groups) == 0 (pass num_frames to vit_forward).
    temporal_schedule: tuple = ()
    # Named merge level (ops/tome.py MERGE_LEVELS key), or "auto" to pick
    # per video from its measured redundancy (ops/tome.py
    # select_merge_level) at the inference entry points
    # (stllm.encode_video_for_inference, pipeline_serving submit). Concrete
    # names are expanded into the schedule fields at config build
    # (models/zoo.py); only ""/"auto" reach a live config. The jitted trunk
    # reads ONLY the schedule tuples, so "auto" resolves to one compiled
    # program per level actually selected.
    merge_level: str = ""

    @property
    def head_dim(self) -> int:
        return self.width // self.heads

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def seq_len(self) -> int:
        return self.num_patches + 1


EVA_VIT_G = ViTConfig()


def init_vit(rng: jax.Array, cfg: ViTConfig) -> Dict:
    ks = iter(jax.random.split(rng, 4 + 6 * cfg.depth))
    d, h = cfg.width, cfg.mlp_hidden
    patch_dim = cfg.patch_size * cfg.patch_size * 3
    params: Dict = {
        "patch_embed": init_linear(next(ks), patch_dim, d, cfg.dtype),
        "cls_token": jnp.zeros((1, 1, d), cfg.dtype),
        "pos_embed": (jax.random.truncated_normal(next(ks), -2, 2, (1, cfg.seq_len, d)) * 0.02).astype(cfg.dtype),
        "blocks": [],
    }
    for _ in range(cfg.depth):
        params["blocks"].append(
            {
                "norm1": init_layer_norm(d, cfg.dtype),
                "qkv": init_linear(next(ks), d, 3 * d, cfg.dtype, bias=False),
                "q_bias": jnp.zeros((d,), cfg.dtype),
                "v_bias": jnp.zeros((d,), cfg.dtype),
                "proj": init_linear(next(ks), d, d, cfg.dtype),
                "norm2": init_layer_norm(d, cfg.dtype),
                "fc1": init_linear(next(ks), d, h, cfg.dtype),
                "fc2": init_linear(next(ks), h, d, cfg.dtype),
            }
        )
    return params


def quantize_vit_params(params: Dict, free_dense: bool = False) -> Dict:
    """Inference-time W8A8 conversion (ops/quant.py): every block matmul
    (qkv, proj, fc1, fc2) becomes a fused dynamic-quant int8 matmul on TPU.
    Patch embed / norms / pos-embed stay in the dense dtype (tiny or
    precision-critical). The reference has no quantization (fp16 ViT,
    eva_vit.py:440-442) — this is a TPU-native extension; use for encode
    serving where ~2x MXU throughput is worth ~1% feature drift."""
    from stllm_tpu.ops.quant import quantize_linear_params

    out = dict(params)
    branch_dense = []
    if "btadapter" in params:
        # BTAdapter branch (models/btadapter.py): temporal + spatial blocks
        # run their matmuls through ops.layers.linear, which dispatches to
        # quant_linear on quantized dicts — dynamic W8A8 (the branch is ~14%
        # of encode; the trunk gets the static-scale path via
        # calibrate_vit_scales, whose plain-ViT stats are exact for the
        # trunk because the branch never feeds back into it).
        # Quantized FIRST, without freeing: at init the spatial blocks SHARE
        # buffers with the last trunk blocks (init_btadapter copies by
        # reference), so the trunk's streaming free below would delete
        # arrays the branch still needs. Branch dense weights that survive
        # the trunk pass (separately-loaded checkpoints) are freed at the
        # end.
        def q(p):
            if free_dense:
                branch_dense.append(p["w"])
            return quantize_linear_params(p, free_dense=False)

        bt = dict(params["btadapter"])
        bt["temp"] = [
            {**t, **{n: q(t[n]) for n in ("qkv", "proj", "temporal_fc")}}
            for t in bt["temp"]
        ]
        bt["spatial"] = [
            {**sp, **{n: q(sp[n]) for n in ("qkv", "proj", "fc1", "fc2")}}
            for sp in bt["spatial"]
        ]
        out["btadapter"] = bt
    out["blocks"] = []
    for blk in params["blocks"]:
        b = dict(blk)
        for name in ("qkv", "proj", "fc1", "fc2"):
            b[name] = quantize_linear_params(blk[name], free_dense=free_dense)
        out["blocks"].append(b)
    for w in branch_dense:
        if isinstance(w, jax.Array) and not w.is_deleted():
            w.delete()
    return out


def calibrate_vit_scales(params_q: Dict, images: jax.Array, cfg: ViTConfig,
                         margin: float = 1.0) -> Dict:
    """Static-W8A8 calibration: run the dynamic-quant forward on a
    calibration batch, record the per-TENSOR amax of each quantized matmul
    input (qkv_in, fc1_in, fc2_in; the attention output keeps free in-kernel
    dynamic quant), and attach the resulting scales to a copy of
    ``params_q`` as ``block["act_scales"]`` — which switches vit_forward to
    the fully-fused static path (_vit_block_quant_static). ``margin``
    head-rooms the scales; out-of-range activations saturate.

    The per-tensor amax is recovered from the dynamic path's own per-row
    scales (amax = 127 * max(row_scales)), so calibration costs one ordinary
    dynamic-int8 forward. The per-BLOCK stats function is jitted once and
    reused for all depth blocks (identical shapes -> one compilation), which
    keeps calibration compile time negligible next to the encode compile.
    The reference has no quantization at all (fp16 ViT,
    stllm/models/eva_vit.py:440-442); this mirrors standard static-quant
    serving practice on TPU."""
    from stllm_tpu.ops.quant import gelu_quant, layer_norm_quant, quant_matmul_pre

    if images.dtype == jnp.uint8:  # same on-device normalize as encode_img
        from stllm_tpu.data.processors import CLIP_MEAN, CLIP_STD

        mean = jnp.asarray(CLIP_MEAN, jnp.float32) * 255.0
        std = jnp.asarray(CLIP_STD, jnp.float32) * 255.0
        images = ((images.astype(jnp.float32) - mean) / std).astype(cfg.dtype)

    @jax.jit
    def prologue(images):
        x = patchify(images.astype(cfg.dtype), cfg.patch_size)
        x = linear(params_q["patch_embed"], x)
        cls = jnp.broadcast_to(params_q["cls_token"], (x.shape[0], 1, cfg.width)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        return x + params_q["pos_embed"].astype(x.dtype)

    @jax.jit
    def block_stats(block, x):
        hq, hs = layer_norm_quant(block["norm1"], x, cfg.ln_eps)
        qkv_bias = jnp.concatenate(
            [block["q_bias"], jnp.zeros_like(block["q_bias"]), block["v_bias"]])
        qkv = quant_matmul_pre(hq, hs, {**block["qkv"], "b": qkv_bias}, x.dtype)
        oq, os_ = fused_qkv_attention_quant(qkv, cfg.heads, cfg.head_dim)
        x = x + quant_matmul_pre(oq, os_, block["proj"], x.dtype)
        hq2, hs2 = layer_norm_quant(block["norm2"], x, cfg.ln_eps)
        h = quant_matmul_pre(hq2, hs2, block["fc1"], x.dtype)
        gq, gs = gelu_quant(h, approx=cfg.gelu_approx)
        h = quant_matmul_pre(gq, gs, block["fc2"], x.dtype)
        b_, n_, _ = qkv.shape
        attn_amax = jnp.max(  # per-third (q/k/v) amax of the qkv output
            jnp.abs(qkv.astype(jnp.float32).reshape(b_, n_, 3, -1)),
            axis=(0, 1, 3))
        return x + h, {"qkv": 127.0 * jnp.max(hs),
                       "fc1": 127.0 * jnp.max(hs2),
                       "fc2": 127.0 * jnp.max(gs),
                       "attn": attn_amax}

    x = prologue(images)
    stats = []
    for block in params_q["blocks"]:
        x, st = block_stats(block, x)
        stats.append(st)
    out = dict(params_q)
    out["blocks"] = []
    for blk, st in zip(params_q["blocks"], stats):
        b = dict(blk)
        b["act_scales"] = {
            k: jnp.float32(margin) * st[k].astype(jnp.float32) / 127.0
            for k in ("qkv", "fc1", "fc2", "attn")
        }
        out["blocks"].append(b)
    return out


def patchify(images: jax.Array, patch: int) -> jax.Array:
    """(B, H, W, C) -> (B, h*w, patch*patch*C), row-major patches.

    Feature order matches a torch Conv2d(patch, stride=patch) kernel flattened
    as (C, ph, pw) -> so we emit (ph, pw, C) and the converter permutes torch
    weights accordingly.
    """
    b, hh, ww, c = images.shape
    nh, nw = hh // patch, ww // patch
    x = images.reshape(b, nh, patch, nw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, nh, nw, ph, pw, C)
    return x.reshape(b, nh * nw, patch * patch * c)


def _attention(block: Dict, x: jax.Array, cfg: ViTConfig) -> jax.Array:
    b, n, d = x.shape
    qkv_bias = jnp.concatenate(
        [block["q_bias"], jnp.zeros_like(block["q_bias"]), block["v_bias"]]
    )
    qkv_p = dict(block["qkv"])
    qkv_p["b"] = qkv_bias  # k bias fixed at zero (reference: eva_vit.py:79-87)
    qkv = linear(qkv_p, x)
    if cfg.use_flash is None:
        # packed-qkv kernel: no HBM q/k/v split copies around the custom call
        out = fused_qkv_attention(qkv, cfg.heads, cfg.head_dim)
        return linear(block["proj"], out)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, n, cfg.heads, cfg.head_dim)
    k = k.reshape(b, n, cfg.heads, cfg.head_dim)
    v = v.reshape(b, n, cfg.heads, cfg.head_dim)
    out = flash_attention(q, k, v, use_pallas=cfg.use_flash)
    return linear(block["proj"], out.reshape(b, n, d))


def _vit_block_quant(block: Dict, x: jax.Array, cfg: ViTConfig) -> jax.Array:
    """Quantized-block forward with producer-fused activation quantization:
    LayerNorm and GELU emit int8 + per-row scales directly (ops/quant.py),
    skipping the bf16 intermediate + two extra HBM passes per matmul that
    the generic quant_linear path pays. Same math as layer_norm/gelu
    followed by quantize_activations (the fused kernels quantize the fp32
    producer output, so precision is equal-or-better)."""
    from stllm_tpu.ops.quant import (
        gelu_quant, layer_norm_quant, quant_matmul_pre, quantize_activations)

    b, n, d = x.shape
    hq, hs = layer_norm_quant(block["norm1"], x, cfg.ln_eps)
    qkv_bias = jnp.concatenate(
        [block["q_bias"], jnp.zeros_like(block["q_bias"]), block["v_bias"]]
    )
    qkv = quant_matmul_pre(hq, hs, {**block["qkv"], "b": qkv_bias}, x.dtype)
    if cfg.use_flash is None:
        # packed-qkv kernel with in-kernel int8 epilogue: no q/k/v HBM split
        # copies AND the proj input quantization happens in VMEM for free
        oq, os_ = fused_qkv_attention_quant(qkv, cfg.heads, cfg.head_dim)
    else:
        q, k, v = jnp.split(qkv, 3, axis=-1)
        out = flash_attention(
            q.reshape(b, n, cfg.heads, cfg.head_dim),
            k.reshape(b, n, cfg.heads, cfg.head_dim),
            v.reshape(b, n, cfg.heads, cfg.head_dim),
            use_pallas=cfg.use_flash,
        )
        oq, os_ = quantize_activations(out.reshape(b, n, d))
    x = x + quant_matmul_pre(oq, os_, block["proj"], x.dtype)

    hq, hs = layer_norm_quant(block["norm2"], x, cfg.ln_eps)
    h = quant_matmul_pre(hq, hs, block["fc1"], x.dtype)
    gq, gs = gelu_quant(h, approx=cfg.gelu_approx)
    h = quant_matmul_pre(gq, gs, block["fc2"], x.dtype)
    return x + h


def _attn_quant_static(block: Dict, qkv: jax.Array, cfg: ViTConfig):
    """Attention step of the static-int8 block: with calibrated per-third
    qkv scales (act_scales["attn"]) and INT8_QKT on, quantize the qkv matmul
    output to STATIC int8 in its epilogue (one elementwise fusion) and run
    the s8-input packed kernel — half the attention HBM read. Falls back to
    the bf16 packed kernel (in which case XLA dead-code-eliminates the
    quantize). Returns (oq int8, os fp32)."""
    from stllm_tpu.ops.quant import quantize_activations, quantize_static

    b, n, _ = qkv.shape
    sc = block["act_scales"]
    if INT8_QKT != "0" and "attn" in sc and cfg.use_flash is None:
        col_scale = jnp.repeat(sc["attn"].astype(jnp.float32),
                               cfg.heads * cfg.head_dim)
        qkv_q = quantize_static(qkv, col_scale)
        res = fused_qkv_attention_quant_static(
            qkv_q, sc["attn"][0], sc["attn"][1], sc["attn"][2],
            cfg.heads, cfg.head_dim, int8_dot=(INT8_QKT != "bf16"))
        if res is not None:
            return res
    if cfg.use_flash is None:
        return fused_qkv_attention_quant(qkv, cfg.heads, cfg.head_dim)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    out = flash_attention(
        q.reshape(b, n, cfg.heads, cfg.head_dim),
        k.reshape(b, n, cfg.heads, cfg.head_dim),
        v.reshape(b, n, cfg.heads, cfg.head_dim),
        use_pallas=cfg.use_flash,
    )
    return quantize_activations(out.reshape(b, n, qkv.shape[-1] // 3))


def _vit_block_quant_static(block: Dict, x: jax.Array, cfg: ViTConfig) -> jax.Array:
    """int8 block with CALIBRATED per-tensor activation scales
    (block["act_scales"], see calibrate_vit_scales): quantization is
    elementwise, so LayerNorm emits int8 from its own fusion and
    GELU+quantize folds into the fc1 matmul epilogue — no separate
    activation-quant kernels at all (ops/quant.py static section). The
    attention output keeps the free in-kernel dynamic quant."""
    from stllm_tpu.ops.quant import (
        layer_norm_quant_static, quant_matmul_pre, quant_mlp_static)

    b, n, d = x.shape
    sc = block["act_scales"]
    hq = layer_norm_quant_static(block["norm1"], x, sc["qkv"], cfg.ln_eps)
    qkv_bias = jnp.concatenate(
        [block["q_bias"], jnp.zeros_like(block["q_bias"]), block["v_bias"]]
    )
    qkv = quant_matmul_pre(hq, sc["qkv"], {**block["qkv"], "b": qkv_bias},
                           x.dtype)
    oq, os_ = _attn_quant_static(block, qkv, cfg)
    x = x + quant_matmul_pre(oq, os_, block["proj"], x.dtype)

    hq = layer_norm_quant_static(block["norm2"], x, sc["fc1"], cfg.ln_eps)
    h = quant_mlp_static(hq, sc["fc1"], block["fc1"], sc["fc2"], block["fc2"],
                         x.dtype, approx=cfg.gelu_approx)
    return x + h


def _vit_blocks_fused_static(blocks, x: jax.Array, cfg: ViTConfig
                             ) -> Optional[jax.Array]:
    """Static-int8 block pipeline with EPILOGUE-CARRIED LayerNorm (round 3):
    each LN runs inside the k-exit of the s8 matmul that produces its input
    (proj -> norm2, fc2 -> next block's norm1), so the LN stats pass never
    re-reads the residual stream from HBM (ops/quant.py
    quant_matmul_res_ln_static). The loop carries (x, hq) where hq is the
    already-normalized int8 input of the next qkv matmul. Returns None when
    any shape declines the fused kernel (caller runs the unfused loop)."""
    from stllm_tpu.ops.quant import (
        layer_norm_quant_static, quant_fc1_gelu_static, quant_matmul_pre,
        quant_matmul_res_ln_static)

    b, n, d = x.shape
    hq = layer_norm_quant_static(
        blocks[0]["norm1"], x, blocks[0]["act_scales"]["qkv"], cfg.ln_eps)
    for i, block in enumerate(blocks):
        sc = block["act_scales"]
        qkv_bias = jnp.concatenate(
            [block["q_bias"], jnp.zeros_like(block["q_bias"]),
             block["v_bias"]])
        qkv = quant_matmul_pre(hq, sc["qkv"],
                               {**block["qkv"], "b": qkv_bias}, x.dtype)
        oq, os_ = _attn_quant_static(block, qkv, cfg)
        if FUSED_LN in ("both", "proj"):
            fused = quant_matmul_res_ln_static(
                oq, os_, block["proj"], x, block["norm2"], sc["fc1"],
                cfg.ln_eps)
            if fused is None:
                return None
            x, hq = fused
        else:
            x = x + quant_matmul_pre(oq, os_, block["proj"], x.dtype)
            hq = layer_norm_quant_static(block["norm2"], x, sc["fc1"],
                                         cfg.ln_eps)
        gq = quant_fc1_gelu_static(hq, sc["fc1"], block["fc1"], sc["fc2"],
                                   approx=cfg.gelu_approx)
        nxt = blocks[i + 1] if i + 1 < len(blocks) else None
        if nxt is None:
            return x + quant_matmul_pre(gq, sc["fc2"], block["fc2"], x.dtype)
        if FUSED_LN in ("both", "fc2"):
            fused = quant_matmul_res_ln_static(
                gq, sc["fc2"], block["fc2"], x, nxt["norm1"],
                nxt["act_scales"]["qkv"], cfg.ln_eps)
            if fused is None:
                return None
            x, hq = fused
        else:
            x = x + quant_matmul_pre(gq, sc["fc2"], block["fc2"], x.dtype)
            hq = layer_norm_quant_static(nxt["norm1"], x,
                                         nxt["act_scales"]["qkv"], cfg.ln_eps)
    return x


def vit_block(block: Dict, x: jax.Array, cfg: ViTConfig) -> jax.Array:
    if "act_scales" in block:  # static-scale int8 (calibrate_vit_scales)
        return _vit_block_quant_static(block, x, cfg)
    if "w_q" in block["fc1"]:  # int8 inference block (quantize_vit_params)
        return _vit_block_quant(block, x, cfg)
    x = x + _attention(block, layer_norm(block["norm1"], x, cfg.ln_eps), cfg)
    h = layer_norm(block["norm2"], x, cfg.ln_eps)
    act = jax.nn.gelu if cfg.gelu_approx else gelu
    h = linear(block["fc2"], act(linear(block["fc1"], h)))
    return x + h


def vit_forward(params: Dict, images: jax.Array, cfg: ViTConfig, *,
                return_merge_origin: bool = False,
                num_frames: int = 0) -> jax.Array:
    """images: (B, H, W, C) normalized. Returns (B, 257, width) tokens —
    or (B, m, width) under cfg.merge_schedule (staged token merging,
    ops/tome.py). ``return_merge_origin=True`` additionally returns the
    (B, 257) origin map for unmerging (None when merging is off).

    Under cfg.temporal_schedule (cross-frame folding) the trunk runs on
    super-frame rows and the output is UNFOLDED back to per-frame rows:
    (B, 257, width) again — or (B, m, width) when a post-trunk
    merge_schedule entry re-merges spatially for the Q-Former. Pass
    ``num_frames`` so the fold can assert groups never span videos."""
    x = patchify(images.astype(cfg.dtype), cfg.patch_size)
    x = linear(params["patch_embed"], x)
    cls = jnp.broadcast_to(params["cls_token"], (x.shape[0], 1, cfg.width)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(x.dtype)

    schedule = dict(cfg.merge_schedule)
    folds = {blk: (g, m) for blk, g, m in cfg.temporal_schedule}
    depth = len(params["blocks"])
    # a schedule entry past the trunk would otherwise be silently skipped
    # and the bench/eval would report numbers for a DIFFERENT schedule than
    # configured (btadapter_forward has the matching guard)
    assert all(0 <= k <= depth for k in schedule), (
        f"merge_schedule block indices must be in [0, {depth}] "
        f"(== {depth} means post-trunk); got {sorted(schedule)}")
    assert all(0 <= k < depth for k in folds), (
        f"temporal_schedule block indices must be in [0, {depth}); "
        f"got {sorted(folds)}")
    origin = None
    if schedule or folds:
        from stllm_tpu.ops.tome import (
            bipartite_merge, fold_frames, init_merge_state, merge_to,
            unmerge)

        sizes, origin = init_merge_state(x.shape[0], x.shape[1])
    if folds:
        total_g = 1
        for g, _ in folds.values():
            total_g *= g
        t = num_frames if num_frames else x.shape[0]
        assert t % total_g == 0, (
            f"temporal_schedule groups multiply to {total_g}; num_frames "
            f"{t} must divide so folds never span videos")
        assert x.shape[0] % total_g == 0
        n0 = x.shape[1]

    blocks = params["blocks"]
    if (FUSED_LN and not cfg.remat and not schedule and not folds and blocks
            and all("act_scales" in bl for bl in blocks)):
        fused = _vit_blocks_fused_static(blocks, x, cfg)
        if fused is not None:
            return (fused, None) if return_merge_origin else fused
    block_fn = vit_block
    if cfg.remat:
        block_fn = jax.checkpoint(vit_block, static_argnums=(2,))
    for i, block in enumerate(blocks):
        if i in folds:
            g, m = folds[i]
            n_pre = x.shape[1]
            x, sizes, origin = fold_frames(x, sizes, origin, g)
            # contiguous split: B = CLS + reference (first) frame, A = the
            # later frames — cross-frame duplicates are A-to-B matchable
            x, sizes, origin = bipartite_merge(x, sizes, origin, m,
                                               nb=n_pre)
        if i in schedule:
            x, sizes, origin = bipartite_merge(x, sizes, origin, schedule[i])
        x = block_fn(block, x, cfg)
    if folds:
        # unfold to per-frame full resolution (Q-Former needs per-frame rows)
        rows = x.shape[0]
        x = unmerge(x, origin).reshape(rows * total_g, n0, x.shape[-1])
        origin = None
        if len(blocks) in schedule:  # re-merge spatially for the Q-Former
            sizes, origin = init_merge_state(x.shape[0], n0)
            x, sizes, origin = merge_to(x, sizes, origin,
                                        schedule[len(blocks)])
    elif len(blocks) in schedule:  # post-trunk merge (feeds Q-Former fewer tokens)
        x, sizes, origin = merge_to(x, sizes, origin,
                                    schedule[len(blocks)])
    return (x, origin) if return_merge_origin else x


def interpolate_pos_embed(pos_embed: jax.Array, new_num_patches: int) -> jax.Array:
    """Bicubic-resample the patch grid of an abs pos embed to a new resolution
    (reference: stllm/models/eva_vit.py:373-394)."""
    _, n, d = pos_embed.shape
    old = int((n - 1) ** 0.5)
    new = int(new_num_patches ** 0.5)
    if old == new:
        return pos_embed
    cls, grid = pos_embed[:, :1], pos_embed[:, 1:]
    grid = grid.reshape(1, old, old, d)
    grid = jax.image.resize(grid, (1, new, new, d), method="bicubic")
    return jnp.concatenate([cls, grid.reshape(1, new * new, d)], axis=1)
