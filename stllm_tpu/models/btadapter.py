"""BTAdapter: temporal branch riding the frozen EVA-ViT trunk.

TPU-native re-design of the reference's BTAdapter ViT
(reference: stllm/models/eva_btadapter.py:46-317). Semantics preserved:

  - the trunk is the plain EVA ViT run per frame on the (B*T) axis;
  - over the LAST ``depth`` trunk blocks a parallel branch accumulates: each
    branch layer adds the current trunk activations into the branch state,
    then runs temporal attention (per patch location across T frames, with a
    ZERO-init ``temporal_fc`` so the branch starts as identity —
    eva_btadapter.py:283-310) followed by a spatial EVA block whose weights
    are INITIALIZED FROM the corresponding trunk block (:89-99);
  - the branch keeps ONE cls token (mean of per-frame trunk cls) and patch
    tokens in patch-major/time-minor layout ``(p t)`` (:186-231);
  - branch init adds the trunk's spatial pos-embed again plus a learned
    temporal position embedding of 64 frames (:209-231);
  - output = (trunk + branch-broadcast-per-frame) / 2, shape (B*T, L, D)
    (:179-184).

Deterministic: the reference's DropPath (linspace 0..0.1 over branch layers,
eva_btadapter.py:80) is a train-time regularizer and is omitted; the
reference's tube-masking path is dead code (TubeMaskingGenerator is undefined
there — SURVEY.md §2.4) and is not reproduced.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from stllm_tpu.models.vit import ViTConfig, init_vit, patchify, vit_block, _attention
from stllm_tpu.ops.attention import fused_qkv_attention_quant, mha_reference
from stllm_tpu.ops.layers import gelu, init_layer_norm, init_linear, layer_norm, linear

MAX_BTADAPTER_FRAMES = 64  # learned temporal embedding size (eva_btadapter.py:84)


def init_btadapter(rng: jax.Array, cfg: ViTConfig, depth: int = 3) -> Dict:
    """Trunk params + ``btadapter`` subtree. Spatial blocks copy the last
    ``depth`` trunk blocks (reference init_weights, eva_btadapter.py:89-99);
    temporal blocks get a zero temporal_fc; the temporal position embedding is
    N(0,1) like torch nn.Embedding's default."""
    k_trunk, k_branch = jax.random.split(rng)
    params = init_vit(k_trunk, cfg)
    d = cfg.width
    ks = iter(jax.random.split(k_branch, 2 + 2 * depth))
    temp = []
    for _ in range(depth):
        temp.append(
            {
                "norm1": init_layer_norm(d, cfg.dtype),
                "qkv": init_linear(next(ks), d, 3 * d, cfg.dtype, bias=False),
                "q_bias": jnp.zeros((d,), cfg.dtype),
                "v_bias": jnp.zeros((d,), cfg.dtype),
                "proj": init_linear(next(ks), d, d, cfg.dtype),
                "temporal_fc": {
                    "w": jnp.zeros((d, d), cfg.dtype),
                    "b": jnp.zeros((d,), cfg.dtype),
                },
            }
        )
    # REAL copies, not aliases: the trunk is frozen while the branch trains,
    # so a shared buffer would appear on both sides of the partitioned train
    # state and fail jit donation ("attempt to donate the same buffer
    # twice"). The reference also copies by value (load_state_dict in
    # init_weights, eva_btadapter.py:89-99).
    spatial = jax.tree_util.tree_map(
        lambda x: jnp.array(x, copy=True), params["blocks"][-depth:])
    params["btadapter"] = {
        "cls": jnp.zeros((1, 1, d), cfg.dtype),
        "time_embed": jax.random.normal(next(ks), (MAX_BTADAPTER_FRAMES, d)).astype(cfg.dtype),
        "temp": temp,
        "spatial": spatial,
    }
    return params


def _temporal_layer(layer: Dict, x: jax.Array, b: int, t: int, cfg: ViTConfig) -> jax.Array:
    """Per-patch attention across frames (reference BTAdapter_Temp,
    eva_btadapter.py:295-310). x: (B, 1 + P*T, D) patch-major."""
    cls, q = x[:, :1], x[:, 1:]
    d = x.shape[-1]
    p = q.shape[1] // t
    qt = q.reshape(b * p, t, d)
    att = _attention(layer, layer_norm(layer["norm1"], qt, cfg.ln_eps), cfg)
    att = linear(layer["temporal_fc"], att)
    out = att.reshape(b, p * t, d) + q
    return jnp.concatenate([cls, out], axis=1)


def _spatial_layer(layer: Dict, x: jax.Array, b: int, t: int, cfg: ViTConfig) -> jax.Array:
    """Per-frame EVA block with the branch cls shared across frames
    (reference BTAdapter_Spatial, eva_btadapter.py:261-281)."""
    residual = x
    d = x.shape[-1]
    cls, q = x[:, :1], x[:, 1:]
    p = q.shape[1] // t
    cls_t = jnp.repeat(cls, t, axis=0)                                  # (B*T, 1, D)
    q_t = q.reshape(b, p, t, d).transpose(0, 2, 1, 3).reshape(b * t, p, d)
    h = jnp.concatenate([cls_t, q_t], axis=1)
    att = _attention(layer, layer_norm(layer["norm1"], h, cfg.ln_eps), cfg)
    cls_out = att[:, :1].reshape(b, t, 1, d).mean(axis=1)
    sp = att[:, 1:].reshape(b, t, p, d).transpose(0, 2, 1, 3).reshape(b, p * t, d)
    x = residual + jnp.concatenate([cls_out, sp], axis=1)
    h = layer_norm(layer["norm2"], x, cfg.ln_eps)
    return x + linear(layer["fc2"], gelu(linear(layer["fc1"], h)))


def _qkv_with_bias(layer: Dict) -> Dict:
    qkv_bias = jnp.concatenate(
        [layer["q_bias"], jnp.zeros_like(layer["q_bias"]), layer["v_bias"]])
    return {**layer["qkv"], "b": qkv_bias}


def _temporal_layer_quant_static(layer: Dict, x: jax.Array, b: int, t: int,
                                 cfg: ViTConfig) -> jax.Array:
    """Static-int8 temporal layer (branch counterpart of vit.py's
    _vit_block_quant_static): LN emits int8 in one fusion, all three matmuls
    (qkv, proj, temporal_fc) run s8xs8 with calibrated per-tensor input
    scales. Attention itself stays XLA bf16 — at (B*P, T) the sequences are
    tiny and the score math is negligible."""
    from stllm_tpu.ops.quant import (
        layer_norm_quant_static, quant_matmul_pre, quantize_static)

    sc = layer["act_scales"]
    cls, q = x[:, :1], x[:, 1:]
    d = x.shape[-1]
    p = q.shape[1] // t
    qt = q.reshape(b * p, t, d)
    hq = layer_norm_quant_static(layer["norm1"], qt, sc["qkv"], cfg.ln_eps)
    qkv = quant_matmul_pre(hq, sc["qkv"], _qkv_with_bias(layer), x.dtype)
    qh, kh, vh = jnp.split(qkv, 3, axis=-1)
    bp = b * p
    out = mha_reference(
        qh.reshape(bp, t, cfg.heads, cfg.head_dim),
        kh.reshape(bp, t, cfg.heads, cfg.head_dim),
        vh.reshape(bp, t, cfg.heads, cfg.head_dim),
    ).reshape(bp, t, d)
    oq = quantize_static(out, sc["proj"])
    att = quant_matmul_pre(oq, sc["proj"], layer["proj"], x.dtype)
    aq = quantize_static(att, sc["temporal_fc"])
    att = quant_matmul_pre(aq, sc["temporal_fc"], layer["temporal_fc"], x.dtype)
    out = att.reshape(b, p * t, d) + q
    return jnp.concatenate([cls, out], axis=1)


def _spatial_layer_quant_static(layer: Dict, x: jax.Array, b: int, t: int,
                                cfg: ViTConfig) -> jax.Array:
    """Static-int8 spatial layer: the per-frame view (B*T, 1+P, D) has
    exactly the trunk block geometry, so it takes the same packed-qkv quant
    attention kernel + static LN/GELU fusions as _vit_block_quant_static."""
    from stllm_tpu.ops.quant import (
        layer_norm_quant_static, quant_matmul_pre, quant_mlp_static)

    sc = layer["act_scales"]
    residual = x
    d = x.shape[-1]
    cls, q = x[:, :1], x[:, 1:]
    p = q.shape[1] // t
    cls_t = jnp.repeat(cls, t, axis=0)
    q_t = q.reshape(b, p, t, d).transpose(0, 2, 1, 3).reshape(b * t, p, d)
    h = jnp.concatenate([cls_t, q_t], axis=1)                  # (B*T, 1+P, D)
    hq = layer_norm_quant_static(layer["norm1"], h, sc["qkv"], cfg.ln_eps)
    qkv = quant_matmul_pre(hq, sc["qkv"], _qkv_with_bias(layer), x.dtype)
    if "attn" in sc:  # static-int8 qkv attention (vit.py round 3)
        from stllm_tpu.models.vit import _attn_quant_static

        oq, os_ = _attn_quant_static(layer, qkv, cfg)
    else:
        oq, os_ = fused_qkv_attention_quant(qkv, cfg.heads, cfg.head_dim)
    att = quant_matmul_pre(oq, os_, layer["proj"], x.dtype)
    cls_out = att[:, :1].reshape(b, t, 1, d).mean(axis=1)
    sp = att[:, 1:].reshape(b, t, p, d).transpose(0, 2, 1, 3).reshape(b, p * t, d)
    x = residual + jnp.concatenate([cls_out, sp], axis=1)
    hq2 = layer_norm_quant_static(layer["norm2"], x, sc["fc1"], cfg.ln_eps)
    return x + quant_mlp_static(hq2, sc["fc1"], layer["fc1"], sc["fc2"],
                                layer["fc2"], x.dtype, approx=cfg.gelu_approx)


def calibrate_btadapter_scales(params_q: Dict, images: jax.Array,
                               cfg: ViTConfig, num_frames: int,
                               margin: float = 1.0) -> Dict:
    """Static-W8A8 calibration for trunk AND branch.

    Trunk scales come from vit.calibrate_vit_scales (exact for the trunk —
    the branch never feeds back into it, reference eva_btadapter.py:147-184).
    Branch scales are then collected by replaying the branch forward over
    the static-trunk activations, recording per-tensor amax of each branch
    matmul input in fp32 (one extra pass over the calibration clip; the
    branch is 3+3 layers, so per-layer jitted stats compile in seconds).
    Returns params with ``act_scales`` attached to every trunk block and
    branch layer — btadapter_forward then takes the fully-static path."""
    from stllm_tpu.models.vit import calibrate_vit_scales
    from stllm_tpu.ops.quant import quant_linear

    params_q = calibrate_vit_scales(params_q, images, cfg, margin)
    t = num_frames
    bt = images.shape[0]
    b = bt // t
    assert b * t == bt, (bt, t)

    if images.dtype == jnp.uint8:
        from stllm_tpu.data.processors import CLIP_MEAN, CLIP_STD

        mean = jnp.asarray(CLIP_MEAN, jnp.float32) * 255.0
        std = jnp.asarray(CLIP_STD, jnp.float32) * 255.0
        images = ((images.astype(jnp.float32) - mean) / std).astype(cfg.dtype)

    @jax.jit
    def prologue(images):
        x = patchify(images.astype(cfg.dtype), cfg.patch_size)
        x = linear(params_q["patch_embed"], x)
        cls = jnp.broadcast_to(params_q["cls_token"],
                               (bt, 1, cfg.width)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        return x + params_q["pos_embed"].astype(x.dtype)

    def amax(v):
        return jnp.max(jnp.abs(v.astype(jnp.float32)))

    @jax.jit
    def temporal_stats(layer, x):
        cls, q = x[:, :1], x[:, 1:]
        d = x.shape[-1]
        p = q.shape[1] // t
        qt = q.reshape(b * p, t, d)
        h = layer_norm(layer["norm1"], qt, cfg.ln_eps)
        qkv = quant_linear(_qkv_with_bias(layer), h)
        qh, kh, vh = jnp.split(qkv, 3, axis=-1)
        bp = b * p
        out = mha_reference(
            qh.reshape(bp, t, cfg.heads, cfg.head_dim),
            kh.reshape(bp, t, cfg.heads, cfg.head_dim),
            vh.reshape(bp, t, cfg.heads, cfg.head_dim),
        ).reshape(bp, t, d)
        att = quant_linear(layer["proj"], out)
        fc = quant_linear(layer["temporal_fc"], att)
        nxt = jnp.concatenate([cls, fc.reshape(b, p * t, d) + q], axis=1)
        return nxt, {"qkv": amax(h), "proj": amax(out), "temporal_fc": amax(att)}

    @jax.jit
    def spatial_stats(layer, x):
        residual = x
        d = x.shape[-1]
        cls, q = x[:, :1], x[:, 1:]
        p = q.shape[1] // t
        cls_t = jnp.repeat(cls, t, axis=0)
        q_t = q.reshape(b, p, t, d).transpose(0, 2, 1, 3).reshape(b * t, p, d)
        h = jnp.concatenate([cls_t, q_t], axis=1)
        hn = layer_norm(layer["norm1"], h, cfg.ln_eps)
        qkv = quant_linear(_qkv_with_bias(layer), hn)
        qh, kh, vh = jnp.split(qkv, 3, axis=-1)
        out = mha_reference(
            qh.reshape(b * t, p + 1, cfg.heads, cfg.head_dim),
            kh.reshape(b * t, p + 1, cfg.heads, cfg.head_dim),
            vh.reshape(b * t, p + 1, cfg.heads, cfg.head_dim),
        ).reshape(b * t, p + 1, d)
        att = quant_linear(layer["proj"], out)
        cls_out = att[:, :1].reshape(b, t, 1, d).mean(axis=1)
        sp = att[:, 1:].reshape(b, t, p, d).transpose(0, 2, 1, 3).reshape(b, p * t, d)
        x = residual + jnp.concatenate([cls_out, sp], axis=1)
        hn2 = layer_norm(layer["norm2"], x, cfg.ln_eps)
        f1 = quant_linear(layer["fc1"], hn2)
        g = jax.nn.gelu(f1, approximate=True) if cfg.gelu_approx else gelu(f1)
        nxt = x + quant_linear(layer["fc2"], g)
        bt_, n_, _ = qkv.shape
        attn_amax = jnp.max(  # per-third (q/k/v) amax, as in vit.block_stats
            jnp.abs(qkv.astype(jnp.float32).reshape(bt_, n_, 3, -1)),
            axis=(0, 1, 3))
        return nxt, {"qkv": amax(hn), "proj": amax(out), "fc1": amax(hn2),
                     "fc2": amax(g), "attn": attn_amax}

    branch_layers = len(params_q["btadapter"]["temp"])
    start = cfg.depth - branch_layers
    x = prologue(images)
    branch = None
    temp_stats, spat_stats = [], []
    # one jitted trunk block reused across depth (identical pytree shapes)
    trunk_block = jax.jit(vit_block, static_argnums=(2,))
    for idx, block in enumerate(params_q["blocks"]):
        x = trunk_block(block, x, cfg)
        if idx >= start:
            i = idx - start
            xr = x.reshape(b, t, *x.shape[1:])
            if branch is None:
                branch = _branch_init(params_q, xr, cfg)
            else:
                branch = _branch_accumulate(branch, xr)
            branch, st = temporal_stats(params_q["btadapter"]["temp"][i], branch)
            temp_stats.append(st)
            branch, ss = spatial_stats(params_q["btadapter"]["spatial"][i], branch)
            spat_stats.append(ss)

    def attach(layer, st):
        return {**layer, "act_scales": {
            k: jnp.float32(margin) * v.astype(jnp.float32) / 127.0
            for k, v in st.items()}}

    out = dict(params_q)
    bt_p = dict(params_q["btadapter"])
    bt_p["temp"] = [attach(l, s) for l, s in
                    zip(bt_p["temp"], temp_stats)]
    bt_p["spatial"] = [attach(l, s) for l, s in
                      zip(bt_p["spatial"], spat_stats)]
    out["btadapter"] = bt_p
    return out


def _branch_init(params: Dict, xr: jax.Array, cfg: ViTConfig) -> jax.Array:
    """Build the initial branch state from trunk activations
    (reference init_input, eva_btadapter.py:209-231). xr: (B, T, L, D)."""
    bt_p = params["btadapter"]
    b, t, l, d = xr.shape
    p = l - 1
    cls_x = xr[:, :, 0].mean(axis=1, keepdims=True)                     # (B, 1, D)
    pos = params["pos_embed"].astype(xr.dtype)
    # branch cls = BTAdapter_cls + pos_embed[0] (same value for every row)
    cls_branch = (bt_p["cls"].astype(xr.dtype) + pos[:, :1])
    cls_branch = jnp.broadcast_to(cls_branch, (b, 1, d))
    patches = xr[:, :, 1:] + pos[None, :, 1:]                           # (B, T, P, D)
    patches = patches.transpose(0, 2, 1, 3)                             # (B, P, T, D)
    patches = patches + bt_p["time_embed"][:t].astype(xr.dtype)
    patches = patches.reshape(b, p * t, d)
    cls = (cls_x + cls_branch) / 2
    return jnp.concatenate([cls, patches], axis=1)


def _branch_accumulate(branch: jax.Array, xr: jax.Array) -> jax.Array:
    """Add the current trunk activations into the branch state
    (reference forward_branch, eva_btadapter.py:186-196). xr: (B, T, L, D)."""
    b, t, l, d = xr.shape
    p = l - 1
    cls = xr[:, :, 0].mean(axis=1, keepdims=True)
    patches = xr[:, :, 1:].transpose(0, 2, 1, 3).reshape(b, p * t, d)
    return branch + jnp.concatenate([cls, patches], axis=1)


def btadapter_forward(
    params: Dict,
    images: jax.Array,      # (B*T, H, W, C) normalized
    cfg: ViTConfig,
    num_frames: int,
) -> jax.Array:
    """Trunk + branch forward. Returns (B*T, L, D) per-frame tokens with the
    branch averaged in (reference forward_features, eva_btadapter.py:147-184)."""
    t = num_frames
    bt = images.shape[0]
    b = bt // t
    assert b * t == bt, f"batch {bt} not divisible by num_frames {t}"
    assert t <= MAX_BTADAPTER_FRAMES, f"{t} frames > temporal embedding {MAX_BTADAPTER_FRAMES}"

    x = patchify(images.astype(cfg.dtype), cfg.patch_size)
    x = linear(params["patch_embed"], x)
    cls = jnp.broadcast_to(params["cls_token"], (bt, 1, cfg.width)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(x.dtype)

    branch_layers = len(params["btadapter"]["temp"])
    start = cfg.depth - branch_layers
    branch: Optional[jax.Array] = None

    # Staged token merging (ops/tome.py): the TRUNK runs merged (that is
    # where the FLOPs are — 39 blocks x width 1408); the branch taps gather
    # back to full resolution through the origin map, because temporal
    # attention matches patch i of frame t with patch i of frame t+1 and so
    # needs position-aligned full-res features. Branch cost is unchanged
    # (it was already the FLOP-proportional residue vs the plain ViT).
    schedule = dict(cfg.merge_schedule)
    folds = {blk: (g, m) for blk, g, m in cfg.temporal_schedule}
    sizes = origin = None
    n0 = x.shape[1]
    if schedule or folds:
        from stllm_tpu.ops.tome import (
            bipartite_merge, fold_frames, init_merge_state, unmerge)

        assert all(k < cfg.depth for k in schedule), (
            "post-trunk merge entries are a plain-ViT lever (they feed the "
            "Q-Former fewer tokens); BTAdapter output is full-res by "
            f"construction — got schedule keys {sorted(schedule)}")
        sizes, origin = init_merge_state(bt, n0)
    if folds:
        total_g = 1
        for g_, _ in folds.values():
            total_g *= g_
        assert t % total_g == 0, (
            f"temporal_schedule groups multiply to {total_g}; num_frames "
            f"{t} must divide so folds never span videos")

    block_fn = vit_block
    if cfg.remat:
        block_fn = jax.checkpoint(vit_block, static_argnums=(2,))

    for idx, block in enumerate(params["blocks"]):
        if idx in folds:
            g_, m_ = folds[idx]
            n_pre = x.shape[1]
            x, sizes, origin = fold_frames(x, sizes, origin, g_)
            x, sizes, origin = bipartite_merge(x, sizes, origin, m_,
                                               nb=n_pre)
        if idx in schedule:
            x, sizes, origin = bipartite_merge(x, sizes, origin,
                                               schedule[idx])
        x = block_fn(block, x, cfg)
        if idx >= start:
            i = idx - start
            x_full = unmerge(x, origin) if origin is not None else x
            xr = x_full.reshape(b, t, n0, x.shape[-1])
            if branch is None:
                branch = _branch_init(params, xr, cfg)
            else:
                branch = _branch_accumulate(branch, xr)
            temp_l = params["btadapter"]["temp"][i]
            spat_l = params["btadapter"]["spatial"][i]
            if "act_scales" in temp_l:  # calibrate_btadapter_scales
                branch = _temporal_layer_quant_static(temp_l, branch, b, t, cfg)
            else:
                branch = _temporal_layer(temp_l, branch, b, t, cfg)
            if "act_scales" in spat_l:
                branch = _spatial_layer_quant_static(spat_l, branch, b, t, cfg)
            else:
                branch = _spatial_layer(spat_l, branch, b, t, cfg)

    # merge: broadcast the branch back to per-frame rows and average
    if origin is not None:
        x = unmerge(x, origin).reshape(bt, n0, x.shape[-1])
    l = x.shape[1]
    p = l - 1
    d = x.shape[-1]
    br_cls = jnp.repeat(branch[:, :1], t, axis=0)                        # (B*T, 1, D)
    br_patch = (
        branch[:, 1:].reshape(b, p, t, d).transpose(0, 2, 1, 3).reshape(bt, p, d)
    )
    return (x + jnp.concatenate([br_cls, br_patch], axis=1)) / 2
