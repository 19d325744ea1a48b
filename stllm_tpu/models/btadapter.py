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
    spatial = jax.tree_util.tree_map(lambda x: x, params["blocks"][-depth:])
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

    block_fn = vit_block
    if cfg.remat:
        block_fn = jax.checkpoint(vit_block, static_argnums=(2,))

    for idx, block in enumerate(params["blocks"]):
        x = block_fn(block, x, cfg)
        if idx >= start:
            i = idx - start
            xr = x.reshape(b, t, *x.shape[1:])
            if branch is None:
                branch = _branch_init(params, xr, cfg)
            else:
                branch = _branch_accumulate(branch, xr)
            branch = _temporal_layer(params["btadapter"]["temp"][i], branch, b, t, cfg)
            branch = _spatial_layer(params["btadapter"]["spatial"][i], branch, b, t, cfg)

    # merge: broadcast the branch back to per-frame rows and average
    l = x.shape[1]
    p = l - 1
    d = x.shape[-1]
    br_cls = jnp.repeat(branch[:, :1], t, axis=0)                        # (B*T, 1, D)
    br_patch = (
        branch[:, 1:].reshape(b, p, t, d).transpose(0, 2, 1, 3).reshape(bt, p, d)
    )
    return (x + jnp.concatenate([br_cls, br_patch], axis=1)) / 2
