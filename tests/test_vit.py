import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stllm_tpu.models.vit import (
    ViTConfig,
    init_vit,
    interpolate_pos_embed,
    patchify,
    vit_forward,
)
from stllm_tpu.convert.torch_to_jax import convert_eva_vit

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

TINY = ViTConfig(image_size=28, patch_size=14, width=64, depth=2, heads=2,
                 mlp_hidden=96, dtype=jnp.float32)


class TorchEvaBlock(nn.Module):
    """Minimal torch reimplementation of an EVA pre-norm block (qkv with
    q/v-only bias, k bias zero), used purely as a test oracle."""

    def __init__(self, d, heads, hidden):
        super().__init__()
        self.heads = heads
        self.norm1 = nn.LayerNorm(d, eps=1e-6)
        self.qkv = nn.Linear(d, 3 * d, bias=False)
        self.q_bias = nn.Parameter(torch.randn(d) * 0.02)
        self.v_bias = nn.Parameter(torch.randn(d) * 0.02)
        self.proj = nn.Linear(d, d)
        self.norm2 = nn.LayerNorm(d, eps=1e-6)
        self.mlp = nn.Sequential()
        self.mlp.fc1 = nn.Linear(d, hidden)
        self.mlp.act = nn.GELU()
        self.mlp.fc2 = nn.Linear(hidden, d)

    def attention(self, x):
        b, n, d = x.shape
        hd = d // self.heads
        bias = torch.cat([self.q_bias, torch.zeros_like(self.q_bias), self.v_bias])
        qkv = F.linear(x, self.qkv.weight, bias)
        qkv = qkv.reshape(b, n, 3, self.heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * hd ** -0.5, qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)).softmax(dim=-1)
        return self.proj((attn @ v).transpose(1, 2).reshape(b, n, d))

    def forward(self, x):
        x = x + self.attention(self.norm1(x))
        return x + self.mlp.fc2(self.mlp.act(self.mlp.fc1(self.norm2(x))))


class TorchEvaViT(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.patch_embed = nn.Sequential()
        self.patch_embed.proj = nn.Conv2d(3, cfg.width, cfg.patch_size, cfg.patch_size)
        self.cls_token = nn.Parameter(torch.randn(1, 1, cfg.width) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, cfg.seq_len, cfg.width) * 0.02)
        self.blocks = nn.ModuleList(
            [TorchEvaBlock(cfg.width, cfg.heads, cfg.mlp_hidden) for _ in range(cfg.depth)]
        )

    def forward(self, x):  # x: (B, C, H, W)
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        cls = self.cls_token.expand(x.shape[0], -1, -1)
        x = torch.cat([cls, x], dim=1) + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return x


def _torch_state_dict_lavis_names(model):
    """Emit the LAVIS eva_vit_g.pth key layout."""
    sd = {}
    sd["patch_embed.proj.weight"] = model.patch_embed.proj.weight
    sd["patch_embed.proj.bias"] = model.patch_embed.proj.bias
    sd["cls_token"] = model.cls_token
    sd["pos_embed"] = model.pos_embed
    for i, blk in enumerate(model.blocks):
        p = f"blocks.{i}"
        sd[f"{p}.norm1.weight"] = blk.norm1.weight
        sd[f"{p}.norm1.bias"] = blk.norm1.bias
        sd[f"{p}.attn.qkv.weight"] = blk.qkv.weight
        sd[f"{p}.attn.q_bias"] = blk.q_bias
        sd[f"{p}.attn.v_bias"] = blk.v_bias
        sd[f"{p}.attn.proj.weight"] = blk.proj.weight
        sd[f"{p}.attn.proj.bias"] = blk.proj.bias
        sd[f"{p}.norm2.weight"] = blk.norm2.weight
        sd[f"{p}.norm2.bias"] = blk.norm2.bias
        sd[f"{p}.mlp.fc1.weight"] = blk.mlp.fc1.weight
        sd[f"{p}.mlp.fc1.bias"] = blk.mlp.fc1.bias
        sd[f"{p}.mlp.fc2.weight"] = blk.mlp.fc2.weight
        sd[f"{p}.mlp.fc2.bias"] = blk.mlp.fc2.bias
    return sd


def test_vit_parity_with_torch_oracle():
    torch.manual_seed(0)
    model = TorchEvaViT(TINY).eval()
    sd = _torch_state_dict_lavis_names(model)
    params = convert_eva_vit(sd, TINY, dtype=jnp.float32)

    x = np.random.RandomState(0).randn(2, 3, 28, 28).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(x)).numpy()
    got = vit_forward(params, jnp.asarray(x.transpose(0, 2, 3, 1)), TINY)
    assert got.shape == want.shape == (2, TINY.seq_len, TINY.width)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=2e-4)


def test_vit_init_and_shapes():
    cfg = TINY
    params = init_vit(jax.random.PRNGKey(0), cfg)
    x = jnp.ones((3, 28, 28, 3))
    out = vit_forward(params, x, cfg)
    assert out.shape == (3, 5, 64)
    assert len(params["blocks"]) == 2


def test_patchify_order():
    # pixel (0,0) patch must be the first patch, row-major
    img = jnp.arange(2 * 28 * 28 * 3, dtype=jnp.float32).reshape(2, 28, 28, 3)
    p = patchify(img, 14)
    assert p.shape == (2, 4, 14 * 14 * 3)
    np.testing.assert_array_equal(
        np.asarray(p[0, 0].reshape(14, 14, 3)), np.asarray(img[0, :14, :14, :])
    )
    np.testing.assert_array_equal(
        np.asarray(p[0, 1].reshape(14, 14, 3)), np.asarray(img[0, :14, 14:, :])
    )


def test_interpolate_pos_embed():
    pe = jnp.ones((1, 17, 8))  # cls + 4x4 grid
    out = interpolate_pos_embed(pe, 64)  # -> 8x8 grid
    assert out.shape == (1, 65, 8)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)


def test_vit_remat_matches():
    cfg = TINY
    params = init_vit(jax.random.PRNGKey(1), cfg)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 28, 28, 3))
    a = vit_forward(params, x, cfg)
    b = vit_forward(params, x, ViTConfig(**{**cfg.__dict__, "remat": True}))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
