"""Rematerialization correctness: remat=True must reproduce remat=False
gradients exactly (activation checkpointing trades memory for recompute,
never numerics)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stllm_tpu.models.llama import LlamaConfig, init_llama, llama_forward, lm_head
from stllm_tpu.models.vit import ViTConfig, init_vit, vit_forward

VIT = ViTConfig(image_size=28, patch_size=14, width=32, depth=3, heads=2,
                mlp_hidden=64, dtype=jnp.float32, use_flash=False)
LLM = LlamaConfig(vocab_size=97, hidden=32, num_layers=3, heads=2,
                  intermediate=64, max_positions=64, dtype=jnp.float32)


def test_vit_remat_grad_parity():
    params = init_vit(jax.random.PRNGKey(0), VIT)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 28, 28, 3)),
                    jnp.float32)

    def loss(p, cfg):
        return (vit_forward(p, x, cfg) ** 2).mean()

    g_plain = jax.grad(lambda p: loss(p, VIT))(params)
    g_remat = jax.grad(lambda p: loss(p, dataclasses.replace(VIT, remat=True)))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-5, atol=1e-7),
        g_plain, g_remat)


def test_llama_remat_grad_parity():
    params = init_llama(jax.random.PRNGKey(0), LLM)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 97, (2, 8)))

    def loss(p, cfg):
        hidden, _ = llama_forward(p, input_ids=ids, cfg=cfg)
        return (lm_head(p, hidden) ** 2).mean()

    g_plain = jax.grad(lambda p: loss(p, LLM))(params)
    g_remat = jax.grad(lambda p: loss(p, dataclasses.replace(LLM, remat=True)))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-5, atol=1e-7),
        g_plain, g_remat)
