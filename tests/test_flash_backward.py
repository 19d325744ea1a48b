"""Pallas flash-attention BACKWARD parity vs the XLA reference vjp, across
causal/masked/padded/odd-head-dim shapes (interpret mode on CPU)."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stllm_tpu.ops.attention import flash_attention, mha_reference


def _rand(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape),
                       jnp.float32)


def _grads(fn, *args):
    def loss(q, k, v):
        out = fn(q, k, v)
        w = jnp.cos(jnp.arange(out.size, dtype=jnp.float32)).reshape(out.shape)
        return (out * w).sum()

    return jax.grad(loss, argnums=(0, 1, 2))(*args)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("shape", [
    (2, 64, 2, 32),          # block-aligned
    (1, 80, 2, 24),          # odd seq + odd head_dim (padding paths)
])
def test_backward_matches_reference(causal, shape):
    b, s, h, d = shape
    q, k, v = (_rand(shape, i) for i in range(3))
    flash = functools.partial(flash_attention, causal=causal, use_pallas=True,
                              interpret=True, block_q=32, block_k=32)
    ref = functools.partial(mha_reference, causal=causal)
    gf = _grads(flash, q, k, v)
    gr = _grads(ref, q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5)


def test_backward_with_kv_mask():
    b, s, h, d = 2, 64, 2, 32
    q, k, v = (_rand((b, s, h, d), i) for i in range(3))
    kv_mask = jnp.asarray(np.random.default_rng(5).integers(0, 2, (b, s)))
    kv_mask = kv_mask.at[:, 0].set(1)  # keep at least one valid kv per row
    flash = functools.partial(flash_attention, kv_mask=kv_mask,
                              use_pallas=True, interpret=True,
                              block_q=32, block_k=32)
    ref = functools.partial(mha_reference, kv_mask=kv_mask)
    gf = _grads(flash, q, k, v)
    gr = _grads(ref, q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5)


def test_backward_with_q_mask_and_causal():
    b, s, h, d = 1, 64, 2, 32
    q, k, v = (_rand((b, s, h, d), i) for i in range(3))
    q_mask = jnp.asarray(np.ones((b, s)).astype(np.float32))
    q_mask = q_mask.at[:, s // 2:].set(0.0)
    flash = functools.partial(flash_attention, causal=True, q_mask=q_mask,
                              use_pallas=True, interpret=True,
                              block_q=32, block_k=32)
    ref = functools.partial(mha_reference, causal=True, q_mask=q_mask)
    gf = _grads(flash, q, k, v)
    gr = _grads(ref, q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5)


def test_forward_unchanged_by_vjp_refactor():
    q, k, v = (_rand((2, 48, 2, 32), i) for i in range(3))
    out_f = flash_attention(q, k, v, use_pallas=True, interpret=True,
                            block_q=16, block_k=16)
    out_r = mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=2e-5, atol=2e-6)
