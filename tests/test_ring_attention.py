"""Ring attention (sequence parallel) vs single-device reference — exact
numerical equivalence on a 4-device CPU mesh, plus gradient flow."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from stllm_tpu.ops.attention import mha_reference
from stllm_tpu.ops.ring_attention import ring_attention

B, S, H, D = 2, 64, 2, 16  # S sharded 4-way -> 16 per device


def _mesh(n=4):
    return Mesh(np.array(jax.devices()[:n]), ("sp",))


def _rand(shape, seed):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape),
                       jnp.float32)


def _ring(q, k, v, causal, kv_mask=None, n=4):
    mesh = _mesh(n)
    fn = functools.partial(ring_attention, axis_name="sp", causal=causal)
    specs = (P(None, "sp"), P(None, "sp"), P(None, "sp"))
    if kv_mask is not None:
        wrapped = jax.shard_map(
            lambda q, k, v, m: fn(q, k, v, kv_mask=m), mesh=mesh,
            in_specs=specs + (P(None, "sp"),), out_specs=P(None, "sp"))
        return wrapped(q, k, v, kv_mask)
    wrapped = jax.shard_map(fn, mesh=mesh, in_specs=specs,
                            out_specs=P(None, "sp"))
    return wrapped(q, k, v)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_matches_reference(causal):
    q, k, v = (_rand((B, S, H, D), i) for i in range(3))
    got = _ring(q, k, v, causal)
    want = mha_reference(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


def test_ring_with_kv_mask():
    q, k, v = (_rand((B, S, H, D), i) for i in range(3))
    kv_mask = jnp.asarray(np.random.default_rng(7).integers(0, 2, (B, S)))
    kv_mask = kv_mask.at[:, 0].set(1)
    got = _ring(q, k, v, causal=False, kv_mask=kv_mask)
    want = mha_reference(q, k, v, kv_mask=kv_mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


def test_ring_gradients_flow():
    # 2-way mesh: the vjp of the ppermute ring is the compile hot spot
    # (31 s at 4-way); forward equivalence keeps the 4-way coverage above
    q, k, v = (_rand((B, S, H, D), i) for i in range(3))

    def loss_ring(q, k, v):
        return (_ring(q, k, v, causal=True, n=2) ** 2).sum()

    def loss_ref(q, k, v):
        return (mha_reference(q, k, v, causal=True) ** 2).sum()

    gr = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    gw = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gw):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
