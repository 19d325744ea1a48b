"""H2O KV-cache eviction tests: exactness at full budget, graceful
degradation and bounded memory under eviction."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stllm_tpu.models.generation import GenerationConfig, generate
from stllm_tpu.models.h2o import (
    H2OCache, h2o_decode_chunk_greedy, h2o_decode_step, h2o_prefill)
from stllm_tpu.models.llama import LlamaConfig, init_llama, lm_head, llama_forward

TINY = LlamaConfig(vocab_size=128, hidden=64, num_layers=2, heads=4,
                   intermediate=128, max_positions=256, dtype=jnp.float32)


@pytest.fixture(scope="module")
def setup():
    params = init_llama(jax.random.PRNGKey(0), TINY)
    rs = np.random.RandomState(3)
    emb = jnp.asarray((rs.randn(2, 12, TINY.hidden) * 0.05).astype(np.float32))
    mask = jnp.asarray(np.stack([np.ones(12), np.r_[np.ones(9), np.zeros(3)]])
                       .astype(np.int32))
    return params, emb, mask


def _dense_greedy(params, emb, mask, n):
    out = generate(params, emb, mask, llama_cfg=TINY,
                   gen=GenerationConfig(max_new_tokens=n, stop_sequences=(),
                                        eos_token_id=-1, pad_to_multiple=4))
    return out


def test_full_budget_matches_dense(setup):
    """budget >= prompt + new tokens: no eviction, greedy tokens identical
    to the dense-cache decode."""
    params, emb, mask = setup
    n_new = 6
    want = _dense_greedy(params, emb, mask, n_new)

    hidden, cache = h2o_prefill(params, emb, mask, TINY,
                                budget=12 + n_new + 2, recent=4)
    last = jnp.clip(mask.sum(-1).astype(jnp.int32) - 1, 0)
    logits = lm_head(params, jnp.take_along_axis(
        hidden, last[:, None, None], axis=1))[:, 0]
    cur = jnp.argmax(logits, -1).astype(jnp.int32)
    got = [np.asarray(cur)]
    toks, cache = h2o_decode_chunk_greedy(params, cur, cache, TINY, n_new - 1)
    got.extend(np.asarray(toks).T)
    got = np.stack(got).T  # (B, n_new)
    for b in range(2):
        assert list(got[b]) == want[b], (b, list(got[b]), want[b])


def test_prefill_hidden_matches_dense(setup):
    params, emb, mask = setup
    dense_hidden, _ = llama_forward(params, inputs_embeds=emb,
                                    attention_mask=mask, cfg=TINY)
    h2o_hidden, _ = h2o_prefill(params, emb, mask, TINY, budget=32, recent=4)
    np.testing.assert_allclose(
        np.asarray(h2o_hidden[0]), np.asarray(dense_hidden[0]),
        atol=1e-4, rtol=1e-4)


def test_eviction_bounds_cache_and_stays_coherent(setup):
    """Small budget: cache arrays never grow; decode keeps producing valid
    tokens; the recency window is always resident."""
    params, emb, mask = setup
    budget, recent = 8, 3
    _, cache = h2o_prefill(params, emb, mask, TINY, budget=budget, recent=recent)
    assert len(cache.k) == TINY.num_layers
    assert cache.k[0].shape == (2, budget, TINY.heads, TINY.head_dim)
    cur = jnp.asarray([5, 7], jnp.int32)
    for _ in range(10):
        logits, cache = h2o_decode_step(params, cur, cache, TINY)
        cur = jnp.argmax(logits, -1).astype(jnp.int32)
        assert cache.k[0].shape[1] == budget
        assert all(bool(jnp.all(f <= budget)) for f in cache.filled)
    # every slot occupied, and the newest `recent` positions are resident
    pos = np.asarray(cache.pos)
    newest = int(cache.next_pos[0]) - 1
    for layer in range(TINY.num_layers):
        row = set(pos[layer, 0].tolist())
        for p in range(newest - recent + 1, newest + 1):
            assert p in row, (layer, p, sorted(row))


def test_compression_keeps_protected_recent(setup):
    """Prefill compression to budget < prompt keeps the last `recent`
    positions of each row."""
    params, emb, mask = setup
    budget, recent = 6, 3
    _, cache = h2o_prefill(params, emb, mask, TINY, budget=budget, recent=recent)
    pos = np.asarray(cache.pos)
    lengths = np.asarray(mask.sum(-1))
    for b in range(2):
        for layer in range(TINY.num_layers):
            row = set(pos[layer, b].tolist())
            for p in range(lengths[b] - recent, lengths[b]):
                assert p in row
            assert len([p for p in row if p >= 0]) == budget


def test_degradation_is_graceful(setup):
    """Next-token logit error vs the uncompressed path shrinks as the
    budget grows (reference = full budget, which the exactness test above
    ties to the dense path)."""
    params, emb, mask = setup
    tok = jnp.asarray([11, 13], jnp.int32)

    def logits_at(budget):
        _, cache = h2o_prefill(params, emb, mask, TINY, budget=budget,
                               recent=2)
        logits, _ = h2o_decode_step(params, tok, cache, TINY)
        return logits

    full = logits_at(16)
    errs = [float(jnp.abs(logits_at(b) - full).mean()) for b in (6, 9, 12)]
    assert errs[2] <= errs[0] + 1e-6, errs
