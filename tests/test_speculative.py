"""Speculative decoding: exact greedy equivalence and cache-rollback
mechanics (models/speculative.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stllm_tpu.models.generation import GenerationConfig, generate
from stllm_tpu.models.llama import LlamaConfig, init_llama
from stllm_tpu.models.speculative import speculative_generate

TGT = LlamaConfig(vocab_size=97, hidden=48, num_layers=3, heads=4,
                  intermediate=96, max_positions=256, dtype=jnp.float32)
DFT = LlamaConfig(vocab_size=97, hidden=48, num_layers=1, heads=4,
                  intermediate=96, max_positions=256, dtype=jnp.float32)


def _models(seed_t=0, seed_d=1):
    tgt = init_llama(jax.random.PRNGKey(seed_t), TGT)
    dft = init_llama(jax.random.PRNGKey(seed_d), DFT)
    return tgt, dft


def _prompt(seed=2, s=7):
    return jax.random.normal(jax.random.PRNGKey(seed), (1, s, TGT.hidden),
                             jnp.float32) * 0.1


class TestSpeculative:
    def test_exact_equivalence_random_draft(self):
        """An arbitrary (even useless) draft never changes the output:
        greedy acceptance emits exactly the target-greedy tokens."""
        tgt, dft = _models()
        emb = _prompt()
        gen = GenerationConfig(max_new_tokens=33, eos_token_id=-1,
                               stop_sequences=(), pad_to_multiple=8)
        want = generate(tgt, emb, llama_cfg=TGT, gen=gen)
        for k in (1, 3, 6):
            got, stats = speculative_generate(
                tgt, dft, emb, tgt_cfg=TGT, dft_cfg=DFT, gen=gen, k=k,
                return_stats=True)
            assert got == want, (k, stats)
            assert len(got[0]) == 33

    def test_exact_equivalence_with_stops(self):
        """Stop sequences / eos truncate identically to the greedy loop."""
        tgt, dft = _models()
        emb = _prompt(seed=5)
        base = GenerationConfig(max_new_tokens=24, eos_token_id=-1,
                                stop_sequences=(), pad_to_multiple=8)
        free = generate(tgt, emb, llama_cfg=TGT, gen=base)[0]
        # choose a stop that actually fires mid-sequence
        stop_tok = free[9]
        gen = GenerationConfig(max_new_tokens=24, eos_token_id=-1,
                               stop_sequences=((stop_tok,),),
                               pad_to_multiple=8)
        want = generate(tgt, emb, llama_cfg=TGT, gen=gen)
        got = speculative_generate(tgt, dft, emb, tgt_cfg=TGT, dft_cfg=DFT,
                                   gen=gen, k=4)
        assert got == want
        assert got[0][-1] == stop_tok and len(got[0]) <= 10

    def test_perfect_draft_accepts_everything(self):
        """draft == target: every proposal is accepted, so each round emits
        k+1 tokens — the round count collapses accordingly."""
        tgt, _ = _models()
        emb = _prompt(seed=9)
        k = 5
        gen = GenerationConfig(max_new_tokens=30, eos_token_id=-1,
                               stop_sequences=(), pad_to_multiple=8)
        want = generate(tgt, emb, llama_cfg=TGT, gen=gen)
        got, stats = speculative_generate(
            tgt, tgt, emb, tgt_cfg=TGT, dft_cfg=TGT, gen=gen, k=k,
            return_stats=True)
        assert got == want
        assert stats["mean_accepted"] == pytest.approx(k)
        # 30 tokens = 1 prefill token + rounds of k+1
        assert stats["rounds"] <= -(-29 // (k + 1)) + 1

    def test_eos_inside_accepted_run(self):
        """eos emitted by an accepted draft token truncates the answer at
        the right position (host unpack walks tokens in order)."""
        tgt, _ = _models()
        emb = _prompt(seed=11)
        base = GenerationConfig(max_new_tokens=20, eos_token_id=-1,
                                stop_sequences=(), pad_to_multiple=8)
        free = generate(tgt, emb, llama_cfg=TGT, gen=base)[0]
        eos = free[7]
        gen = GenerationConfig(max_new_tokens=20, eos_token_id=eos,
                               stop_sequences=(), pad_to_multiple=8)
        want = generate(tgt, emb, llama_cfg=TGT, gen=gen)
        got = speculative_generate(tgt, tgt, emb, tgt_cfg=TGT, dft_cfg=TGT,
                                   gen=gen, k=6)
        assert got == want and got[0][-1] == eos
