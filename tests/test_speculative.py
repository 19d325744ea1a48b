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


class TestDistill:
    def test_distilled_draft_improves_acceptance(self):
        """models/distill.py: hard-label distillation raises the draft's
        argmax-match — and therefore speculative acceptance — far above an
        untrained draft on the training distribution."""
        from stllm_tpu.models.distill import distill_draft

        tgt, dft0 = _models()
        prompts = [
            jax.random.normal(jax.random.PRNGKey(100 + i), (1, 9, TGT.hidden),
                              jnp.float32) * 0.1
            for i in range(4)
        ]
        gen = GenerationConfig(max_new_tokens=24, eos_token_id=-1,
                               stop_sequences=(), pad_to_multiple=8)
        # continuation corpus = the target's own greedy outputs (what the
        # draft must imitate during speculative generation)
        conts = [jnp.asarray([generate(tgt, p, llama_cfg=TGT, gen=gen)[0]],
                             jnp.int32) for p in prompts]

        out0, stats0 = speculative_generate(
            tgt, dft0, prompts[0][:1], tgt_cfg=TGT, dft_cfg=DFT, gen=gen,
            k=4, return_stats=True)

        dft = distill_draft(tgt, dft0,
                            lambda i: (prompts[i % 4], conts[i % 4]),
                            tgt_cfg=TGT, dft_cfg=DFT, steps=200,
                            learning_rate=3e-3)
        out1, stats1 = speculative_generate(
            tgt, dft, prompts[0][:1], tgt_cfg=TGT, dft_cfg=DFT, gen=gen,
            k=4, return_stats=True)

        # equivalence holds regardless of the draft
        want = generate(tgt, prompts[0][:1], llama_cfg=TGT, gen=gen)
        assert out0 == want and out1 == want
        # distillation must improve tokens/round materially
        assert stats1["tokens_per_round"] > stats0["tokens_per_round"] + 0.5, (
            stats0, stats1)
