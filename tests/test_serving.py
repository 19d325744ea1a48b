"""Continuous-batching server (stllm_tpu/serving.py): per-request outputs
are token-identical to running generation.generate alone, across slot
reuse, mixed prompt lengths, mixed budgets, and stop conditions."""

import jax
import jax.numpy as jnp
import numpy as np

from stllm_tpu.models.generation import GenerationConfig, generate
from stllm_tpu.models.llama import LlamaConfig, init_llama
from stllm_tpu.serving import ContinuousBatcher

CFG = LlamaConfig(vocab_size=97, hidden=48, num_layers=2, heads=4,
                  intermediate=96, max_positions=256, dtype=jnp.float32)


def _req(seed, s):
    return jax.random.normal(jax.random.PRNGKey(seed), (1, s, CFG.hidden),
                             jnp.float32) * 0.1


class TestContinuousBatching:
    def test_matches_sequential_generate(self):
        params = init_llama(jax.random.PRNGKey(0), CFG)
        gens = {
            "short": GenerationConfig(max_new_tokens=5, eos_token_id=-1,
                                      stop_sequences=(), pad_to_multiple=8),
            "long": GenerationConfig(max_new_tokens=37, eos_token_id=-1,
                                     stop_sequences=(), pad_to_multiple=8),
            "mid": GenerationConfig(max_new_tokens=20, eos_token_id=-1,
                                    stop_sequences=(), pad_to_multiple=8),
        }
        # mixed prompt lengths (different pad buckets) and budgets; more
        # requests than slots so slots get reused mid-flight
        reqs = [("a", _req(1, 5), gens["long"]),
                ("b", _req(2, 11), gens["short"]),
                ("c", _req(3, 7), gens["mid"]),
                ("d", _req(4, 16), gens["long"]),
                ("e", _req(5, 3), gens["mid"])]

        want = {rid: generate(params, emb, llama_cfg=CFG, gen=g)[0]
                for rid, emb, g in reqs}

        cb = ContinuousBatcher(params, CFG, slots=2, max_len=96, chunk=4)
        for rid, emb, g in reqs:
            cb.submit(rid, emb, g)
        got = cb.run()
        assert set(got) == set(want)
        for rid in want:
            assert got[rid] == want[rid], rid

    def test_stop_sequence_and_eos(self):
        params = init_llama(jax.random.PRNGKey(7), CFG)
        emb = _req(8, 6)
        base = GenerationConfig(max_new_tokens=24, eos_token_id=-1,
                                stop_sequences=(), pad_to_multiple=8)
        free = generate(params, emb, llama_cfg=CFG, gen=base)[0]
        gen_stop = GenerationConfig(max_new_tokens=24, eos_token_id=-1,
                                    stop_sequences=((free[6],),),
                                    pad_to_multiple=8)
        gen_eos = GenerationConfig(max_new_tokens=24, eos_token_id=free[4],
                                   stop_sequences=(), pad_to_multiple=8)
        want_stop = generate(params, emb, llama_cfg=CFG, gen=gen_stop)[0]
        want_eos = generate(params, emb, llama_cfg=CFG, gen=gen_eos)[0]

        cb = ContinuousBatcher(params, CFG, slots=2, max_len=64, chunk=4)
        cb.submit("stop", emb, gen_stop)
        cb.submit("eos", emb, gen_eos)
        got = cb.run()
        assert got["stop"] == want_stop
        assert got["eos"] == want_eos

    def test_quantized_serving_tree(self):
        """The server drives the production quantized form (fused W4A16 +
        int8 head + int8 KV cache) with answers matching solo generate on
        the same tree."""
        import dataclasses

        from stllm_tpu.models.llama import quantize_llama_params_int4

        cfg = dataclasses.replace(CFG, kv_int8=True)
        params = init_llama(jax.random.PRNGKey(21), CFG)
        q = quantize_llama_params_int4(params, group=None, fuse=True,
                                       quant_head=True)
        gen = GenerationConfig(max_new_tokens=10, eos_token_id=-1,
                               stop_sequences=(), pad_to_multiple=8)
        a, b = _req(22, 5), _req(23, 9)
        want_a = generate(q, a, llama_cfg=cfg, gen=gen)[0]
        want_b = generate(q, b, llama_cfg=cfg, gen=gen)[0]
        cb = ContinuousBatcher(q, cfg, slots=2, max_len=48, chunk=4)
        cb.submit("a", a, gen)
        cb.submit("b", b, gen)
        got = cb.run()
        assert got["a"] == want_a and got["b"] == want_b

    def test_first_token_completion_and_rejection(self):
        """Regression (round 3b review): a request finished by its
        admit-time first token (max_new_tokens=1, or first-token eos) must
        still appear in run()'s output; oversized requests are rejected at
        submit() instead of crashing the server."""
        import pytest

        params = init_llama(jax.random.PRNGKey(12), CFG)
        emb = _req(13, 5)
        gen1 = GenerationConfig(max_new_tokens=1, eos_token_id=-1,
                                stop_sequences=(), pad_to_multiple=8)
        want = generate(params, emb, llama_cfg=CFG, gen=gen1)
        cb = ContinuousBatcher(params, CFG, slots=2, max_len=64, chunk=4)
        cb.submit("one", emb, gen1)
        # first-token eos as well
        base = GenerationConfig(max_new_tokens=8, eos_token_id=-1,
                                stop_sequences=(), pad_to_multiple=8)
        first = generate(params, emb, llama_cfg=CFG, gen=base)[0][0]
        gen_eos = GenerationConfig(max_new_tokens=8, eos_token_id=first,
                                   stop_sequences=(), pad_to_multiple=8)
        cb.submit("eos0", emb, gen_eos)
        got = cb.run()
        assert got["one"] == want[0] and len(got["one"]) == 1
        assert got["eos0"] == [first]

        with pytest.raises(ValueError):
            cb.submit("too-big", _req(14, 40),
                      GenerationConfig(max_new_tokens=60,
                                       pad_to_multiple=8))
        with pytest.raises(ValueError):  # greedy-only server
            cb.submit("sampled", _req(15, 5),
                      GenerationConfig(max_new_tokens=4, do_sample=True,
                                       pad_to_multiple=8))

    def test_late_submission_joins_running_batch(self):
        params = init_llama(jax.random.PRNGKey(9), CFG)
        gen = GenerationConfig(max_new_tokens=12, eos_token_id=-1,
                               stop_sequences=(), pad_to_multiple=8)
        a, b = _req(10, 5), _req(11, 9)
        want_a = generate(params, a, llama_cfg=CFG, gen=gen)[0]
        want_b = generate(params, b, llama_cfg=CFG, gen=gen)[0]

        cb = ContinuousBatcher(params, CFG, slots=2, max_len=64, chunk=4)
        cb.submit("a", a, gen)
        done = cb.step()          # "a" mid-flight
        assert not done
        cb.submit("b", b, gen)    # joins while "a" decodes
        out = cb.run()
        assert out["a"] == want_a and out["b"] == want_b
