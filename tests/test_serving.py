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
        with pytest.raises(ValueError):  # beams go through generate()
            cb.submit("beam", _req(15, 5),
                      GenerationConfig(max_new_tokens=4, num_beams=3,
                                       pad_to_multiple=8))
        with pytest.raises(ValueError):  # invalid nucleus mass
            cb.submit("badp", _req(15, 5),
                      GenerationConfig(max_new_tokens=4, do_sample=True,
                                       top_p=0.0, pad_to_multiple=8))

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


class TestSampledServing:
    """On-device nucleus sampling in the continuous batcher: exact top-p
    truncation, per-request reproducibility, and greedy/sampled coexistence
    in one decode program."""

    def test_device_nucleus_matches_host_rule(self):
        from stllm_tpu.models.generation import _topp_next

        rng = np.random.default_rng(0)
        logits = jnp.asarray(rng.normal(size=(4, 97)) * 3.0, jnp.float32)
        temp = jnp.asarray([1.0, 0.7, 1.3, 1.0], jnp.float32)
        topp = jnp.asarray([0.6, 0.9, 0.3, 1e-6], jnp.float32)
        mask = jnp.asarray([True, True, True, True])

        # host nucleus per row (same keep rule as generation._sample_top_p)
        lg = np.asarray(logits, np.float64)
        lg = lg / np.maximum(np.asarray(temp, np.float64), 1e-5)[:, None]
        nucleus = []
        for row in range(4):
            p = np.exp(lg[row] - lg[row].max())
            p /= p.sum()
            order = np.argsort(-p)
            keep = np.cumsum(p[order]) - p[order] < float(topp[row])
            nucleus.append(set(int(t) for t in order[keep]))

        hits = [set() for _ in range(4)]
        for s in range(60):
            keys = jnp.tile(
                jnp.asarray(jax.random.PRNGKey(1000 + s))[None], (4, 1))
            out = np.asarray(_topp_next(logits, keys, temp, topp, mask))
            for row in range(4):
                assert int(out[row]) in nucleus[row], (row, int(out[row]))
                hits[row].add(int(out[row]))
        # the wide rows actually explore their nucleus ...
        assert len(hits[1]) > 1
        # ... and top_p -> 0 degenerates to greedy
        assert hits[3] == {int(np.asarray(jnp.argmax(logits[3])))}

        # sample_mask=False rows take the argmax regardless of key
        off = np.asarray(_topp_next(
            logits, keys, temp, topp, jnp.zeros((4,), bool)))
        assert (off == np.asarray(jnp.argmax(logits, axis=-1))).all()

    def test_sampled_stream_independent_of_cotenants(self):
        params = init_llama(jax.random.PRNGKey(0), CFG)
        emb = _req(11, 9)
        gs = GenerationConfig(max_new_tokens=18, eos_token_id=-1,
                              stop_sequences=(), pad_to_multiple=8,
                              do_sample=True, top_p=0.8, temperature=1.1)

        solo = ContinuousBatcher(params, CFG, slots=1, max_len=64, chunk=4)
        solo.submit("x", emb, gs, seed=123)
        want = solo.run()["x"]
        assert len(want) == 18

        # same request inside a busy mixed server with a DIFFERENT chunk
        # size, greedy co-tenants, and a second sampled stream
        gg = GenerationConfig(max_new_tokens=12, eos_token_id=-1,
                              stop_sequences=(), pad_to_multiple=8)
        a = _req(1, 5)
        cb = ContinuousBatcher(params, CFG, slots=3, max_len=64, chunk=6)
        cb.submit("g1", a, gg)
        cb.submit("x", emb, gs, seed=123)
        cb.submit("y", emb, gs, seed=7)
        cb.submit("g2", _req(2, 7), gg)
        got = cb.run()
        assert got["x"] == want
        # greedy rows in the mixed program stay token-identical to generate
        assert got["g1"] == generate(params, a, llama_cfg=CFG, gen=gg)[0]
        # a different seed re-running the same prompt is its own stream,
        # reproducible in yet another server shape
        cb2 = ContinuousBatcher(params, CFG, slots=2, max_len=64, chunk=3)
        cb2.submit("y", emb, gs, seed=7)
        assert cb2.run()["y"] == got["y"]

    def test_sampled_stop_conditions(self):
        import dataclasses

        params = init_llama(jax.random.PRNGKey(7), CFG)
        emb = _req(21, 6)
        free = GenerationConfig(max_new_tokens=24, eos_token_id=-1,
                                stop_sequences=(), pad_to_multiple=8,
                                do_sample=True, top_p=0.9, temperature=1.0)
        cb = ContinuousBatcher(params, CFG, slots=1, max_len=64, chunk=4)
        cb.submit("free", emb, free, seed=5)
        toks = cb.run()["free"]
        assert len(toks) == 24
        # eos mid-stream truncates exactly there
        gen_eos = dataclasses.replace(free, eos_token_id=toks[10])
        cb = ContinuousBatcher(params, CFG, slots=1, max_len=64, chunk=4)
        cb.submit("eos", emb, gen_eos, seed=5)
        got = cb.run()["eos"]
        cut = toks.index(gen_eos.eos_token_id)
        assert got == toks[:cut + 1]

    def test_topk_prefilter_exact_and_branch_independent(self):
        """V > 128 exercises the top-k prefiltered form: samples stay inside
        the EXACT host nucleus on both the fast path (top-k mass covers
        top_p) and the full-sort fallback (flat rows), and a covered row's
        draw is identical whether or not a co-tenant forces the fallback."""
        from stllm_tpu.models.generation import _TOPK_PREFILTER, _topp_next

        v = 512
        assert v > _TOPK_PREFILTER
        rng = np.random.default_rng(1)
        peaked = rng.normal(size=(v,)) * 4.0        # nucleus ≪ 128 tokens
        flat = rng.normal(size=(v,)) * 0.01         # needs the full sort
        logits = jnp.asarray(np.stack([peaked, flat]), jnp.float32)
        temp = jnp.ones((2,), jnp.float32)
        topp = jnp.asarray([0.9, 0.9], jnp.float32)

        # host nucleus (float64, the _sample_top_p rule) per row
        nucleus = []
        for row in np.asarray(logits, np.float64):
            p = np.exp(row - row.max())
            p /= p.sum()
            order = np.argsort(-p)
            keep = np.cumsum(p[order]) - p[order] < 0.9
            nucleus.append(set(int(t) for t in order[keep]))
        assert len(nucleus[0]) < _TOPK_PREFILTER      # row 0: fast path
        assert len(nucleus[1]) > _TOPK_PREFILTER      # row 1: fallback

        both = jnp.ones((2,), bool)
        for s in range(40):
            keys = jnp.tile(
                jnp.asarray(jax.random.PRNGKey(500 + s))[None], (2, 1))
            out = np.asarray(_topp_next(logits, keys, temp, topp, both))
            assert int(out[0]) in nucleus[0]
            assert int(out[1]) in nucleus[1]

        # covered row alone (fast branch) vs next to a flat co-tenant
        # (fallback branch): identical draw, key by key
        for s in range(20):
            key = jnp.asarray(jax.random.PRNGKey(900 + s))
            solo = np.asarray(_topp_next(
                logits[:1], key[None], temp[:1], topp[:1], both[:1]))[0]
            mixed = np.asarray(_topp_next(
                logits, jnp.stack([key, jnp.asarray(
                    jax.random.PRNGKey(33))]), temp, topp, both))[0]
            assert int(solo) == int(mixed), s

    def test_generate_and_server_share_sampled_streams(self):
        """generate(do_sample=True, seed=s) and a ContinuousBatcher request
        with the same seed draw from the same fold_in(PRNGKey(seed), idx)
        stream — identical tokens through either entry point."""
        params = init_llama(jax.random.PRNGKey(3), CFG)
        emb = _req(31, 7)
        gs = GenerationConfig(max_new_tokens=15, eos_token_id=-1,
                              stop_sequences=(), pad_to_multiple=8,
                              do_sample=True, top_p=0.85, temperature=0.9)
        want = generate(params, emb, llama_cfg=CFG, gen=gs, seed=11)[0]
        assert len(want) == 15
        cb = ContinuousBatcher(params, CFG, slots=2, max_len=48, chunk=4)
        cb.submit("s", emb, gs, seed=11)
        cb.submit("g", _req(32, 5),
                  GenerationConfig(max_new_tokens=6, eos_token_id=-1,
                                   stop_sequences=(), pad_to_multiple=8))
        assert cb.run()["s"] == want
        # batch rows are independent streams: row r of a b=2 generate uses
        # seed+r, so row 0 matches the b=1 run
        both = generate(params, jnp.concatenate([emb, emb], 0),
                        llama_cfg=CFG, gen=gs, seed=11)
        assert both[0] == want
        assert both[1] == generate(params, emb, llama_cfg=CFG, gen=gs,
                                   seed=12)[0]


class TestSpeculativeServing:
    """Spec-mode server (draft_params set): outputs token-identical to solo
    greedy generate regardless of draft quality — a perfect draft (the
    target itself) exercises the accept-all path, a random shallow draft
    the reject/rollback path."""

    def _run_case(self, draft_params, draft_cfg=None, spec_k=3,
                  spec_rounds=2):
        params = init_llama(jax.random.PRNGKey(0), CFG)
        if draft_params == "self":
            draft_params, draft_cfg = params, CFG
        gens = {
            "short": GenerationConfig(max_new_tokens=5, eos_token_id=-1,
                                      stop_sequences=(), pad_to_multiple=8),
            "long": GenerationConfig(max_new_tokens=29, eos_token_id=-1,
                                     stop_sequences=(), pad_to_multiple=8),
        }
        reqs = [("a", _req(1, 5), gens["long"]),
                ("b", _req(2, 11), gens["short"]),
                ("c", _req(3, 7), gens["long"]),
                ("d", _req(4, 16), gens["short"]),
                ("e", _req(5, 3), gens["long"])]
        want = {rid: generate(params, emb, llama_cfg=CFG, gen=g)[0]
                for rid, emb, g in reqs}
        cb = ContinuousBatcher(params, CFG, slots=2, max_len=96, chunk=4,
                               draft_params=draft_params,
                               draft_cfg=draft_cfg, spec_k=spec_k,
                               spec_rounds=spec_rounds)
        for rid, emb, g in reqs:
            cb.submit(rid, emb, g)
        got = cb.run()
        for rid in want:
            assert got[rid] == want[rid], rid
        return cb

    def test_perfect_draft_token_identical(self):
        # draft == target: every proposal is the target argmax, so every
        # round accepts all spec_k tokens (fast path) — and slots still
        # refill correctly mid-flight
        self._run_case("self")

    def test_weak_draft_token_identical(self):
        # an untrained 1-layer draft accepts ~nothing: every round goes
        # through the reject-and-rollback path, output unchanged
        import dataclasses

        dft_cfg = dataclasses.replace(CFG, num_layers=1)
        dft = init_llama(jax.random.PRNGKey(99), dft_cfg)
        self._run_case(dft, dft_cfg)

    def test_eos_and_stop_in_spec_mode(self):
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
        cb = ContinuousBatcher(params, CFG, slots=2, max_len=64, chunk=4,
                               draft_params=params, draft_cfg=CFG)
        cb.submit("stop", emb, gen_stop)
        cb.submit("eos", emb, gen_eos)
        got = cb.run()
        assert got["stop"] == want_stop
        assert got["eos"] == want_eos

    def test_sampled_rejected_in_spec_mode(self):
        import pytest

        params = init_llama(jax.random.PRNGKey(0), CFG)
        cb = ContinuousBatcher(params, CFG, slots=1, max_len=64,
                               draft_params=params, draft_cfg=CFG)
        with pytest.raises(ValueError):
            cb.submit("s", _req(1, 5),
                      GenerationConfig(max_new_tokens=4, do_sample=True,
                                       top_p=0.9, pad_to_multiple=8))


class TestAnswerService:
    """Threaded blocking front-end (serving.AnswerService): concurrent
    callers get tokens identical to solo generate; rejected configs raise
    to the caller without wedging the service thread."""

    def test_concurrent_callers_token_identical(self):
        import threading

        from stllm_tpu.serving import AnswerService

        params = init_llama(jax.random.PRNGKey(0), CFG)
        gen_g = GenerationConfig(max_new_tokens=11, eos_token_id=-1,
                                 stop_sequences=(), pad_to_multiple=8)
        gen_s = GenerationConfig(max_new_tokens=7, eos_token_id=-1,
                                 stop_sequences=(), pad_to_multiple=8,
                                 do_sample=True, top_p=0.85, temperature=0.9)
        cases = [(_req(1, 5), gen_g, 0), (_req(2, 9), gen_g, 0),
                 (_req(3, 7), gen_s, 17), (_req(4, 12), gen_g, 0),
                 (_req(5, 3), gen_s, 4)]
        want = [generate(params, emb, llama_cfg=CFG, gen=g, seed=s)[0]
                for emb, g, s in cases]

        svc = AnswerService(ContinuousBatcher(params, CFG, slots=2,
                                              max_len=64, chunk=4))
        got = [None] * len(cases)
        errs = []

        def call(i):
            try:
                emb, g, s = cases[i]
                got[i] = svc.answer(emb, g, seed=s)
            except Exception as e:  # surface thread failures to the assert
                errs.append((i, e))

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(len(cases))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        svc.close()
        assert not errs, errs
        assert got == want

    def test_rejected_config_raises_in_caller(self):
        import pytest

        from stllm_tpu.serving import AnswerService

        params = init_llama(jax.random.PRNGKey(0), CFG)
        svc = AnswerService(ContinuousBatcher(params, CFG, slots=1,
                                              max_len=32, chunk=4))
        with pytest.raises(ValueError):
            svc.answer(_req(1, 5),
                       GenerationConfig(max_new_tokens=4, num_beams=3,
                                        pad_to_multiple=8))
        # the service still works after a rejected submit
        gen = GenerationConfig(max_new_tokens=5, eos_token_id=-1,
                               stop_sequences=(), pad_to_multiple=8)
        want = generate(params, _req(2, 6), llama_cfg=CFG, gen=gen)[0]
        assert svc.answer(_req(2, 6), gen) == want
        svc.close()

    def test_step_failure_kills_service_not_waiters(self):
        """If the service thread's step() raises, blocked answer() callers
        get the error re-raised (no eternal wait on the condition variable)
        and later calls fail fast — the ADVICE round-4 wedge scenario."""
        import pytest

        from stllm_tpu.serving import AnswerService

        class _ExplodingBatcher:
            def __init__(self):
                self.queue, self.active = [], []

            def submit(self, rid, embeds, gen, *, seed=0):
                self.queue.append(rid)

            def step(self):
                raise RuntimeError("chip fell over")

        svc = AnswerService(_ExplodingBatcher())
        with pytest.raises(RuntimeError, match="AnswerService"):
            svc.answer(_req(1, 5), GenerationConfig(max_new_tokens=4,
                                                    pad_to_multiple=8))
        # service is dead: subsequent calls raise immediately, no hang
        with pytest.raises(RuntimeError, match="dead"):
            svc.answer(_req(2, 5), GenerationConfig(max_new_tokens=4,
                                                    pad_to_multiple=8))

    def test_unsupported_vs_genuine_valueerror(self):
        """Capability gaps raise UnsupportedRequest (callers fall back to
        solo generate); a malformed config raises plain ValueError so the
        fallback path does NOT swallow it."""
        import pytest

        from stllm_tpu.models.generation import UnsupportedRequest

        params = init_llama(jax.random.PRNGKey(0), CFG)
        cb = ContinuousBatcher(params, CFG, slots=1, max_len=32, chunk=4)
        with pytest.raises(UnsupportedRequest):
            cb.submit("beam", _req(1, 5),
                      GenerationConfig(max_new_tokens=4, num_beams=3,
                                       pad_to_multiple=8))
        with pytest.raises(UnsupportedRequest):
            cb.submit("long", _req(1, 5),
                      GenerationConfig(max_new_tokens=99, pad_to_multiple=8))
        with pytest.raises(ValueError) as ei:
            cb.submit("badp", _req(1, 5),
                      GenerationConfig(max_new_tokens=4, do_sample=True,
                                       top_p=0.0, pad_to_multiple=8))
        assert not isinstance(ei.value, UnsupportedRequest)
