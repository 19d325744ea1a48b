"""PrefixSession (generation.py): multi-turn KV reuse produces tokens
identical to from-scratch generate, across greedy/sampled/int8-KV forms,
and degrades to a full re-prefill (never a wrong answer) on any prefix
mismatch. fp32 configs so cross-program-shape equality is bitwise (the
bf16 caveat is the spec-decode exactness class, see PrefixSession's
docstring)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stllm_tpu.models.generation import (
    GenerationConfig, PrefixSession, generate)
from stllm_tpu.models.llama import LlamaConfig, init_llama

CFG = LlamaConfig(vocab_size=97, hidden=48, num_layers=2, heads=4,
                  intermediate=96, max_positions=256, dtype=jnp.float32)


def _emb(seed, s):
    return jax.random.normal(jax.random.PRNGKey(seed), (1, s, CFG.hidden),
                             jnp.float32) * 0.1


def _titems(ids):
    return [("t", int(t)) for t in ids]


def _embed(params, ids):
    return params["embed_tokens"][jnp.asarray([ids], jnp.int32)].astype(
        jnp.float32)


class TestPrefixSession:
    def _run_turns(self, params, gen, seed=0, cfg=CFG):
        """Three growing turns: each prompt extends the previous prompt +
        its generated answer (the multi-turn chat shape). Returns
        (session outputs, solo outputs, reuse counts)."""
        sess = PrefixSession(params, cfg, max_len=160)
        base = _emb(1, 14)
        items = _titems(range(100, 114))
        got, want, reused = [], [], []
        embs = base
        for turn in range(3):
            want.append(generate(params, embs, llama_cfg=cfg, gen=gen,
                                 seed=seed)[0])
            got.append(sess.generate(embs, items, gen, seed=seed))
            reused.append(sess.last_reused)
            # next turn: answer tokens + a fresh question suffix
            ans = got[-1]
            q = list(range(200 + 10 * turn, 206 + 10 * turn))
            embs = jnp.concatenate(
                [embs, _embed(params, ans), _embed(params, q)], axis=1)
            items = items + _titems(ans) + _titems(q)
        return got, want, reused

    def test_multiturn_greedy_token_identical(self):
        params = init_llama(jax.random.PRNGKey(0), CFG)
        gen = GenerationConfig(max_new_tokens=9, eos_token_id=-1,
                               stop_sequences=(), pad_to_multiple=8)
        got, want, reused = self._run_turns(params, gen)
        assert got == want
        assert reused[0] == 0
        # turns 2-3 reuse the whole previous prompt + all but the last
        # generated token (its KV may not have been fed back)
        assert reused[1] >= 14 + 9 - 1
        assert reused[2] > reused[1]

    def test_multiturn_sampled_stream_identical(self):
        params = init_llama(jax.random.PRNGKey(3), CFG)
        gen = GenerationConfig(max_new_tokens=7, eos_token_id=-1,
                               stop_sequences=(), pad_to_multiple=8,
                               do_sample=True, top_p=0.85, temperature=0.9)
        got, want, reused = self._run_turns(params, gen, seed=11)
        assert got == want
        assert reused[1] > 0 and reused[2] > reused[1]

    def test_kv_int8_session_identical(self):
        import dataclasses

        cfg = dataclasses.replace(CFG, kv_int8=True)
        params = init_llama(jax.random.PRNGKey(5), cfg)
        gen = GenerationConfig(max_new_tokens=8, eos_token_id=-1,
                               stop_sequences=(), pad_to_multiple=8)
        got, want, reused = self._run_turns(params, gen, cfg=cfg)
        assert got == want
        assert reused[1] > 0

    def test_stop_sequences_and_eos(self):
        """Stop handling runs through the same chunked host loop as solo
        generate — identical truncation."""
        params = init_llama(jax.random.PRNGKey(7), CFG)
        emb = _emb(8, 10)
        free = generate(params, emb, llama_cfg=CFG,
                        gen=GenerationConfig(max_new_tokens=24,
                                             eos_token_id=-1,
                                             stop_sequences=(),
                                             pad_to_multiple=8))[0]
        gen = GenerationConfig(max_new_tokens=24, eos_token_id=-1,
                               stop_sequences=((free[5],),),
                               pad_to_multiple=8)
        want = generate(params, emb, llama_cfg=CFG, gen=gen)[0]
        sess = PrefixSession(params, CFG, max_len=96)
        assert sess.generate(emb, _titems(range(100, 110)), gen) == want

    def test_prefix_mismatch_reprefills(self):
        """An edited mid-prompt token kills the match at that position; the
        answer still equals from-scratch generate."""
        params = init_llama(jax.random.PRNGKey(9), CFG)
        gen = GenerationConfig(max_new_tokens=6, eos_token_id=-1,
                               stop_sequences=(), pad_to_multiple=8)
        sess = PrefixSession(params, CFG, max_len=96)
        emb1 = _emb(10, 12)
        sess.generate(emb1, _titems(range(100, 112)), gen)
        # same length, token 3 differs -> match stops at 3
        emb2 = emb1.at[:, 3].set(_emb(11, 12)[:, 3])
        items2 = _titems(range(100, 112))
        items2[3] = ("t", 999)
        want = generate(params, emb2, llama_cfg=CFG, gen=gen)[0]
        assert sess.generate(emb2, items2, gen) == want
        assert sess.last_reused == 3

    def test_fully_cached_prompt_recomputes_last_token(self):
        """Asking the identical prompt twice: the match is capped at s-1 so
        the last position's logits are recomputed fresh."""
        params = init_llama(jax.random.PRNGKey(13), CFG)
        gen = GenerationConfig(max_new_tokens=5, eos_token_id=-1,
                               stop_sequences=(), pad_to_multiple=8)
        sess = PrefixSession(params, CFG, max_len=96)
        emb = _emb(14, 9)
        items = _titems(range(100, 109))
        first = sess.generate(emb, items, gen)
        again = sess.generate(emb, items, gen)
        assert first == again == generate(params, emb, llama_cfg=CFG,
                                          gen=gen)[0]
        assert sess.last_reused == 8

    def test_rejected_configs_raise(self):
        params = init_llama(jax.random.PRNGKey(15), CFG)
        sess = PrefixSession(params, CFG, max_len=64)
        emb = _emb(16, 8)
        items = _titems(range(100, 108))
        with pytest.raises(ValueError):
            sess.generate(emb, items, GenerationConfig(max_new_tokens=4,
                                                       num_beams=3))
        with pytest.raises(ValueError):  # prompt + budget > max_len
            sess.generate(emb, items, GenerationConfig(max_new_tokens=60))
        with pytest.raises(ValueError):  # items/embeds mismatch
            sess.generate(emb, items[:-1],
                          GenerationConfig(max_new_tokens=4))
        # still serviceable after rejections
        gen = GenerationConfig(max_new_tokens=5, eos_token_id=-1,
                               stop_sequences=(), pad_to_multiple=8)
        assert sess.generate(emb, items, gen) == generate(
            params, emb, llama_cfg=CFG, gen=gen)[0]

    def test_repetition_penalty_host_loop(self):
        """Penalty/min_length configs (the simple-prompt chat mode,
        reference conversation.py:220) run the chunked on-device penalized
        loop on top of the delta prefill — pinned against the host-loop
        greedy oracle, identical to solo generate, across turns."""
        params = init_llama(jax.random.PRNGKey(21), CFG)
        gen = GenerationConfig(max_new_tokens=7, eos_token_id=-1,
                               stop_sequences=(), pad_to_multiple=8,
                               repetition_penalty=1.5, min_length=2)
        got, want, reused = self._run_turns(params, gen, seed=5)
        assert got == want
        assert reused[1] > 0 and reused[2] > reused[1]

    def test_padded_delta_near_max_len_stays_exact(self):
        """A short delta right at the cache boundary pads PAST max_len
        (pad_to_multiple rounding); the session must drop matched tokens
        until the padded write span fits instead of letting
        dynamic_update_slice clamp the write onto committed positions
        (silent KV corruption). Tokens must equal solo generate."""
        params = init_llama(jax.random.PRNGKey(23), CFG)
        gen = GenerationConfig(max_new_tokens=2, eos_token_id=-1,
                               stop_sequences=(), pad_to_multiple=8)
        sess = PrefixSession(params, CFG, max_len=48)
        emb1 = _emb(24, 33)
        items1 = _titems(range(100, 133))
        ans1 = sess.generate(emb1, items1, gen)
        # turn 2: history grows to s=46; the matched prefix p=34 would
        # write a 16-slot padded delta to 50 > 48 without the guard
        q = list(range(300, 311))
        emb2 = jnp.concatenate(
            [emb1, _embed(params, ans1), _embed(params, q)], axis=1)
        items2 = items1 + _titems(ans1) + _titems(q)
        assert emb2.shape[1] == 46
        want = generate(params, emb2, llama_cfg=CFG, gen=gen)[0]
        assert sess.generate(emb2, items2, gen) == want
        assert 0 < sess.last_reused <= 32  # reduced so p + pad(s-p) <= 48

    def test_padded_prompt_past_max_len_raises(self):
        """Even when s + budget fits, a from-scratch prefill writes pad(s)
        slots; reject when that alone exceeds max_len."""
        params = init_llama(jax.random.PRNGKey(25), CFG)
        sess = PrefixSession(params, CFG, max_len=50)
        emb = _emb(26, 49)
        items = _titems(range(100, 149))
        with pytest.raises(ValueError):  # pad(49) = 56 > 50
            sess.generate(emb, items,
                          GenerationConfig(max_new_tokens=1, eos_token_id=-1,
                                           stop_sequences=(),
                                           pad_to_multiple=8))

    def test_release_frees_and_recovers(self):
        params = init_llama(jax.random.PRNGKey(17), CFG)
        gen = GenerationConfig(max_new_tokens=5, eos_token_id=-1,
                               stop_sequences=(), pad_to_multiple=8)
        sess = PrefixSession(params, CFG, max_len=64)
        emb = _emb(18, 10)
        items = _titems(range(100, 110))
        want = sess.generate(emb, items, gen)
        sess.release()
        assert sess.cache is None and sess.items == []
        assert sess.generate(emb, items, gen) == want
        assert sess.last_reused == 0

    def test_recovers_from_died_turn(self):
        """A turn that dies AFTER donating the cache (device error inside
        _prefill_delta) leaves cache=None with stale non-empty items; the
        next generate must re-prefill from scratch, not dereference None
        (regression: AttributeError on self.cache.k[0] forever after)."""
        params = init_llama(jax.random.PRNGKey(19), CFG)
        gen = GenerationConfig(max_new_tokens=5, eos_token_id=-1,
                               stop_sequences=(), pad_to_multiple=8)
        sess = PrefixSession(params, CFG, max_len=64)
        emb = _emb(20, 10)
        items = _titems(range(100, 110))
        want = sess.generate(emb, items, gen)
        # simulate the mid-turn failure state: donation point reached,
        # items never updated for the failed turn
        sess.cache = None
        got = sess.generate(emb, items, gen)
        assert got == want
        assert sess.last_reused == 0   # full re-prefill, no stale reuse


class TestItems:
    def test_video_identity_semantics(self):
        a = jnp.zeros((1, 3, 8))
        b = jnp.zeros((1, 3, 8))  # equal values, different array
        ia = PrefixSession.items_for([[1, 2], [7]], [a])
        ia2 = PrefixSession.items_for([[1, 2], [7]], [a])
        ib = PrefixSession.items_for([[1, 2], [7]], [b])
        assert ia == ia2            # same upload -> matches
        assert ia != ib             # different upload never matches
        assert len(ia) == 2 + 3 + 1

    def test_text_tokens_compare_by_id(self):
        x = PrefixSession.items_for([[5, 6, 7]], [])
        y = PrefixSession.items_for([[5, 6, 8]], [])
        assert x[:2] == y[:2] and x[2] != y[2]


class TestChatIntegration:
    def test_chat_two_turns_identical(self):
        """Chat.answer(kv_session=...) across two turns returns the same
        answers as the plain path, and the second turn actually reuses."""
        from stllm_tpu.conversation import CONV_VIDEO_Vicuna0, Chat
        from stllm_tpu.models.llama import LlamaConfig as LC
        from stllm_tpu.models.qformer import QFormerConfig
        from stllm_tpu.models.stllm import STLLMConfig, init_stllm
        from stllm_tpu.models.vit import ViTConfig
        from tests.test_conversation import ToyTokenizer

        tiny = STLLMConfig(
            vit=ViTConfig(image_size=28, patch_size=14, width=32, depth=2,
                          heads=2, mlp_hidden=64, dtype=jnp.float32,
                          use_flash=False),
            qformer=QFormerConfig(hidden=16, num_layers=2, heads=2,
                                  intermediate=32, encoder_width=32,
                                  num_query=4, vocab_size=64,
                                  dtype=jnp.float32),
            llama=LC(vocab_size=4096, hidden=32, num_layers=2, heads=2,
                     intermediate=64, max_positions=1024, dtype=jnp.float32),
            video_input="mean",
        )
        params = init_stllm(jax.random.PRNGKey(0), tiny)
        chat = Chat(params, tiny, ToyTokenizer(),
                    qformer_tokenizer=ToyTokenizer(64), image_size=28)
        frames = np.random.default_rng(0).integers(
            0, 256, (4, 40, 40, 3)).astype(np.uint8)

        def run(kv_session):
            conv = CONV_VIDEO_Vicuna0.copy()
            img_list = []
            chat.upload_video(frames, conv, img_list)
            answers = []
            for q in ("what is happening?", "and then what?"):
                chat.ask(q, conv)
                text, _ = chat.answer(conv=conv, img_list=img_list,
                                      do_sample=False, max_new_tokens=6,
                                      kv_session=kv_session)
                answers.append(text)
            return answers

        sess = PrefixSession(params["llama"], tiny.llama, max_len=256)
        with_sess = run(sess)
        assert sess.last_reused > 0, "turn 2 must take the delta path"
        assert run(None) == with_sess

    def test_chat_sim_mode_reuses_video_prefix(self):
        """The demo's simple-prompt mode (instruction=False, forced
        repetition_penalty=1.5 — reference conversation.py:220) reuses the
        video+system prefix across turns through the host-loop path."""
        from stllm_tpu.conversation import CONV_instructblip_Vicuna0, Chat
        from stllm_tpu.models.llama import LlamaConfig as LC
        from stllm_tpu.models.qformer import QFormerConfig
        from stllm_tpu.models.stllm import STLLMConfig, init_stllm
        from stllm_tpu.models.vit import ViTConfig
        from tests.test_conversation import ToyTokenizer

        tiny = STLLMConfig(
            vit=ViTConfig(image_size=28, patch_size=14, width=32, depth=2,
                          heads=2, mlp_hidden=64, dtype=jnp.float32,
                          use_flash=False),
            qformer=QFormerConfig(hidden=16, num_layers=2, heads=2,
                                  intermediate=32, encoder_width=32,
                                  num_query=4, vocab_size=64,
                                  dtype=jnp.float32),
            llama=LC(vocab_size=4096, hidden=32, num_layers=2, heads=2,
                     intermediate=64, max_positions=1024, dtype=jnp.float32),
            video_input="mean",
        )
        params = init_stllm(jax.random.PRNGKey(2), tiny)
        chat = Chat(params, tiny, ToyTokenizer(),
                    qformer_tokenizer=ToyTokenizer(64), image_size=28)
        frames = np.random.default_rng(1).integers(
            0, 256, (4, 40, 40, 3)).astype(np.uint8)

        def run(kv_session):
            conv = CONV_instructblip_Vicuna0.copy()
            img_list = []
            chat.upload_video(frames, conv, img_list)
            answers = []
            for q in ("what is it?", "how many?"):
                chat.ask(q, conv)
                text, _ = chat.answer(conv=conv, img_list=img_list,
                                      do_sample=False, max_new_tokens=5,
                                      kv_session=kv_session)
                answers.append(text)
            return answers

        sess = PrefixSession(params["llama"], tiny.llama, max_len=256)
        with_sess = run(sess)
        assert sess.last_reused > 0, "sim-mode turn 2 must reuse the prefix"
        assert run(None) == with_sess
