"""Full-pipeline video-QA server (stllm_tpu/pipeline_serving.py): answers
are token-identical to the offline path (encode_img -> apply_video_input ->
text embedding splice -> generation.generate), across slot reuse, mixed
frame counts, and mixed budgets."""

import jax
import jax.numpy as jnp
import numpy as np

from stllm_tpu.models.generation import GenerationConfig, generate
from stllm_tpu.models.llama import LlamaConfig
from stllm_tpu.models.qformer import QFormerConfig
from stllm_tpu.models.stllm import (
    STLLMConfig, apply_video_input, encode_img, init_stllm)
from stllm_tpu.models.vit import ViTConfig
from stllm_tpu.pipeline_serving import VideoQAServer
from stllm_tpu.serving import ContinuousBatcher

CFG = STLLMConfig(
    vit=ViTConfig(image_size=56, patch_size=14, width=64, depth=2, heads=4,
                  mlp_hidden=128, dtype=jnp.float32, use_flash=False),
    qformer=QFormerConfig(hidden=32, num_layers=2, heads=4, intermediate=64,
                          encoder_width=64, num_query=8, vocab_size=128,
                          dtype=jnp.float32),
    llama=LlamaConfig(vocab_size=97, hidden=64, num_layers=2, heads=4,
                      intermediate=128, max_positions=512,
                      dtype=jnp.float32),
    video_input="residual",
    residual_size=2,
)


def _frames(seed, t):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(
        0, 256, (1, t, CFG.vit.image_size, CFG.vit.image_size, 3)), jnp.uint8)


def _ids(seed, n, vocab):
    rng = np.random.default_rng(100 + seed)
    return jnp.asarray(rng.integers(0, vocab, (1, n)), jnp.int32)


def _offline(params, frames, pre, suf, gen, q_ids=None, q_mask=None):
    vid = encode_img(params, frames, CFG, q_ids, q_mask)
    vid = apply_video_input(params, vid, CFG)
    table = params["llama"]["embed_tokens"]
    embeds = jnp.concatenate(
        [table[pre].astype(vid.dtype), vid, table[suf].astype(vid.dtype)],
        axis=1)
    return generate(params["llama"], embeds, llama_cfg=CFG.llama, gen=gen)[0]


class TestVideoQAServer:
    def test_matches_offline_pipeline(self):
        params = init_stllm(jax.random.PRNGKey(0), CFG,
                            init_llama_params=True)
        gen_s = GenerationConfig(max_new_tokens=4, eos_token_id=-1,
                                 stop_sequences=(), pad_to_multiple=8)
        gen_l = GenerationConfig(max_new_tokens=11, eos_token_id=-1,
                                 stop_sequences=(), pad_to_multiple=8)
        # mixed frame counts (different encode buckets), prefix lengths
        # (different pad buckets), budgets; more requests than slots
        reqs = [("a", _frames(1, 4), _ids(1, 5, 97), _ids(11, 3, 97), gen_l),
                ("b", _frames(2, 4), _ids(2, 9, 97), _ids(12, 3, 97), gen_s),
                ("c", _frames(3, 8), _ids(3, 5, 97), _ids(13, 3, 97), gen_l),
                ("d", _frames(4, 4), _ids(4, 5, 97), _ids(14, 3, 97), gen_s),
                ("e", _frames(5, 8), _ids(5, 7, 97), _ids(15, 3, 97), gen_l)]
        q_ids = _ids(9, 6, CFG.qformer.vocab_size)

        want = {rid: _offline(params, fr, pre, suf, g, q_ids)
                for rid, fr, pre, suf, g in reqs}

        srv = VideoQAServer(params, CFG, slots=2, max_len=128, chunk=4)
        for rid, fr, pre, suf, g in reqs:
            srv.submit(rid, fr, pre, suf, g, qformer_text_ids=q_ids)
        got = srv.run()
        assert set(got) == set(want)
        for rid in want:
            assert got[rid] == want[rid], rid

    def test_no_qformer_text(self):
        params = init_stllm(jax.random.PRNGKey(1), CFG,
                            init_llama_params=True)
        gen = GenerationConfig(max_new_tokens=6, eos_token_id=-1,
                               stop_sequences=(), pad_to_multiple=8)
        fr, pre, suf = _frames(7, 4), _ids(7, 4, 97), _ids(17, 2, 97)
        want = _offline(params, fr, pre, suf, gen)
        srv = VideoQAServer(params, CFG, slots=2, max_len=96, chunk=4)
        srv.submit("x", fr, pre, suf, gen)
        assert srv.run()["x"] == want

    def test_sampled_request_matches_offline_stream(self):
        """A do_sample request through the QA server draws from the same
        fold_in(PRNGKey(seed), token_index) stream as the offline path
        (encode -> generate(do_sample=True, seed=s)), with a greedy
        co-tenant present."""
        params = init_stllm(jax.random.PRNGKey(4), CFG,
                            init_llama_params=True)
        gs = GenerationConfig(max_new_tokens=7, eos_token_id=-1,
                              stop_sequences=(), pad_to_multiple=8,
                              do_sample=True, top_p=0.85, temperature=0.9)
        gg = GenerationConfig(max_new_tokens=5, eos_token_id=-1,
                              stop_sequences=(), pad_to_multiple=8)
        fr, pre, suf = _frames(9, 4), _ids(9, 4, 97), _ids(19, 2, 97)

        vid = encode_img(params, fr, CFG)
        vid = apply_video_input(params, vid, CFG)
        table = params["llama"]["embed_tokens"]
        embeds = jnp.concatenate(
            [table[pre].astype(vid.dtype), vid, table[suf].astype(vid.dtype)],
            axis=1)
        want = generate(params["llama"], embeds, llama_cfg=CFG.llama,
                        gen=gs, seed=21)[0]

        srv = VideoQAServer(params, CFG, slots=2, max_len=96, chunk=4)
        srv.submit("s", fr, pre, suf, gs, seed=21)
        srv.submit("g", _frames(10, 4), _ids(10, 3, 97), _ids(20, 2, 97), gg)
        got = srv.run()
        assert got["s"] == want
        assert len(got["g"]) == 5

    def test_overlong_request_rejected_at_submit(self):
        params = init_stllm(jax.random.PRNGKey(2), CFG,
                            init_llama_params=True)
        srv = VideoQAServer(params, CFG, slots=2, max_len=48, chunk=4)
        gen = GenerationConfig(max_new_tokens=40, eos_token_id=-1,
                               stop_sequences=(), pad_to_multiple=8)
        try:
            srv.submit("big", _frames(8, 4), _ids(8, 6, 97), _ids(18, 3, 97),
                       gen)
        except ValueError as e:
            assert "max_len" in str(e)
        else:
            raise AssertionError("overlong request was not rejected")

    def test_spec_mode_batcher_token_identical(self):
        """Speculative decode composes with the QA server: a spec-mode
        ContinuousBatcher (draft == target exercises the accept-all path)
        plugged in via ``batcher=`` yields the same answers as offline
        greedy."""
        params = init_stllm(jax.random.PRNGKey(5), CFG,
                            init_llama_params=True)
        gen = GenerationConfig(max_new_tokens=9, eos_token_id=-1,
                               stop_sequences=(), pad_to_multiple=8)
        reqs = [(rid, _frames(30 + i, 4), _ids(30 + i, 4, 97),
                 _ids(50 + i, 2, 97))
                for i, rid in enumerate(("a", "b", "c"))]
        want = {rid: _offline(params, fr, pre, suf, gen)
                for rid, fr, pre, suf in reqs}
        cb = ContinuousBatcher(params["llama"], CFG.llama, slots=2,
                               max_len=96, chunk=4,
                               draft_params=params["llama"],
                               draft_cfg=CFG.llama, spec_k=3, spec_rounds=2)
        srv = VideoQAServer(params, CFG, batcher=cb)
        for rid, fr, pre, suf in reqs:
            srv.submit(rid, fr, pre, suf, gen)
        got = srv.run()
        for rid in want:
            assert got[rid] == want[rid], rid

    def test_tp_sharded_server_matches_single_device(self):
        """The whole QA server (encode + batched decode) runs under a
        (data, model) mesh with TP param shardings — GSPMD propagates the
        shardings through the encode, prefill, and cache carries — and
        emits the same answers as single-device execution."""
        from stllm_tpu.parallel.mesh import make_mesh
        from stllm_tpu.parallel.sharding import stllm_param_shardings

        params = init_stllm(jax.random.PRNGKey(6), CFG,
                            init_llama_params=True)
        gen = GenerationConfig(max_new_tokens=6, eos_token_id=-1,
                               stop_sequences=(), pad_to_multiple=8)
        reqs = [(rid, _frames(60 + i, 4), _ids(60 + i, 4, 97),
                 _ids(70 + i, 2, 97))
                for i, rid in enumerate(("a", "b", "c"))]
        want = {rid: _offline(params, fr, pre, suf, gen)
                for rid, fr, pre, suf in reqs}

        mesh = make_mesh(data=4, model=2)
        p_sh = stllm_param_shardings(mesh, params, min_size=64)
        sharded = jax.device_put(params, p_sh)
        srv = VideoQAServer(sharded, CFG, slots=2, max_len=96, chunk=4)
        for rid, fr, pre, suf in reqs:
            srv.submit(rid, fr, pre, suf, gen)
        got = srv.run()
        for rid in want:
            assert got[rid] == want[rid], rid

    def test_lazy_encode_interleaves_with_decode(self):
        """A burst larger than the slot count must not encode everything
        up front: the encode queue drains as slots free."""
        params = init_stllm(jax.random.PRNGKey(3), CFG,
                            init_llama_params=True)
        gen = GenerationConfig(max_new_tokens=5, eos_token_id=-1,
                               stop_sequences=(), pad_to_multiple=8)
        srv = VideoQAServer(params, CFG, slots=2, max_len=96, chunk=4)
        for i in range(5):
            srv.submit(i, _frames(20 + i, 4), _ids(20 + i, 4, 97),
                       _ids(40 + i, 2, 97), gen)
        first = srv.step()   # may already finish slots: budget 5 = 1 + chunk 4
        # two slots -> exactly two requests encoded+admitted, three waiting
        assert len(srv.encode_queue) == 3
        out = {r.rid: r.tokens for r in first}
        out.update(srv.run())
        assert set(out) == set(range(5))
        want = {i: _offline(params, _frames(20 + i, 4), _ids(20 + i, 4, 97),
                            _ids(40 + i, 2, 97), gen) for i in range(5)}
        for i in range(5):
            assert out[i] == want[i], i


class TestSharedPrefix:
    """Cross-request prefix sharing (submit(prefix_key=...)): same-key
    requests reuse ONE system+video prefill — answers identical to the
    unshared path, the encode actually skipped on hits, guard changes
    (different q_ids) forcing a fresh prefill, and LRU eviction freeing
    device memory without wrong answers afterwards."""

    def _setup(self, monkeypatch):
        import stllm_tpu.pipeline_serving as ps

        params = init_stllm(jax.random.PRNGKey(0), CFG,
                            init_llama_params=True)
        calls = {"encode": 0}
        real = ps._encode_assemble

        def counting(*a, **kw):
            calls["encode"] += 1
            return real(*a, **kw)

        monkeypatch.setattr(ps, "_encode_assemble", counting)
        return params, calls

    def test_same_key_identical_and_encode_skipped(self, monkeypatch):
        params, calls = self._setup(monkeypatch)
        gen = GenerationConfig(max_new_tokens=6, eos_token_id=-1,
                               stop_sequences=(), pad_to_multiple=8)
        fr = _frames(7, 4)
        pre = _ids(21, 5, 97)
        q_ids = _ids(9, 6, CFG.qformer.vocab_size)
        sufs = {r: _ids(30 + i, 3, 97) for i, r in enumerate("abc")}
        want = {r: _offline(params, fr, pre, s, gen, q_ids)
                for r, s in sufs.items()}

        srv = VideoQAServer(params, CFG, slots=2, max_len=128, chunk=4)
        for r, s in sufs.items():
            srv.submit(r, fr, pre, s, gen, qformer_text_ids=q_ids,
                       prefix_key="vid7")
        got = srv.run()
        assert got == want
        # one encode for the whole key (the first request), not three
        assert calls["encode"] == 1
        assert list(srv._prefix_lru) == ["vid7"]

    def test_guard_mismatch_forces_fresh_prefill(self, monkeypatch):
        params, calls = self._setup(monkeypatch)
        gen = GenerationConfig(max_new_tokens=5, eos_token_id=-1,
                               stop_sequences=(), pad_to_multiple=8)
        fr = _frames(8, 4)
        pre, suf = _ids(22, 5, 97), _ids(23, 3, 97)
        qa = _ids(9, 6, CFG.qformer.vocab_size)
        qb = _ids(10, 6, CFG.qformer.vocab_size)

        srv = VideoQAServer(params, CFG, slots=2, max_len=128, chunk=4)
        srv.submit("a", fr, pre, suf, gen, qformer_text_ids=qa,
                   prefix_key="k")
        srv.submit("b", fr, pre, suf, gen, qformer_text_ids=qb,
                   prefix_key="k")
        got = srv.run()
        assert got["a"] == _offline(params, fr, pre, suf, gen, qa)
        assert got["b"] == _offline(params, fr, pre, suf, gen, qb)
        assert calls["encode"] == 2   # different q_ids: guard missed

    def test_eviction_with_queued_same_step_admits(self, monkeypatch):
        """Several distinct-key requests admitted in ONE step(): the LRU
        insert for a later key must not delete device buffers a
        still-queued batcher request holds as its prefix (regression: the
        old eviction called leaf.delete() and the drain crashed with
        'Array has been deleted' whenever slots > prefix_cache_size)."""
        params, calls = self._setup(monkeypatch)
        gen = GenerationConfig(max_new_tokens=4, eos_token_id=-1,
                               stop_sequences=(), pad_to_multiple=8)
        q_ids = _ids(9, 6, CFG.qformer.vocab_size)
        vids = {k: _frames(50 + i, 4) for i, k in enumerate("pqr")}
        pre, suf = _ids(26, 5, 97), _ids(27, 3, 97)

        # slots >= #keys: all three _admit_one calls run before the
        # batcher admits any of them; cache_size=1 evicts p and q while
        # their requests still sit in batcher.queue
        srv = VideoQAServer(params, CFG, slots=4, max_len=128, chunk=4,
                            prefix_cache_size=1)
        for i, (k, fr) in enumerate(vids.items()):
            srv.submit(f"{k}{i}", fr, pre, suf, gen,
                       qformer_text_ids=q_ids, prefix_key=k)
        got = srv.run()
        want = {k: _offline(params, fr, pre, suf, gen, q_ids)
                for k, fr in vids.items()}
        assert got == {"p0": want["p"], "q1": want["q"], "r2": want["r"]}

    def test_qformer_mask_change_misses_guard(self, monkeypatch):
        """Same prefix_key + same q_ids but a different qformer_text_mask
        shapes a different video embedding — the guard must miss and
        re-encode (regression: the guard hashed only q_ids, so the second
        request silently reused the first mask's embedding)."""
        params, calls = self._setup(monkeypatch)
        gen = GenerationConfig(max_new_tokens=5, eos_token_id=-1,
                               stop_sequences=(), pad_to_multiple=8)
        fr = _frames(12, 4)
        pre, suf = _ids(28, 5, 97), _ids(29, 3, 97)
        q_ids = _ids(9, 6, CFG.qformer.vocab_size)
        full = jnp.ones_like(q_ids)
        short = full.at[:, -3:].set(0)

        srv = VideoQAServer(params, CFG, slots=2, max_len=128, chunk=4)
        srv.submit("a", fr, pre, suf, gen, qformer_text_ids=q_ids,
                   qformer_text_mask=full, prefix_key="k")
        srv.submit("b", fr, pre, suf, gen, qformer_text_ids=q_ids,
                   qformer_text_mask=short, prefix_key="k")
        got = srv.run()
        assert got["a"] == _offline(params, fr, pre, suf, gen, q_ids, full)
        assert got["b"] == _offline(params, fr, pre, suf, gen, q_ids, short)
        assert calls["encode"] == 2   # mask change: guard missed

    def test_lru_eviction_then_correct_answers(self, monkeypatch):
        params, calls = self._setup(monkeypatch)
        gen = GenerationConfig(max_new_tokens=4, eos_token_id=-1,
                               stop_sequences=(), pad_to_multiple=8)
        q_ids = _ids(9, 6, CFG.qformer.vocab_size)
        vids = {k: _frames(40 + i, 4) for i, k in enumerate("xyz")}
        pre, suf = _ids(24, 5, 97), _ids(25, 3, 97)

        srv = VideoQAServer(params, CFG, slots=1, max_len=128, chunk=4,
                            prefix_cache_size=1)
        for i, (k, fr) in enumerate(vids.items()):
            srv.submit(f"{k}{i}", fr, pre, suf, gen, qformer_text_ids=q_ids,
                       prefix_key=k)
        # re-ask the first video AFTER it was evicted by y and z
        srv.submit("x_again", vids["x"], pre, suf, gen,
                   qformer_text_ids=q_ids, prefix_key="x")
        got = srv.run()
        assert len(srv._prefix_lru) == 1
        want = {k: _offline(params, fr, pre, suf, gen, q_ids)
                for k, fr in vids.items()}
        assert got["x0"] == want["x"] and got["x_again"] == want["x"]
        assert got["y1"] == want["y"] and got["z2"] == want["z"]

    def test_submit_check_matches_batcher_admission(self, monkeypatch):
        """The submit-time length check must use the BATCHER's formula for
        prefix-shared requests — `plen + pad_up(suffix)`, not
        `pad_up(plen + suffix)` (up to pad_to_multiple-1 smaller).
        Regression: a request in that window was accepted at submit, then
        ContinuousBatcher.submit raised UnsupportedRequest from inside
        step()/run(), aborting the whole drain."""
        import pytest

        from stllm_tpu.models.generation import UnsupportedRequest

        params, calls = self._setup(monkeypatch)
        gen = GenerationConfig(max_new_tokens=4, eos_token_id=-1,
                               stop_sequences=(), pad_to_multiple=8)
        fr = _frames(31, 4)
        pre, suf = _ids(32, 5, 97), _ids(33, 3, 97)
        # plen = 5 + 16 video tokens = 21 (not a multiple of 8), slen = 3:
        # pad_up(21+3)+4 = 28 <= max_len=28 < 21+pad_up(3)+4 = 33
        srv = VideoQAServer(params, CFG, slots=2, max_len=28, chunk=4)
        with pytest.raises(UnsupportedRequest):
            srv.submit("a", fr, pre, suf, gen, prefix_key="k")
        # same shape WITHOUT prefix sharing fits (concatenated pad) and
        # must still be accepted and drain to the offline answer
        srv.submit("b", fr, pre, suf, gen)
        assert srv.run() == {"b": _offline(params, fr, pre, suf, gen)}

    def test_prefix_request_at_exact_boundary_drains(self, monkeypatch):
        """A prefix-shared pair sized to land exactly on the admission
        bound (plen + pad_up(suffix) + budget == max_len) must drain with
        offline-identical answers — proof the submit-time and batcher
        formulas agree at the edge."""
        params, calls = self._setup(monkeypatch)
        gen = GenerationConfig(max_new_tokens=4, eos_token_id=-1,
                               stop_sequences=(), pad_to_multiple=8)
        fr = _frames(34, 4)
        pre, suf = _ids(35, 5, 97), _ids(36, 3, 97)
        # 21 + pad_up(3)=8 + 4 == 33
        srv = VideoQAServer(params, CFG, slots=2, max_len=33, chunk=4)
        srv.submit("a", fr, pre, suf, gen, prefix_key="k")
        srv.submit("b", fr, pre, suf, gen, prefix_key="k")
        want = _offline(params, fr, pre, suf, gen)
        assert srv.run() == {"a": want, "b": want}
        assert calls["encode"] == 1


def test_admitted_request_releases_prefix_and_embeds():
    """Once a slot holds the delta-prefilled copy, the Request must drop
    its handles on the shared prefix KV and the prompt embeddings — an
    LRU-evicted prefix (~0.37 GiB at 7B bf16) must not stay pinned on
    device for the request's whole decode (VideoQAServer's eviction
    comment promises it is freed at admit)."""
    from stllm_tpu.models.generation import _pad_prompt, _prefill

    params = init_stllm(jax.random.PRNGKey(1), CFG, init_llama_params=True)
    lp = params["llama"]
    gen = GenerationConfig(max_new_tokens=6, eos_token_id=-1,
                           stop_sequences=(), pad_to_multiple=8)
    rng = np.random.default_rng(7)
    plen = 11
    pemb, pmask = _pad_prompt(
        jnp.asarray(rng.normal(size=(1, plen, 64)) * 0.02, jnp.float32),
        jnp.ones((1, plen), jnp.int32), 8)
    _, pkv = _prefill(lp, pemb, pmask, CFG.llama, pemb.shape[1])
    suf = jnp.asarray(rng.normal(size=(1, 3, 64)) * 0.02, jnp.float32)

    cb = ContinuousBatcher(lp, CFG.llama, slots=2, max_len=64, chunk=4)
    cb.submit("a", suf, gen, prefix=pkv, prefix_len=plen)
    cb.step()   # admits into a slot
    req = next(r for r in cb.active if r is not None)
    assert req.prefix is None and req.embeds is None
    cb.run()
