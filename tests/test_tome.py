"""Token merging (ops/tome.py): bipartite-match semantics vs a plain numpy
oracle, origin-map/unmerge correctness, and the staged schedule through
vit_forward + encode_img."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from stllm_tpu.ops.tome import bipartite_merge, init_merge_state, unmerge


def _oracle_merge(x, sizes, m):
    """Loop-based reference of one merge stage. Returns (x', sizes',
    new_of_old) where new_of_old maps pre-merge index -> post-merge index."""
    b, n, d = x.shape
    r = n - m
    out_x, out_s, out_map = [], [], []
    for row in range(b):
        xr = x[row].astype(np.float64)
        sr = sizes[row].astype(np.float64)
        a_idx = list(range(1, n, 2))
        b_idx = list(range(0, n, 2))
        met = xr / np.maximum(np.linalg.norm(xr, axis=-1, keepdims=True), 1e-6)
        scores = met[a_idx] @ met[b_idx].T
        scores[:, 0] = -np.inf                       # CLS protected
        best_dst = scores.argmax(axis=1)
        best_val = scores.max(axis=1)
        merge_rank = np.argsort(-best_val, kind="stable")[:r]
        picked = set(int(i) for i in merge_rank)

        nb = len(b_idx)
        new_x = xr[b_idx].copy()
        new_s = sr[b_idx].copy()
        # accumulate merged mass, then average
        acc = np.zeros_like(new_x)
        accs = np.zeros(nb)
        for k in picked:
            acc[best_dst[k]] += xr[a_idx[k]] * sr[a_idx[k]]
            accs[best_dst[k]] += sr[a_idx[k]]
        tot = new_s + accs
        new_x = (new_x * new_s[:, None] + acc) / tot[:, None]
        new_s = tot

        keep = [k for k in range(len(a_idx)) if k not in picked]
        new_of_old = np.zeros(n, np.int64)
        for j, bi in enumerate(b_idx):
            new_of_old[bi] = j
        for rank, k in enumerate(keep):
            new_of_old[a_idx[k]] = nb + rank
        surv_x = (np.stack([xr[a_idx[k]] for k in keep]) if keep
                  else np.zeros((0, d)))
        surv_s = np.array([sr[a_idx[k]] for k in keep])
        new_x = np.concatenate([new_x, surv_x])
        new_s = np.concatenate([new_s, surv_s])
        for k in picked:
            new_of_old[a_idx[k]] = best_dst[k]
        out_x.append(new_x)
        out_s.append(new_s)
        out_map.append(new_of_old)
    return np.stack(out_x), np.stack(out_s), np.stack(out_map)


class TestBipartiteMerge:
    def test_matches_numpy_oracle(self):
        rng = np.random.default_rng(0)
        b, n, d, m = 3, 17, 8, 12
        x = rng.normal(size=(b, n, d)).astype(np.float32)
        sizes, origin = init_merge_state(b, n)
        got_x, got_s, got_o = bipartite_merge(
            jnp.asarray(x), sizes, origin, m)
        want_x, want_s, want_map = _oracle_merge(x, np.ones((b, n)), m)
        assert got_x.shape == (b, m, d)
        np.testing.assert_allclose(np.asarray(got_x), want_x, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_s), want_s, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(got_o), want_map)

    def test_duplicates_merge_and_unmerge_restores(self):
        rng = np.random.default_rng(1)
        b, n, d = 2, 9, 6
        x = rng.normal(size=(b, n, d)).astype(np.float32) * 3
        # plant exact duplicates: odd token 3 == even token 4 (per row)
        x[:, 3] = x[:, 4]
        sizes, origin = init_merge_state(b, n)
        out, s, o = bipartite_merge(jnp.asarray(x), sizes, origin, n - 1)
        o = np.asarray(o)
        # the duplicate pair collapsed: both old positions map to one token
        assert (o[:, 3] == o[:, 4]).all()
        merged = np.asarray(out)
        np.testing.assert_allclose(
            merged[np.arange(b), o[:, 3]], x[:, 3], atol=1e-5)
        # mass is conserved
        np.testing.assert_allclose(np.asarray(s).sum(axis=1), n, atol=1e-5)
        # unmerge: every original position reads its representative
        rec = np.asarray(unmerge(out, jnp.asarray(o)))
        assert rec.shape == (b, n, d)
        np.testing.assert_allclose(rec[:, 3], x[:, 3], atol=1e-5)
        np.testing.assert_allclose(rec[:, 4], x[:, 4], atol=1e-5)

    def test_cls_never_merged_into(self):
        rng = np.random.default_rng(2)
        b, n, d = 2, 11, 4
        x = rng.normal(size=(b, n, d)).astype(np.float32)
        x[:, 5] = x[:, 0]  # odd token identical to CLS — still must not merge
        sizes, origin = init_merge_state(b, n)
        out, s, o = bipartite_merge(jnp.asarray(x), sizes, origin, n - 5)
        # CLS survives untouched at index 0 with size 1
        np.testing.assert_allclose(np.asarray(out)[:, 0], x[:, 0], atol=1e-6)
        assert (np.asarray(s)[:, 0] == 1.0).all()
        assert (np.asarray(o)[:, 0] == 0).all()

    def test_two_stages_compose_origin(self):
        rng = np.random.default_rng(3)
        b, n, d = 2, 21, 5
        x = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
        sizes, origin = init_merge_state(b, n)
        x1, s1, o1 = bipartite_merge(x, sizes, origin, 15)
        x2, s2, o2 = bipartite_merge(x1, s1, o1, 10)
        assert x2.shape == (b, 10, d)
        assert np.asarray(o2).max() < 10 and np.asarray(o2).min() >= 0
        np.testing.assert_allclose(np.asarray(s2).sum(axis=1), n, atol=1e-4)
        # unmerge through the composed map returns one of the 10 survivors
        rec = np.asarray(unmerge(x2, o2))
        assert rec.shape == (b, n, d)


class TestMergeTo:
    def test_multi_stage_merge(self):
        """257 -> 64 exceeds one alternating stage's cap (r <= floor(N/2));
        merge_to must chain stages (257 -> 129 -> 65 -> 64) and keep the
        origin map + size mass consistent."""
        from stllm_tpu.ops.tome import merge_to

        rng = np.random.default_rng(3)
        b, n, d, m = 2, 257, 16, 64
        x = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
        sizes, origin = init_merge_state(b, n)
        xm, sm, om = merge_to(x, sizes, origin, m)
        assert xm.shape == (b, m, d)
        assert sm.shape == (b, m)
        assert om.shape == (b, n)
        o = np.asarray(om)
        assert o.min() >= 0 and o.max() < m
        # total original-token mass is conserved across stages
        np.testing.assert_allclose(np.asarray(sm).sum(axis=1), n, rtol=1e-5)
        # CLS survives at index 0 and every merged slot is someone's origin
        assert (o[:, 0] == 0).all()
        rec = unmerge(xm, om)
        assert rec.shape == (b, n, d)

    def test_single_stage_passthrough(self):
        from stllm_tpu.ops.tome import merge_to

        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(size=(1, 9, 8)), jnp.float32)
        sizes, origin = init_merge_state(1, 9)
        xm, _, _ = merge_to(x, sizes, origin, 9)       # no-op
        np.testing.assert_array_equal(np.asarray(xm), np.asarray(x))
        xm, _, om = merge_to(x, sizes, origin, 6)      # one stage (r=3<=4)
        assert xm.shape == (1, 6, 8)
        assert np.asarray(om).max() < 6


class TestTemporalFold:
    def test_fold_frames_semantics(self):
        from stllm_tpu.ops.tome import fold_frames

        rng = np.random.default_rng(5)
        r_, n, d, g = 4, 5, 6, 2
        x = jnp.asarray(rng.normal(size=(r_, n, d)), jnp.float32)
        sizes, origin = init_merge_state(r_, n)
        xf, sf, of = fold_frames(x, sizes, origin, g)
        assert xf.shape == (2, 1 + g * (n - 1), d)
        assert sf.shape == (2, 1 + g * (n - 1))
        assert of.shape == (2, g * n)
        # shared CLS = mean of the two frame CLS (sizes are 1 each)
        np.testing.assert_allclose(
            np.asarray(xf[:, 0]), np.asarray((x[0::2, 0] + x[1::2, 0]) / 2),
            atol=1e-6)
        assert float(sf[0, 0]) == g
        # patch tokens carried over verbatim, frame-major
        np.testing.assert_allclose(np.asarray(xf[0, 1:n]),
                                   np.asarray(x[0, 1:]), atol=0)
        np.testing.assert_allclose(np.asarray(xf[0, n:]),
                                   np.asarray(x[1, 1:]), atol=0)
        # origin: frame j position p -> 0 if CLS else 1 + j*(n-1) + (p-1)
        want = np.concatenate([
            np.arange(n), np.where(np.arange(n) == 0, 0,
                                   np.arange(n) + (n - 1))])
        np.testing.assert_array_equal(np.asarray(of[0]), want)

    def test_cross_frame_duplicates_collapse_exactly(self):
        """Two identical frames folded (g=2) and merged back to one frame's
        token count: every later-frame token merges into its twin (cosine 1
        under the contiguous B=reference-frame split), values are unchanged
        by the size-weighted average, and the unfolded per-frame output must
        equal the merge-free forward."""
        from stllm_tpu.models.vit import ViTConfig, init_vit, vit_forward

        cfg = ViTConfig(image_size=28, patch_size=14, width=32, depth=4,
                        heads=4, mlp_hidden=64, dtype=jnp.float32,
                        use_flash=False, temporal_schedule=((1, 2, 5),))
        params = init_vit(jax.random.PRNGKey(0), cfg)
        one = jax.random.normal(jax.random.PRNGKey(7), (1, 28, 28, 3))
        frames = jnp.concatenate([one, one], axis=0)     # t=2, identical
        out = vit_forward(params, frames, cfg, num_frames=2)
        base = vit_forward(params, frames, dataclasses.replace(
            cfg, temporal_schedule=()))
        assert out.shape == base.shape == (2, 5, 32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                                   atol=1e-5, rtol=1e-5)

    def test_temporal_then_post_trunk_spatial(self):
        from stllm_tpu.models.vit import ViTConfig, init_vit, vit_forward

        cfg = ViTConfig(image_size=28, patch_size=14, width=32, depth=4,
                        heads=4, mlp_hidden=64, dtype=jnp.float32,
                        use_flash=False, temporal_schedule=((1, 2, 6),),
                        merge_schedule=((4, 4),))
        params = init_vit(jax.random.PRNGKey(0), cfg)
        frames = jax.random.normal(jax.random.PRNGKey(8), (4, 28, 28, 3))
        out, origin = vit_forward(params, frames, cfg, num_frames=4,
                                  return_merge_origin=True)
        assert out.shape == (4, 4, 32)       # per-frame rows, re-merged to 4
        assert origin.shape == (4, 5)
        assert np.isfinite(np.asarray(out)).all()

    def test_divisibility_guard(self):
        from stllm_tpu.models.vit import ViTConfig, init_vit, vit_forward

        cfg = ViTConfig(image_size=28, patch_size=14, width=32, depth=4,
                        heads=4, mlp_hidden=64, dtype=jnp.float32,
                        use_flash=False, temporal_schedule=((1, 2, 5),))
        params = init_vit(jax.random.PRNGKey(0), cfg)
        frames = jax.random.normal(jax.random.PRNGKey(9), (3, 28, 28, 3))
        import pytest

        with pytest.raises(AssertionError, match="num_frames"):
            vit_forward(params, frames, cfg, num_frames=3)

    def test_btadapter_temporal_duplicates_exact(self):
        """BTAdapter + temporal fold on identical frame pairs: trunk folds
        collapse the exact duplicates, branch taps unmerge back, and the
        output must match the fold-free forward."""
        from stllm_tpu.models.btadapter import (
            btadapter_forward, init_btadapter)
        from stllm_tpu.models.vit import ViTConfig

        cfg = ViTConfig(image_size=28, patch_size=14, width=32, depth=4,
                        heads=4, mlp_hidden=64, dtype=jnp.float32,
                        use_flash=False, temporal_schedule=((1, 2, 5),))
        params = init_btadapter(jax.random.PRNGKey(0), cfg, depth=2)
        one = jax.random.normal(jax.random.PRNGKey(11), (1, 28, 28, 3))
        frames = jnp.concatenate([one, one], axis=0)     # t=2, identical
        out = btadapter_forward(params, frames, cfg, num_frames=2)
        base = btadapter_forward(
            params, frames, dataclasses.replace(cfg, temporal_schedule=()),
            num_frames=2)
        assert out.shape == base.shape == (2, 5, 32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                                   atol=1e-4, rtol=1e-4)

    def test_encode_img_with_temporal_merging(self):
        from stllm_tpu.models.llama import LlamaConfig
        from stllm_tpu.models.qformer import QFormerConfig
        from stllm_tpu.models.stllm import (
            STLLMConfig, encode_img, init_stllm)
        from stllm_tpu.models.vit import ViTConfig

        cfg = STLLMConfig(
            vit=ViTConfig(image_size=28, patch_size=14, width=32, depth=4,
                          heads=4, mlp_hidden=64, dtype=jnp.float32,
                          use_flash=False, temporal_schedule=((1, 2, 5),)),
            qformer=QFormerConfig(hidden=16, num_layers=2, heads=2,
                                  intermediate=32, encoder_width=32,
                                  num_query=4, vocab_size=64,
                                  dtype=jnp.float32),
            llama=LlamaConfig(vocab_size=64, hidden=24, num_layers=1,
                              heads=2, intermediate=48, max_positions=64,
                              dtype=jnp.float32),
        )
        params = init_stllm(jax.random.PRNGKey(0), cfg,
                            init_llama_params=False)
        params.pop("llama")
        frames = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 28, 28, 3))
        out = encode_img(params, frames, cfg)
        assert out.shape == (1, 4, 4, 24)   # per-frame query tokens intact
        assert np.isfinite(np.asarray(out)).all()


class TestViTMergeSchedule:
    def _cfg(self, **kw):
        from stllm_tpu.models.vit import ViTConfig

        return ViTConfig(image_size=28, patch_size=14, width=32, depth=4,
                         heads=4, mlp_hidden=64, dtype=jnp.float32,
                         use_flash=False, **kw)

    def test_forward_shapes_and_origin(self):
        from stllm_tpu.models.vit import init_vit, vit_forward

        cfg = self._cfg(merge_schedule=((2, 4),))
        params = init_vit(jax.random.PRNGKey(0), cfg)
        imgs = jax.random.normal(jax.random.PRNGKey(1), (3, 28, 28, 3))
        out, origin = vit_forward(params, imgs, cfg, return_merge_origin=True)
        assert out.shape == (3, 4, 32)
        assert origin.shape == (3, 5)   # 4 patches + CLS originally
        assert np.isfinite(np.asarray(out)).all()
        # blocks 0-1 match the unmerged forward exactly (merge is at 2)
        base = vit_forward(params, imgs, dataclasses.replace(
            cfg, merge_schedule=()))
        assert base.shape == (3, 5, 32)

    def test_btadapter_trunk_merges_branch_full_res(self):
        """BTAdapter + merge_schedule: the trunk runs merged, branch taps
        unmerge through the origin map (position-aligned full-res), and the
        output stays full-resolution."""
        from stllm_tpu.models.btadapter import (
            btadapter_forward, init_btadapter)

        b, t = 2, 4
        cfg = self._cfg(merge_schedule=((1, 4),))
        params = init_btadapter(jax.random.PRNGKey(0), cfg, depth=2)
        frames = jax.random.normal(jax.random.PRNGKey(3), (b * t, 28, 28, 3))
        out = btadapter_forward(params, frames, cfg, num_frames=t)
        assert out.shape == (b * t, 5, 32)      # full-res despite the merge
        assert np.isfinite(np.asarray(out)).all()
        base = btadapter_forward(
            params, frames, dataclasses.replace(cfg, merge_schedule=()),
            num_frames=t)
        assert float(jnp.abs(out - base).max()) > 0  # merging is lossy

    def test_btadapter_r0_merge_is_identity(self):
        """A merge stage that removes zero tokens only permutes the trunk
        sequence (A/B interleave); blocks are permutation-equivariant and the
        branch taps + final output unmerge back, so the result must match the
        merge-free forward to fp tolerance."""
        from stllm_tpu.models.btadapter import (
            btadapter_forward, init_btadapter)

        b, t = 1, 2
        cfg = self._cfg(merge_schedule=((1, 5),))  # 5 -> 5: r = 0
        params = init_btadapter(jax.random.PRNGKey(0), cfg, depth=2)
        frames = jax.random.normal(jax.random.PRNGKey(4), (b * t, 28, 28, 3))
        out = btadapter_forward(params, frames, cfg, num_frames=t)
        base = btadapter_forward(
            params, frames, dataclasses.replace(cfg, merge_schedule=()),
            num_frames=t)
        np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                                   atol=1e-4, rtol=1e-4)

    def test_btadapter_rejects_post_trunk_merge(self):
        from stllm_tpu.models.btadapter import (
            btadapter_forward, init_btadapter)

        cfg = self._cfg(merge_schedule=((4, 4),))  # key == depth
        params = init_btadapter(jax.random.PRNGKey(0), cfg, depth=2)
        frames = jax.random.normal(jax.random.PRNGKey(5), (2, 28, 28, 3))
        import pytest

        with pytest.raises(AssertionError, match="post-trunk"):
            btadapter_forward(params, frames, cfg, num_frames=2)

    def test_encode_img_with_merging(self):
        from stllm_tpu.models.llama import LlamaConfig
        from stllm_tpu.models.qformer import QFormerConfig
        from stllm_tpu.models.stllm import (
            STLLMConfig, encode_img, init_stllm)

        cfg = STLLMConfig(
            vit=self._cfg(merge_schedule=((2, 4),)),
            qformer=QFormerConfig(hidden=16, num_layers=2, heads=2,
                                  intermediate=32, encoder_width=32,
                                  num_query=4, vocab_size=64,
                                  dtype=jnp.float32),
            llama=LlamaConfig(vocab_size=64, hidden=24, num_layers=1,
                              heads=2, intermediate=48, max_positions=64,
                              dtype=jnp.float32),
        )
        params = init_stllm(jax.random.PRNGKey(0), cfg,
                            init_llama_params=False)
        params.pop("llama")
        frames = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 28, 28, 3))
        out = encode_img(params, frames, cfg)
        assert out.shape == (1, 2, 4, 24)   # (B, T, num_query, llama hidden)
        assert np.isfinite(np.asarray(out)).all()


class TestAutoMergeLevel:
    """Redundancy-adaptive level selection (ops/tome.py select_merge_level
    + stllm.resolve_auto_merge): temporal levels only for temporally
    redundant input, nothing at all for iid noise, divisibility demotion,
    and the config plumbing for merge_level names / "auto"."""

    def _videos(self):
        from stllm_tpu.data.synth import noise_video, synth_video

        rng = np.random.default_rng(0)
        smooth = synth_video(rng, 16, 224)
        noise = noise_video(rng, 16, 224)
        static = np.repeat(synth_video(rng, 1, 224), 16, axis=1)
        return smooth, noise, static

    def test_selector_maps_redundancy_to_levels(self):
        from stllm_tpu.ops.tome import select_merge_level

        smooth, noise, static = self._videos()
        assert select_merge_level(smooth).startswith("t_")
        assert select_merge_level(noise) == "off"
        assert select_merge_level(static) == "t_aggressive"
        # spatial-only restriction (single images / unfoldable callers)
        assert not select_merge_level(
            smooth, allow_temporal=False).startswith("t_")

    def test_selector_respects_fold_divisibility(self):
        from stllm_tpu.data.synth import synth_video
        from stllm_tpu.ops.tome import MERGE_LEVELS, select_merge_level

        rng = np.random.default_rng(1)
        static6 = np.repeat(synth_video(rng, 1, 224), 6, axis=1)
        lvl = select_merge_level(static6)   # wants t_aggressive (3 folds)
        folds = len(MERGE_LEVELS[lvl].get("temporal_schedule", ()))
        assert folds and 6 % (2 ** folds) == 0     # demoted to t_mild
        odd = np.repeat(synth_video(rng, 1, 224), 5, axis=1)
        assert not select_merge_level(odd).startswith("t_")

    def test_resolve_auto_merge_sets_schedules(self):
        import dataclasses

        from stllm_tpu.models.stllm import STLLMConfig, resolve_auto_merge
        from stllm_tpu.models.vit import EVA_VIT_G
        from stllm_tpu.ops.tome import MERGE_LEVELS

        cfg = STLLMConfig(vit=dataclasses.replace(
            EVA_VIT_G, merge_level="auto"))
        smooth, noise, _ = self._videos()
        r = resolve_auto_merge(cfg, smooth)
        assert r.vit.merge_level == ""
        assert r.vit.temporal_schedule   # smooth video -> a temporal level
        assert any(r.vit.temporal_schedule ==
                   v.get("temporal_schedule") for v in MERGE_LEVELS.values())
        rn = resolve_auto_merge(cfg, noise)
        assert rn.vit.merge_schedule == () and rn.vit.temporal_schedule == ()
        # non-auto config passes through untouched
        assert resolve_auto_merge(r, smooth) is r

    def test_resolve_auto_merge_debug_geometry_off(self):
        import dataclasses

        from stllm_tpu.models.stllm import STLLMConfig, resolve_auto_merge
        from stllm_tpu.models.vit import ViTConfig

        cfg = STLLMConfig(vit=ViTConfig(image_size=28, patch_size=14,
                                        width=32, depth=4, heads=4,
                                        mlp_hidden=64, dtype=jnp.float32,
                                        merge_level="auto"))
        smooth, _, _ = self._videos()
        r = resolve_auto_merge(cfg, smooth[:, :, :28, :28])
        assert r.vit.merge_level == ""
        assert r.vit.merge_schedule == () and r.vit.temporal_schedule == ()

    def test_zoo_expands_named_level(self):
        from stllm_tpu.models.zoo import build_stllm_config
        from stllm_tpu.ops.tome import level_kwargs

        cfg = build_stllm_config({"vit": {"merge_level": "t_medium"}})
        want = level_kwargs("t_medium")
        assert cfg.vit.temporal_schedule == want["temporal_schedule"]
        assert cfg.vit.merge_schedule == want["merge_schedule"]
        assert cfg.vit.merge_level == ""
        auto = build_stllm_config({"vit": {"merge_level": "auto"}})
        assert auto.vit.merge_level == "auto"
        assert auto.vit.merge_schedule == ()
