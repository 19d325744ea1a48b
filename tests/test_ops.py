import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stllm_tpu.ops.attention import flash_attention, mha_reference
from stllm_tpu.ops.layers import (
    gelu,
    init_layer_norm,
    init_linear,
    init_rms_norm,
    layer_norm,
    linear,
    mlp,
    rms_norm,
    swiglu_mlp,
)
from stllm_tpu.ops.rope import apply_rope, rope_table


def _qkv(rng, b, s, h, d, sk=None, dtype=jnp.float32):
    ks = jax.random.split(rng, 3)
    sk = sk or s
    q = jax.random.normal(ks[0], (b, s, h, d), dtype)
    k = jax.random.normal(ks[1], (b, sk, h, d), dtype)
    v = jax.random.normal(ks[2], (b, sk, h, d), dtype)
    return q, k, v


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("shape", [(2, 64, 4, 32), (1, 100, 2, 88)])
def test_flash_matches_reference(causal, shape):
    b, s, h, d = shape
    q, k, v = _qkv(jax.random.PRNGKey(0), b, s, h, d)
    ref = mha_reference(q, k, v, causal=causal)
    out = flash_attention(q, k, v, causal=causal, use_pallas=True, interpret=True,
                          block_q=32, block_k=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_kv_mask():
    b, s, h, d = 2, 48, 2, 16
    q, k, v = _qkv(jax.random.PRNGKey(1), b, s, h, d)
    kv_mask = jnp.arange(s)[None, :] < jnp.array([[30], [48]])
    ref = mha_reference(q, k, v, kv_mask=kv_mask)
    out = flash_attention(q, k, v, kv_mask=kv_mask, use_pallas=True, interpret=True,
                          block_q=16, block_k=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_cross_attention_shapes():
    # queries and keys of different lengths (Q-Former style)
    q, k, v = _qkv(jax.random.PRNGKey(2), 2, 32, 4, 24, sk=257)
    ref = mha_reference(q, k, v)
    out = flash_attention(q, k, v, use_pallas=True, interpret=True,
                          block_q=32, block_k=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_gradients_match_reference():
    b, s, h, d = 1, 32, 2, 16
    q, k, v = _qkv(jax.random.PRNGKey(3), b, s, h, d)

    def loss_flash(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, causal=True, use_pallas=True, interpret=True,
                            block_q=16, block_k=16) ** 2
        )

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, causal=True) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4, rtol=1e-4)


def test_flash_bf16_io():
    q, k, v = _qkv(jax.random.PRNGKey(4), 2, 64, 2, 32, dtype=jnp.bfloat16)
    out = flash_attention(q, k, v, use_pallas=True, interpret=True,
                          block_q=32, block_k=32)
    assert out.dtype == jnp.bfloat16
    ref = mha_reference(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2, rtol=3e-2
    )


class TestFusedShortAttention:
    """The single-pass short-sequence kernel (scores stay in VMEM)."""

    @pytest.mark.parametrize("causal", [False, True])
    @pytest.mark.parametrize("shape", [(2, 257, 16, 88), (1, 96, 4, 32)])
    def test_matches_reference(self, causal, shape):
        from stllm_tpu.ops.attention import _fused_short_attention

        b, s, h, d = shape
        q, k, v = _qkv(jax.random.PRNGKey(10), b, s, h, d)
        ref = mha_reference(q, k, v, causal=causal)
        out = _fused_short_attention(
            q, k, v, None, None, causal, d ** -0.5, True
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
        )

    def test_kv_mask_and_cross_shapes(self):
        from stllm_tpu.ops.attention import _fused_short_attention

        # Q-Former-style: short queries against longer keys, ragged kv mask
        q, k, v = _qkv(jax.random.PRNGKey(11), 2, 33, 3, 88, sk=257)
        kv_mask = jnp.arange(257)[None, :] < jnp.array([[100], [257]])
        ref = mha_reference(q, k, v, kv_mask=kv_mask)
        out = _fused_short_attention(
            q, k, v, None, kv_mask, False, 88 ** -0.5, True
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
        )

    def test_gradients_match_reference(self):
        from stllm_tpu.ops.attention import _fused_short_attention

        q, k, v = _qkv(jax.random.PRNGKey(12), 1, 40, 2, 16)

        def loss_fused(q, k, v):
            return jnp.sum(
                _fused_short_attention(
                    q, k, v, None, None, True, 16 ** -0.5, True
                ) ** 2
            )

        def loss_ref(q, k, v):
            return jnp.sum(mha_reference(q, k, v, causal=True) ** 2)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gf, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=1e-4, rtol=1e-4
            )

    def test_head_chunk_picker(self):
        from stllm_tpu.ops.attention import _pick_head_chunk

        # ViT-g shapes: all 16 heads fit one block (1408 lanes, 11*128)
        assert _pick_head_chunk(16, 88, 257, 257, 2) == 16
        # LLaMA-7B prefill: 32*128 lanes too big for VMEM, chunks align to 128
        hc = _pick_head_chunk(32, 128, 608, 608, 2)
        assert hc > 0 and (hc * 128) % 128 == 0 and 32 % hc == 0
        # pathological: odd head_dim with heads that cannot chunk-align and
        # whole-block too large -> 0 (dispatch falls back to XLA)
        assert _pick_head_chunk(32, 88, 2048, 2048, 2) == 0


class TestQuantMatmul:
    """Fused W8A8 dynamic-quant matmul (ops/quant.py)."""

    def test_pallas_kernel_matches_reference(self):
        from stllm_tpu.ops.quant import (
            quant_matmul_pallas, quant_matmul_pallas_reference,
            quantize_weights)

        rng = jax.random.PRNGKey(20)
        k1, k2 = jax.random.split(rng)
        x = jax.random.normal(k1, (2, 64, 256), jnp.float32)
        w = jax.random.normal(k2, (256, 384), jnp.float32)
        w_q, ws = quantize_weights(w)
        ref = quant_matmul_pallas_reference(x, w_q, ws)
        out = quant_matmul_pallas(x, w_q, ws, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)

    def test_int4_pack_roundtrip_and_matmul(self):
        """W4A16 (round 3): nibble packing round-trips exactly, and the
        split-halves matmul equals explicit dequant @ x for both scale
        granularities."""
        from stllm_tpu.ops.quant import (
            _unpack_int4, quantize_weights_int4, w4_matmul)

        rng = jax.random.PRNGKey(30)
        k1, k2 = jax.random.split(rng)
        k, n = 512, 384
        w = jax.random.normal(k1, (k, n), jnp.float32) * 0.05
        x = jax.random.normal(k2, (2, 8, k), jnp.float32)

        for group in (None, 128):
            packed, scale = quantize_weights_int4(w, group)
            assert packed.shape == (k // 2, n) and packed.dtype == jnp.int8
            top, bottom = _unpack_int4(packed)
            codes = np.concatenate([np.asarray(top), np.asarray(bottom)], 0)
            assert codes.min() >= -7 and codes.max() <= 7
            # explicit dequant oracle
            if group is None:
                wd = codes.astype(np.float32) * np.asarray(scale)
            else:
                wd = (codes.reshape(k // group, group, n).astype(np.float32)
                      * np.asarray(scale)[:, None]).reshape(k, n)
            got = np.asarray(w4_matmul(x, packed, scale), np.float32)
            want = np.asarray(x, np.float32) @ wd
            np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)
            # quantization error vs dense stays int4-sized
            rel = np.abs(wd - np.asarray(w)).mean() / np.abs(np.asarray(w)).mean()
            # gaussian weights: mean |err| ~ amax/28 ~ 0.14|w| per-channel;
            # group=128 tightens amax to ~3.1 sigma -> ~0.11
            assert rel < (0.17 if group is None else 0.13), (group, rel)
            if group == 128:
                assert rel < rel_pc  # groupwise strictly tighter
            else:
                rel_pc = rel

    def test_w4_pallas_matches_xla(self):
        """The Pallas W4A16 kernel (interpret mode on CPU) == the XLA
        composition, including M-padding for small decode batches."""
        from stllm_tpu.ops.quant import (
            quantize_weights_int4, w4_matmul, w4_matmul_pallas)

        rng = jax.random.PRNGKey(33)
        k1, k2 = jax.random.split(rng)
        kdim, n = 512, 384
        w = jax.random.normal(k1, (kdim, n), jnp.float32) * 0.05
        packed, scale = quantize_weights_int4(w, group=None)
        for m_shape in ((1, kdim), (2, 3, kdim), (16, kdim)):
            x = jax.random.normal(k2, m_shape, jnp.float32)
            got = w4_matmul_pallas(x, packed, scale)
            assert got is not None
            want = w4_matmul(x, packed, scale)
            np.testing.assert_allclose(np.asarray(got, np.float32),
                                       np.asarray(want, np.float32),
                                       atol=2e-2, rtol=2e-2)
        # m > 512 takes the m-tiled grid (batched prefill regime; the
        # constant-x single-tile form OOMs scoped vmem at mp=4096)
        x_big = jax.random.normal(k2, (600, kdim), jnp.float32)
        got = w4_matmul_pallas(x_big, packed, scale)
        want = w4_matmul(x_big, packed, scale)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   atol=2e-2, rtol=2e-2)
        # groupwise scales: kernel declines, caller falls back
        packed_g, scale_g = quantize_weights_int4(w, group=128)
        assert w4_matmul_pallas(x, packed_g, scale_g) is None

    def test_w4_pallas_k_padding(self):
        """K dims with no aligned tiling (e.g. the 7B down matmul's
        k2=5504) are zero-padded to a 512-multiple inside the kernel
        wrapper instead of falling back to XLA (round 3: the XLA fallback
        hoists a full bf16 dequant out of the decode scan — bf16-sized
        weight reads; measured 11.99 -> 11.58 ms/token at 7B)."""
        from stllm_tpu.ops.quant import (
            _w4_tiles, quantize_weights_int4, w4_matmul, w4_matmul_pallas)

        for kdim, n in ((320, 384), (1376, 256)):
            assert _w4_tiles(kdim // 2, n) is None  # needs the pad path
            w = jax.random.normal(jax.random.PRNGKey(40), (kdim, n),
                                  jnp.float32) * 0.05
            x = jax.random.normal(jax.random.PRNGKey(41), (3, kdim),
                                  jnp.float32)
            packed, scale = quantize_weights_int4(w, group=None)
            got = w4_matmul_pallas(x, packed, scale)
            assert got is not None, (kdim, n)
            want = w4_matmul(x, packed, scale)
            np.testing.assert_allclose(np.asarray(got, np.float32),
                                       np.asarray(want, np.float32),
                                       atol=2e-2, rtol=2e-2)

    def test_int4_prepadded_storage(self):
        """Round 3b: per-channel packed weights are K-pre-padded at
        CONVERSION time (profiling showed XLA does not hoist a runtime pad
        of the packed weights out of the decode scan — ~0.6 ms/token at
        7B). Both consumers accept padded storage, and legacy unpadded
        arrays still work via the runtime pad."""
        from stllm_tpu.ops.quant import (
            _w4_padded_k2, _w4_tiles, quantize_linear_params_int4,
            quantize_weights_int4, w4_linear, w4_matmul, w4_matmul_pallas)

        kdim, n = 320, 384                      # k2=160 has no tiling
        assert _w4_tiles(kdim // 2, n) is None
        w = jax.random.normal(jax.random.PRNGKey(50), (kdim, n),
                              jnp.float32) * 0.05
        x = jax.random.normal(jax.random.PRNGKey(51), (3, kdim), jnp.float32)

        p = quantize_linear_params_int4({"w": w}, group=None)
        k2p = _w4_padded_k2(kdim // 2, n)
        assert p["w4"].shape == (k2p, n) and k2p > kdim // 2

        packed_raw, scale = quantize_weights_int4(w, group=None)
        want = np.asarray(w4_matmul(x, packed_raw, scale), np.float32)
        got_lin = np.asarray(w4_linear(p, x), np.float32)       # XLA on CPU
        np.testing.assert_allclose(got_lin, want, atol=2e-2, rtol=2e-2)
        got_pl = w4_matmul_pallas(x, p["w4"], p["w4_scale"])    # interpret
        np.testing.assert_allclose(np.asarray(got_pl, np.float32), want,
                                   atol=2e-2, rtol=2e-2)
        # legacy unpadded storage still pads at runtime inside the kernel
        got_legacy = w4_matmul_pallas(x, packed_raw, scale)
        np.testing.assert_allclose(np.asarray(got_legacy, np.float32), want,
                                   atol=2e-2, rtol=2e-2)
        # per-group conversion is never padded (scales can't fold)
        pg = quantize_linear_params_int4({"w": w}, group=32)
        assert pg["w4"].shape == (kdim // 2, n)

    def test_greedy_single_call_matches_chunked(self):
        """Round 3b: with eos disabled and no stop sequences the greedy
        loop runs one device call for the whole budget; token-for-token
        identical to the chunked loop."""
        from stllm_tpu.models.generation import (
            GenerationConfig, _generate_greedy_ondevice, generate)
        from stllm_tpu.models.llama import LlamaConfig, init_llama

        cfg = LlamaConfig(vocab_size=64, hidden=32, num_layers=2, heads=2,
                          intermediate=64, max_positions=128,
                          dtype=jnp.float32)
        params = init_llama(jax.random.PRNGKey(60), cfg)
        emb = jax.random.normal(jax.random.PRNGKey(61), (2, 5, 32)) * 0.1
        gen_free = GenerationConfig(max_new_tokens=40, eos_token_id=-1,
                                    stop_sequences=(), pad_to_multiple=8)
        single = generate(params, emb, llama_cfg=cfg, gen=gen_free)
        # force the old chunked path by keeping a (harmless) stop check
        gen_stop = GenerationConfig(max_new_tokens=40, eos_token_id=63,
                                    stop_sequences=(), pad_to_multiple=8)
        chunked = generate(params, emb, llama_cfg=cfg, gen=gen_stop)
        for s, c in zip(single, chunked):
            assert 63 not in c, "pick weights where eos never fires"
            assert s == c

    def test_int4_fused_matches_unfused(self):
        """fuse=True (qkv/gateup packed along N) is numerically identical
        to the unfused conversion under per-channel scales, and generate
        runs through the fused structure. LoRA-carrying layers stay
        unfused."""
        from stllm_tpu.models.generation import GenerationConfig, generate
        from stllm_tpu.models.llama import (
            LlamaConfig, init_llama, lm_head, prefill_with_cache,
            quantize_llama_params_int4)

        cfg = LlamaConfig(vocab_size=128, hidden=64, num_layers=2, heads=4,
                          intermediate=172, max_positions=64,
                          dtype=jnp.float32)
        params = init_llama(jax.random.PRNGKey(70), cfg)
        p_unf = quantize_llama_params_int4(params, group=None)
        p_fus = quantize_llama_params_int4(params, group=None, fuse=True,
                                           quant_head=True)
        assert "qkv" in p_fus["layers"][0] and "q" not in p_fus["layers"][0]
        assert "gateup" in p_fus["layers"][0]
        assert "w_q16" in p_fus["lm_head"]
        emb = jax.random.normal(jax.random.PRNGKey(71), (1, 8, 64)) * 0.1
        mask = jnp.ones((1, 8), jnp.int32)
        h_u, _ = prefill_with_cache(p_unf, emb, mask, 16, cfg)
        h_f, _ = prefill_with_cache(p_fus, emb, mask, 16, cfg)
        np.testing.assert_allclose(np.asarray(h_f, np.float32),
                                   np.asarray(h_u, np.float32),
                                   atol=1e-5, rtol=1e-5)
        # int8 head logits track the dense-head logits closely
        lu = np.asarray(lm_head(p_unf, h_u), np.float32)
        lf = np.asarray(lm_head(p_fus, h_f), np.float32)
        assert np.abs(lf - lu).mean() / (np.abs(lu).mean() + 1e-9) < 0.05
        out = generate(p_fus, emb, llama_cfg=cfg,
                       gen=GenerationConfig(max_new_tokens=6,
                                            stop_sequences=(),
                                            pad_to_multiple=8))
        assert len(out[0]) == 6
        # a LoRA-carrying layer is left unfused
        from stllm_tpu.models.lora import add_lora
        p_l = add_lora({"llama": init_llama(jax.random.PRNGKey(72), cfg)},
                       jax.random.PRNGKey(73), 2)["llama"]
        p_lf = quantize_llama_params_int4(p_l, group=None, fuse=True)
        assert "qkv" not in p_lf["layers"][0] and "q" in p_lf["layers"][0]

    def test_int4_llama_generates(self):
        """quantize_llama_params_int4 runs the full generate loop and stays
        near dense prefill logits."""
        from stllm_tpu.models.generation import GenerationConfig, generate
        from stllm_tpu.models.llama import (
            LlamaConfig, init_llama, lm_head, prefill_with_cache,
            quantize_llama_params_int4)

        cfg = LlamaConfig(vocab_size=128, hidden=64, num_layers=2, heads=4,
                          intermediate=128, max_positions=64,
                          dtype=jnp.float32)
        params = init_llama(jax.random.PRNGKey(31), cfg)
        p4 = quantize_llama_params_int4(params, group=32)
        assert "w4" in p4["layers"][0]["q"]
        emb = jax.random.normal(jax.random.PRNGKey(32), (1, 8, 64)) * 0.1
        mask = jnp.ones((1, 8), jnp.int32)
        dense, _ = prefill_with_cache(params, emb, mask, 16, cfg)
        quant, _ = prefill_with_cache(p4, emb, mask, 16, cfg)
        ld = np.asarray(lm_head(params, dense), np.float32)
        lq = np.asarray(lm_head(p4, quant), np.float32)
        rel = np.abs(lq - ld).mean() / (np.abs(ld).mean() + 1e-9)
        assert rel < 0.15, rel
        out = generate(p4, emb, llama_cfg=cfg,
                       gen=GenerationConfig(max_new_tokens=5,
                                            stop_sequences=(),
                                            pad_to_multiple=8))
        assert len(out[0]) == 5

    def test_w8a16_differentiable(self):
        """The weight-only int8 form (QLoRA-style frozen base) passes
        gradients w.r.t. activations — the W8A8 path's round() has zero
        gradient, so training THROUGH a quantized LLM needs this form."""
        from stllm_tpu.ops.layers import linear
        from stllm_tpu.ops.quant import quantize_linear_params

        rng = jax.random.PRNGKey(40)
        k1, k2 = jax.random.split(rng)
        w = jax.random.normal(k1, (64, 32), jnp.float32) * 0.1
        x = jax.random.normal(k2, (4, 64), jnp.float32)
        pq = quantize_linear_params({"w": w})
        pq16 = dict(pq)
        pq16["w_q16"] = pq16.pop("w_q")

        out16 = linear(pq16, x)
        np.testing.assert_allclose(  # same weights, no activation quant
            np.asarray(out16), np.asarray(x @ w), atol=2e-2, rtol=2e-2)

        g8 = jax.grad(lambda x: linear(pq, x).sum())(x)
        g16 = jax.grad(lambda x: linear(pq16, x).sum())(x)
        # W8A8: round() has zero grad; only the per-row amax element leaks a
        # (wrong) subgradient through the scale — degenerate for training
        nonzero = float((jnp.abs(g8) > 0).mean())
        assert nonzero <= 1.5 / x.shape[-1], nonzero
        gd = jax.grad(lambda x: (x @ w).sum())(x)
        np.testing.assert_allclose(np.asarray(g16), np.asarray(gd),
                                   atol=2e-2, rtol=2e-2)

    def test_quant_error_vs_dense(self):
        from stllm_tpu.ops.quant import quant_matmul, quantize_weights

        rng = jax.random.PRNGKey(21)
        k1, k2 = jax.random.split(rng)
        x = jax.random.normal(k1, (1, 128, 512), jnp.float32)
        w = jax.random.normal(k2, (512, 256), jnp.float32)
        w_q, ws = quantize_weights(w)
        q = np.asarray(quant_matmul(x, w_q, ws), np.float32)
        d = np.asarray(x @ w, np.float32)
        rel = np.abs(q - d).mean() / np.abs(d).mean()
        assert rel < 0.02, rel  # per-row dynamic int8 stays ~1%

    def test_xla_and_pallas_paths_agree(self):
        from stllm_tpu.ops.quant import (
            quant_matmul, quant_matmul_pallas, quantize_weights)

        rng = jax.random.PRNGKey(25)
        k1, k2 = jax.random.split(rng)
        # K below the pallas k-block so both paths quantize per full row
        x = jax.random.normal(k1, (2, 16, 384), jnp.float32)
        w = jax.random.normal(k2, (384, 256), jnp.float32)
        w_q, ws = quantize_weights(w)
        a = np.asarray(quant_matmul(x, w_q, ws), np.float32)
        b = np.asarray(quant_matmul_pallas(x, w_q, ws, interpret=True),
                       np.float32)
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)

    def test_quant_linear_bias_and_nd(self):
        from stllm_tpu.ops.quant import quant_linear, quantize_linear_params

        rng = jax.random.PRNGKey(22)
        k1, k2, k3 = jax.random.split(rng, 3)
        p = {"w": jax.random.normal(k1, (256, 128), jnp.float32),
             "b": jax.random.normal(k2, (128,), jnp.float32)}
        pq = quantize_linear_params(p)
        x = jax.random.normal(k3, (2, 4, 8, 256), jnp.float32)
        out = quant_linear(pq, x)
        assert out.shape == (2, 4, 8, 128)
        dense = x @ p["w"] + p["b"]
        rel = float(jnp.abs(out - dense).mean() / jnp.abs(dense).mean())
        assert rel < 0.02, rel

    def test_producer_fused_quant_kernels(self):
        """layer_norm_quant / gelu_quant (Pallas) == unfused LN/GELU +
        quantize_activations, bit-for-bit on the int8 values."""
        from stllm_tpu.ops.layers import layer_norm
        from stllm_tpu.ops.quant import (
            gelu_quant, layer_norm_quant, quantize_activations)

        rng = jax.random.PRNGKey(26)
        k1, k2, k3 = jax.random.split(rng, 3)
        x = jax.random.normal(k1, (2, 64, 256), jnp.float32)
        p = {"scale": jax.random.normal(k2, (256,), jnp.float32),
             "bias": jax.random.normal(k3, (256,), jnp.float32)}
        q1, s1 = layer_norm_quant(p, x, 1e-6, interpret=True)
        q2, s2 = quantize_activations(layer_norm(p, x, 1e-6))
        assert int(np.asarray(q1 != q2).sum()) == 0
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-7)
        g1, gs1 = gelu_quant(x, approx=True, interpret=True)
        g2, gs2 = quantize_activations(jax.nn.gelu(x, approximate=True))
        assert int(np.asarray(g1 != g2).sum()) == 0
        np.testing.assert_allclose(np.asarray(gs1), np.asarray(gs2), atol=1e-7)

    def test_quantized_vit_forward_drift(self):
        from stllm_tpu.models.vit import (
            ViTConfig, init_vit, quantize_vit_params, vit_forward)

        cfg = ViTConfig(image_size=56, patch_size=14, width=256, depth=2,
                        heads=4, mlp_hidden=512, dtype=jnp.float32)
        params = init_vit(jax.random.PRNGKey(23), cfg)
        imgs = jax.random.normal(jax.random.PRNGKey(24), (2, 56, 56, 3))
        dense = vit_forward(params, imgs, cfg)
        qout = vit_forward(quantize_vit_params(params), imgs, cfg)
        rel = float(jnp.abs(qout - dense).mean() / jnp.abs(dense).mean())
        assert rel < 0.02, rel

    def test_static_scale_primitives(self):
        """quantize_static saturates; layer_norm_quant_static and
        quant_mlp_static match their unfused counterparts exactly when the
        static scale equals the dynamic per-tensor amax."""
        from stllm_tpu.ops.layers import layer_norm
        from stllm_tpu.ops.quant import (
            layer_norm_quant_static, quant_matmul_pre, quant_mlp_static,
            quantize_linear_params, quantize_static)

        rng = jax.random.PRNGKey(30)
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        x = jax.random.normal(k1, (2, 32, 128), jnp.float32)

        # saturation: values beyond ±127*scale clip instead of wrapping
        q = quantize_static(jnp.float32([[-500.0, 0.5, 500.0]]), 1.0)
        assert q.dtype == jnp.int8 and q.tolist() == [[-127, 0, 127]]

        p = {"scale": jax.random.normal(k2, (128,)),
             "bias": jax.random.normal(k3, (128,))}
        ln = layer_norm(p, x, 1e-6)
        s = float(jnp.max(jnp.abs(ln)) / 127.0)
        got = layer_norm_quant_static(p, x, s, 1e-6)
        want = quantize_static(layer_norm(p, x.astype(jnp.float32), 1e-6), s)
        assert int(np.asarray(got != want).sum()) == 0

        fc1 = quantize_linear_params(
            {"w": jax.random.normal(k4, (128, 256)) / 11.3,
             "b": jnp.zeros((256,), jnp.float32)})
        fc2 = quantize_linear_params(
            {"w": jax.random.normal(k1, (256, 128)) / 16.0})
        h = quant_matmul_pre(got, s, fc1, jnp.float32)
        g = jax.nn.gelu(h, approximate=True)
        s2 = float(jnp.max(jnp.abs(g)) / 127.0)
        fused = quant_mlp_static(got, s, fc1, s2, fc2, jnp.float32, approx=True)
        unfused = quant_matmul_pre(quantize_static(g, s2), s2, fc2, jnp.float32)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(unfused),
                                   atol=1e-3, rtol=1e-3)

    def test_res_ln_static_kernel_matches_reference(self):
        """Epilogue-carried LN kernel (s8 dot + residual + LN + static int8,
        round 3) == XLA reference math, for per-row and scalar input
        scales."""
        from stllm_tpu.ops.quant import (
            quant_matmul_res_ln_static, quant_matmul_res_ln_static_reference)

        rng = np.random.RandomState(50)
        b, s, k, n = 2, 17, 384, 256
        hq = jnp.asarray(rng.randint(-127, 128, (b, s, k)), jnp.int8)
        wq = jnp.asarray(rng.randint(-127, 128, (k, n)), jnp.int8)
        params = {"w_q": wq,
                  "w_scale": jnp.asarray(rng.rand(n) * 0.002, jnp.float32),
                  "b": jnp.asarray(rng.randn(n) * 0.02, jnp.float32)}
        x = jnp.asarray(rng.randn(b, s, n), jnp.bfloat16)
        ln = {"scale": jnp.asarray(rng.randn(n), jnp.float32),
              "bias": jnp.asarray(rng.randn(n) * 0.1, jnp.float32)}
        for hs in (jnp.asarray(rng.rand(b, s, 1) * 0.01 + 1e-3, jnp.float32),
                   jnp.float32(0.004)):
            got = quant_matmul_res_ln_static(hq, hs, params, x, ln, 0.05)
            assert got is not None
            want = quant_matmul_res_ln_static_reference(
                hq, hs, params, x, ln, 0.05)
            np.testing.assert_allclose(
                np.asarray(got[0], np.float32), np.asarray(want[0], np.float32),
                atol=2e-2, rtol=2e-2)
            # int8 codes: at most 1 step apart (rounding boundary)
            assert int(np.abs(np.asarray(got[1], np.int32)
                              - np.asarray(want[1], np.int32)).max()) <= 1

    def test_fused_ln_vit_matches_unfused_static(self):
        """The fused-LN static block pipeline == the per-block static path
        within quantization rounding."""
        from stllm_tpu.models import vit as vit_mod
        from stllm_tpu.models.vit import (
            ViTConfig, calibrate_vit_scales, init_vit, quantize_vit_params,
            vit_forward)

        cfg = ViTConfig(image_size=56, patch_size=14, width=256, depth=3,
                        heads=4, mlp_hidden=512, dtype=jnp.float32)
        params = init_vit(jax.random.PRNGKey(51), cfg)
        imgs = jax.random.normal(jax.random.PRNGKey(52), (2, 56, 56, 3))
        ps = calibrate_vit_scales(quantize_vit_params(params), imgs, cfg)
        old = vit_mod.FUSED_LN
        try:
            vit_mod.FUSED_LN = "both"
            fused = vit_forward(ps, imgs, cfg)
            vit_mod.FUSED_LN = False
            unfused = vit_forward(ps, imgs, cfg)
        finally:
            vit_mod.FUSED_LN = old
        rel = float(jnp.abs(fused - unfused).mean()
                    / (jnp.abs(unfused).mean() + 1e-9))
        assert rel < 0.01, rel

    def test_calibrated_static_vit_drift(self):
        """calibrate_vit_scales attaches act_scales and the static forward
        stays close to both the dynamic-int8 and dense outputs — including
        on data it was NOT calibrated on (saturation, not wraparound)."""
        from stllm_tpu.models.vit import (
            ViTConfig, calibrate_vit_scales, init_vit, quantize_vit_params,
            vit_forward)

        cfg = ViTConfig(image_size=56, patch_size=14, width=256, depth=2,
                        heads=4, mlp_hidden=512, dtype=jnp.float32)
        params = init_vit(jax.random.PRNGKey(27), cfg)
        imgs = jax.random.normal(jax.random.PRNGKey(28), (2, 56, 56, 3))
        dense = vit_forward(params, imgs, cfg)
        pq = quantize_vit_params(params)
        ps = calibrate_vit_scales(pq, imgs, cfg)
        assert all("act_scales" in b for b in ps["blocks"])
        stat = vit_forward(ps, imgs, cfg)
        rel = float(jnp.abs(stat - dense).mean() / jnp.abs(dense).mean())
        assert rel < 0.02, rel
        fresh = 1.5 * jax.random.normal(jax.random.PRNGKey(29), (2, 56, 56, 3))
        rel2 = float(jnp.abs(vit_forward(ps, fresh, cfg)
                             - vit_forward(params, fresh, cfg)).mean()
                     / jnp.abs(vit_forward(params, fresh, cfg)).mean())
        assert rel2 < 0.03, rel2


def test_layer_norm_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.RandomState(0).randn(4, 16).astype(np.float32)
    p = init_layer_norm(16)
    p["scale"] = jnp.asarray(np.random.RandomState(1).randn(16).astype(np.float32))
    p["bias"] = jnp.asarray(np.random.RandomState(2).randn(16).astype(np.float32))
    got = layer_norm(p, jnp.asarray(x), eps=1e-6)
    ln = torch.nn.LayerNorm(16, eps=1e-6)
    with torch.no_grad():
        ln.weight.copy_(torch.from_numpy(np.asarray(p["scale"])))
        ln.bias.copy_(torch.from_numpy(np.asarray(p["bias"])))
        want = ln(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_rms_norm_matches_torch_llama():
    torch = pytest.importorskip("torch")
    x = np.random.RandomState(0).randn(2, 8, 32).astype(np.float32)
    scale = np.random.RandomState(1).rand(32).astype(np.float32)
    got = rms_norm({"scale": jnp.asarray(scale)}, jnp.asarray(x), eps=1e-6)
    # HF LlamaRMSNorm semantics
    xt = torch.from_numpy(x)
    var = xt.pow(2).mean(-1, keepdim=True)
    want = (xt * torch.rsqrt(var + 1e-6)) * torch.from_numpy(scale)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)


def test_gelu_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.linspace(-4, 4, 101, dtype=np.float32)
    got = gelu(jnp.asarray(x))
    want = torch.nn.functional.gelu(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_linear_and_mlps():
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 4)
    x = jax.random.normal(ks[0], (2, 8))
    p = init_linear(ks[1], 8, 16)
    y = linear(p, x)
    assert y.shape == (2, 16)
    mp = {"fc1": init_linear(ks[1], 8, 32), "fc2": init_linear(ks[2], 32, 8)}
    assert mlp(mp, x).shape == (2, 8)
    sp = {
        "gate": init_linear(ks[1], 8, 32, bias=False),
        "up": init_linear(ks[2], 8, 32, bias=False),
        "down": init_linear(ks[3], 32, 8, bias=False),
    }
    assert swiglu_mlp(sp, x).shape == (2, 8)


def test_rope_matches_hf():
    torch = pytest.importorskip("torch")
    from transformers.models.llama.modeling_llama import (
        LlamaRotaryEmbedding,
        apply_rotary_pos_emb,
    )
    from transformers import LlamaConfig

    b, s, h, d = 2, 10, 4, 16
    x = np.random.RandomState(0).randn(b, s, h, d).astype(np.float32)
    cos, sin = rope_table(d, 32)
    positions = jnp.tile(jnp.arange(s)[None], (b, 1))
    got = apply_rope(jnp.asarray(x), cos, sin, positions)

    cfg = LlamaConfig(hidden_size=h * d, num_attention_heads=h, max_position_embeddings=32)
    rot = LlamaRotaryEmbedding(config=cfg)
    xt = torch.from_numpy(x).permute(0, 2, 1, 3)  # (b, h, s, d)
    pos = torch.arange(s)[None].repeat(b, 1)
    tcos, tsin = rot(xt, pos)
    want, _ = apply_rotary_pos_emb(xt, xt, tcos, tsin)
    np.testing.assert_allclose(
        np.asarray(got), want.permute(0, 2, 1, 3).numpy(), atol=1e-5
    )


class TestPackedQKVAttention:
    """Packed-qkv fused kernel (ops/attention.py): the ViT encode path's
    attention, taking the (B, S, 3*H*D) qkv projection directly so no HBM
    q/k/v split copies surround the Pallas call."""

    def _qkv_packed(self, key, b, s, h, d, dtype=jnp.float32):
        return jax.random.normal(key, (b, s, 3 * h * d), dtype)

    def test_kernel_matches_reference(self):
        from stllm_tpu.ops.attention import (
            _packed_qkv_impl, _packed_reference)

        b, s, h, d = 2, 37, 4, 24
        qkv = self._qkv_packed(jax.random.PRNGKey(0), b, s, h, d)
        ref = _packed_reference(qkv, h, d, d ** -0.5)
        out = _packed_qkv_impl(qkv, h, d, d ** -0.5, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_quant_epilogue_matches_external_quant(self):
        from stllm_tpu.ops.attention import (
            _packed_reference, fused_qkv_attention_quant)
        from stllm_tpu.ops.quant import quantize_activations

        b, s, h, d = 2, 29, 4, 16
        qkv = self._qkv_packed(jax.random.PRNGKey(1), b, s, h, d)
        oq, osc = fused_qkv_attention_quant(qkv, h, d, interpret=True)
        rq, rsc = quantize_activations(_packed_reference(qkv, h, d, d ** -0.5))
        assert int(np.asarray(oq != rq).sum()) == 0
        np.testing.assert_allclose(np.asarray(osc), np.asarray(rsc), atol=1e-7)

    def test_gradients_match_reference(self):
        from stllm_tpu.ops.attention import (
            _packed_reference, fused_qkv_attention)

        b, s, h, d = 1, 19, 2, 8
        qkv = self._qkv_packed(jax.random.PRNGKey(2), b, s, h, d)
        g = jax.grad(lambda t: (fused_qkv_attention(
            t, h, d, interpret=True) ** 2).sum())(qkv)
        gr = jax.grad(lambda t: (_packed_reference(
            t, h, d, d ** -0.5) ** 2).sum())(qkv)
        np.testing.assert_allclose(np.asarray(g), np.asarray(gr), atol=1e-5)

    def test_vmem_misfit_falls_back(self):
        from stllm_tpu.ops.attention import fused_qkv_attention

        # seq >= 1024 is infeasible for the single-pass kernel
        qkv = self._qkv_packed(jax.random.PRNGKey(3), 1, 1100, 2, 8)
        out = fused_qkv_attention(qkv, 2, 8)
        assert out.shape == (1, 1100, 16)

    def test_static_s8_kernel_matches_reference(self):
        """Static-int8-qkv kernel (round 3): both dot variants == the XLA
        reference with the kernel's exact math."""
        from stllm_tpu.ops.attention import (
            _packed_s8_reference, fused_qkv_attention_quant_static)

        rng = np.random.RandomState(60)
        b, s, h, d = 2, 33, 4, 24
        qkv_q = jnp.asarray(rng.randint(-127, 128, (b, s, 3 * h * d)),
                            jnp.int8)
        sq, sk, sv = 0.01, 0.012, 0.008
        wq, wsc = _packed_s8_reference(qkv_q, sq, sk, sv, h, d, d ** -0.5)
        want = np.asarray(wq, np.float32) * np.asarray(wsc)
        for int8_dot in (True, False):
            got = fused_qkv_attention_quant_static(
                qkv_q, sq, sk, sv, h, d, int8_dot=int8_dot, interpret=True)
            assert got is not None
            deq = np.asarray(got[0], np.float32) * np.asarray(got[1])
            np.testing.assert_allclose(deq, want, atol=1e-4, rtol=1e-4)

    def test_static_s8_misfit_declines(self):
        from stllm_tpu.ops.attention import fused_qkv_attention_quant_static

        qkv_q = jnp.zeros((1, 1100, 48), jnp.int8)  # seq >= 1024
        assert fused_qkv_attention_quant_static(
            qkv_q, 0.01, 0.01, 0.01, 2, 8) is None

    def test_static_attn_vit_close_to_dynamic_attn(self):
        """ViT static path with int8 qkv attention (act_scales['attn']) stays
        close to the same path with bf16-qkv attention (scales stripped)."""
        from stllm_tpu.models import vit as vit_mod
        from stllm_tpu.models.vit import (
            ViTConfig, calibrate_vit_scales, init_vit, quantize_vit_params,
            vit_forward)

        cfg = ViTConfig(image_size=56, patch_size=14, width=256, depth=2,
                        heads=4, mlp_hidden=512, dtype=jnp.float32)
        params = init_vit(jax.random.PRNGKey(61), cfg)
        imgs = jax.random.normal(jax.random.PRNGKey(62), (2, 56, 56, 3))
        ps = calibrate_vit_scales(quantize_vit_params(params), imgs, cfg)
        assert all(b["act_scales"]["attn"].shape == (3,)
                   for b in ps["blocks"])
        old = vit_mod.INT8_QKT
        try:
            vit_mod.INT8_QKT = "1"
            with_s8 = vit_forward(ps, imgs, cfg)
            vit_mod.INT8_QKT = "0"
            without = vit_forward(ps, imgs, cfg)
        finally:
            vit_mod.INT8_QKT = old
        rel = float(jnp.abs(with_s8 - without).mean()
                    / (jnp.abs(without).mean() + 1e-9))
        assert rel < 0.02, rel
