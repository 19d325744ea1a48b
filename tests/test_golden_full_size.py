"""Full-size golden-logit fixtures vs HF transformers (CPU).

The tiny-dim parity tests (test_llama.py, test_vit.py, test_qformer.py)
prove the math; these prove it at the REAL model shapes — 4096-hidden
LLaMA layer + lm_head (Vicuna-7B dims, reference: stllm/model.py /
modeling_llama_mem.py) and the 1408-wide EVA-ViT-g block
(stllm/models/eva_vit.py:416-428) — the largest parity scale reachable
without weights on disk. Random weights, fp32, single layer per model so
the suite stays fast on one CPU core.

Recorded tolerances (what full-size fp32 accumulation-order divergence
actually costs, for the day real checkpoints appear):
  - LLaMA layer + lm_head logits: atol 2e-3 observed max |diff| ~3e-4
  - ViT-g block:                  atol 1e-3 observed max |diff| ~1e-4
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from stllm_tpu.convert.torch_to_jax import convert_hf_llama
from stllm_tpu.models.llama import LlamaConfig, llama_forward, lm_head


FULL = LlamaConfig(
    vocab_size=32000, hidden=4096, num_layers=1, heads=32,
    intermediate=11008, max_positions=2048, dtype=jnp.float32,
)


@pytest.mark.slow
def test_full_size_llama_layer_and_lm_head_golden():
    from transformers import LlamaConfig as HFConfig, LlamaForCausalLM

    hf_cfg = HFConfig(
        vocab_size=FULL.vocab_size, hidden_size=FULL.hidden,
        num_hidden_layers=FULL.num_layers, num_attention_heads=FULL.heads,
        num_key_value_heads=FULL.heads, intermediate_size=FULL.intermediate,
        max_position_embeddings=FULL.max_positions, rms_norm_eps=FULL.rms_eps,
        rope_theta=FULL.rope_theta, attn_implementation="eager",
        tie_word_embeddings=False,
    )
    torch.manual_seed(7)
    model = LlamaForCausalLM(hf_cfg).eval()
    params = convert_hf_llama(model.state_dict(), FULL, dtype=jnp.float32)

    ids = np.random.RandomState(3).randint(0, FULL.vocab_size, (1, 9))
    with torch.no_grad():
        want = model(torch.from_numpy(ids)).logits.numpy()
    hidden, _ = llama_forward(params, input_ids=jnp.asarray(ids), cfg=FULL)
    got = np.asarray(lm_head(params, hidden))

    assert got.shape == want.shape == (1, 9, 32000)
    max_abs = float(np.abs(got - want).max())
    # greedy-decode safety: the argmax token must already agree
    assert (got.argmax(-1) == want.argmax(-1)).all()
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3,
                               err_msg=f"max|diff|={max_abs}")


@pytest.mark.slow
def test_full_size_vit_g_block_golden():
    """One EVA-ViT-g block at real dims vs a torch oracle mirroring
    eva_vit.py:60-140 (pre-norm, q/v-only bias, exact GELU)."""
    from stllm_tpu.models.vit import EVA_VIT_G, init_vit, vit_block
    import dataclasses

    cfg = dataclasses.replace(EVA_VIT_G, depth=1, dtype=jnp.float32)
    params = init_vit(jax.random.PRNGKey(11), cfg)
    blk = params["blocks"][0]
    # non-trivial weights (init_vit zeros the biases/norms where torch would)
    rs = np.random.RandomState(5)
    for name in ("norm1", "norm2"):
        blk[name]["scale"] = jnp.asarray(1 + 0.1 * rs.randn(cfg.width), jnp.float32)
        blk[name]["bias"] = jnp.asarray(0.1 * rs.randn(cfg.width), jnp.float32)
    blk["q_bias"] = jnp.asarray(0.1 * rs.randn(cfg.width), jnp.float32)
    blk["v_bias"] = jnp.asarray(0.1 * rs.randn(cfg.width), jnp.float32)

    x = rs.randn(1, cfg.seq_len, cfg.width).astype(np.float32) * 0.5
    got = np.asarray(vit_block(blk, jnp.asarray(x), cfg))

    # torch oracle
    def t(a):
        return torch.from_numpy(np.asarray(a, np.float32))

    with torch.no_grad():
        xt = t(x)
        h = torch.nn.functional.layer_norm(
            xt, (cfg.width,), t(blk["norm1"]["scale"]), t(blk["norm1"]["bias"]),
            eps=cfg.ln_eps)
        qkv_bias = torch.cat([t(blk["q_bias"]),
                              torch.zeros(cfg.width), t(blk["v_bias"])])
        qkv = h @ t(blk["qkv"]["w"]) + qkv_bias
        q, k, v = qkv.chunk(3, dim=-1)
        B, N, H, D = 1, cfg.seq_len, cfg.heads, cfg.head_dim
        q = q.view(B, N, H, D).permute(0, 2, 1, 3)
        k = k.view(B, N, H, D).permute(0, 2, 1, 3)
        v = v.view(B, N, H, D).permute(0, 2, 1, 3)
        attn = torch.softmax(q @ k.transpose(-2, -1) * D ** -0.5, dim=-1)
        o = (attn @ v).permute(0, 2, 1, 3).reshape(B, N, H * D)
        x1 = xt + (o @ t(blk["proj"]["w"]) + t(blk["proj"]["b"]))
        h2 = torch.nn.functional.layer_norm(
            x1, (cfg.width,), t(blk["norm2"]["scale"]), t(blk["norm2"]["bias"]),
            eps=cfg.ln_eps)
        h2 = torch.nn.functional.gelu(h2 @ t(blk["fc1"]["w"]) + t(blk["fc1"]["b"]))
        want = (x1 + (h2 @ t(blk["fc2"]["w"]) + t(blk["fc2"]["b"]))).numpy()

    max_abs = float(np.abs(got - want).max())
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3,
                               err_msg=f"max|diff|={max_abs}")
