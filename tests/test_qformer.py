import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stllm_tpu.models.qformer import QFormerConfig, init_qformer, qformer_forward
from stllm_tpu.convert.torch_to_jax import convert_qformer, hf_qformer_to_lavis

torch = pytest.importorskip("torch")

TINY = QFormerConfig(
    hidden=32, num_layers=4, heads=2, intermediate=64, encoder_width=48,
    cross_attention_freq=2, num_query=8, vocab_size=100, max_positions=64,
    dtype=jnp.float32,
)


def _hf_model():
    from transformers import InstructBlipQFormerConfig, InstructBlipQFormerModel

    cfg = InstructBlipQFormerConfig(
        hidden_size=TINY.hidden, num_hidden_layers=TINY.num_layers,
        num_attention_heads=TINY.heads, intermediate_size=TINY.intermediate,
        encoder_hidden_size=TINY.encoder_width,
        cross_attention_frequency=TINY.cross_attention_freq,
        vocab_size=TINY.vocab_size, max_position_embeddings=TINY.max_positions,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    return InstructBlipQFormerModel(cfg).eval()


def test_qformer_parity_with_hf_instructblip():
    model = _hf_model()
    sd = dict(model.state_dict())
    sd["query_tokens"] = torch.randn(1, TINY.num_query, TINY.hidden) * 0.02
    params = convert_qformer(hf_qformer_to_lavis(sd), TINY, dtype=jnp.float32)

    rs = np.random.RandomState(0)
    b, t, s_img = 2, 6, 10
    input_ids = rs.randint(0, TINY.vocab_size, (b, t)).astype(np.int64)
    attn_mask = np.ones((b, t), np.int64)
    attn_mask[1, 4:] = 0  # padding on row 1
    enc = rs.randn(b, s_img, TINY.encoder_width).astype(np.float32)
    query = np.asarray(sd["query_tokens"].expand(b, -1, -1))

    with torch.no_grad():
        want = model(
            input_ids=torch.from_numpy(input_ids),
            attention_mask=torch.cat(
                [torch.ones(b, TINY.num_query), torch.from_numpy(attn_mask)], dim=1
            ),
            query_embeds=torch.from_numpy(query),
            encoder_hidden_states=torch.from_numpy(enc),
        ).last_hidden_state.numpy()

    got = qformer_forward(
        params,
        encoder_hidden_states=jnp.asarray(enc),
        input_ids=jnp.asarray(input_ids),
        attention_mask=jnp.asarray(attn_mask),
        cfg=TINY,
    )
    assert got.shape == want.shape == (b, TINY.num_query + t, TINY.hidden)
    # padded text rows diverge (we mask them; HF computes garbage there) —
    # compare query positions and unpadded text positions
    np.testing.assert_allclose(
        np.asarray(got[:, : TINY.num_query]), want[:, : TINY.num_query],
        atol=2e-5, rtol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got[0, TINY.num_query:]), want[0, TINY.num_query:],
        atol=2e-5, rtol=2e-5,
    )


def test_qformer_query_only_mode():
    model = _hf_model()
    sd = dict(model.state_dict())
    sd["query_tokens"] = torch.randn(1, TINY.num_query, TINY.hidden) * 0.02
    params = convert_qformer(hf_qformer_to_lavis(sd), TINY, dtype=jnp.float32)

    rs = np.random.RandomState(1)
    enc = rs.randn(2, 10, TINY.encoder_width).astype(np.float32)
    got = qformer_forward(params, encoder_hidden_states=jnp.asarray(enc), cfg=TINY)
    assert got.shape == (2, TINY.num_query, TINY.hidden)

    # HF query-only: pass empty-ish input handled via query_embeds only
    query = np.asarray(sd["query_tokens"].expand(2, -1, -1))
    with torch.no_grad():
        want = model(
            input_ids=None,
            query_embeds=torch.from_numpy(query),
            attention_mask=torch.ones(2, TINY.num_query),
            encoder_hidden_states=torch.from_numpy(enc),
        ).last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(got), want[:, : TINY.num_query],
                               atol=2e-5, rtol=2e-5)


def test_qformer_init_shapes():
    params = init_qformer(jax.random.PRNGKey(0), TINY, text_input=True)
    assert len(params["layers"]) == TINY.num_layers
    assert "crossattention" in params["layers"][0]
    assert "crossattention" not in params["layers"][1]
    out = qformer_forward(
        params,
        encoder_hidden_states=jnp.ones((2, 10, TINY.encoder_width)),
        input_ids=jnp.zeros((2, 5), jnp.int32),
        cfg=TINY,
    )
    assert out.shape == (2, TINY.num_query + 5, TINY.hidden)

    # no-text mode (reference strips text FFN + embeddings)
    p2 = init_qformer(jax.random.PRNGKey(1), TINY, text_input=False)
    assert p2["embeddings"]["word"] is None
    out2 = qformer_forward(p2, encoder_hidden_states=jnp.ones((2, 10, TINY.encoder_width)), cfg=TINY)
    assert out2.shape == (2, TINY.num_query, TINY.hidden)
