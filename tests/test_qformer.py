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


def test_unilm_mask_matches_reference_semantics():
    """unilm_attention_mask == the reference get_extended_attention_mask
    (is_decoder=True, has_query=True) math (stllm/models/Qformer.py:713-802),
    reproduced here in numpy."""
    from stllm_tpu.models.qformer import unilm_attention_mask

    b, q, t = 3, 4, 6
    rs = np.random.RandomState(2)
    pad = np.ones((b, q + t), np.int64)
    pad[1, q + 3:] = 0
    pad[2, q + 1:] = 0

    # reference construction
    seq_ids = np.arange(t)
    causal = (seq_ids[None, None, :].repeat(t, 1) <= seq_ids[None, :, None])
    causal = np.broadcast_to(causal, (b, t, t)).astype(np.float32)
    causal = np.concatenate([np.zeros((b, q, t), np.float32), causal], axis=1)
    causal = np.concatenate([np.ones((b, q + t, q), np.float32), causal], axis=2)
    want = causal * pad[:, None, :].astype(np.float32)

    got = unilm_attention_mask(jnp.asarray(pad), q)
    np.testing.assert_array_equal(np.asarray(got, np.float32), want)


def test_qformer_unilm_forward_parity_with_hf():
    """The UniLM-masked decoder pass == HF InstructBlip QFormer fed the same
    3-D attention mask (HF's get_extended_attention_mask broadcasts 3-D
    masks as-is), validating mask application + query/text routing."""
    from stllm_tpu.models.qformer import unilm_attention_mask

    model = _hf_model()
    sd = dict(model.state_dict())
    sd["query_tokens"] = torch.randn(1, TINY.num_query, TINY.hidden) * 0.02
    params = convert_qformer(hf_qformer_to_lavis(sd), TINY, dtype=jnp.float32)

    rs = np.random.RandomState(3)
    b, t, s_img = 2, 5, 10
    input_ids = rs.randint(0, TINY.vocab_size, (b, t)).astype(np.int64)
    enc = rs.randn(b, s_img, TINY.encoder_width).astype(np.float32)
    query = np.asarray(sd["query_tokens"].expand(b, -1, -1))
    pad = np.ones((b, TINY.num_query + t), np.int64)
    pad[1, -2:] = 0
    mask3 = np.asarray(unilm_attention_mask(jnp.asarray(pad), TINY.num_query))

    with torch.no_grad():
        want = model(
            input_ids=torch.from_numpy(input_ids),
            attention_mask=torch.from_numpy(mask3.astype(np.float32)),
            query_embeds=torch.from_numpy(query),
            encoder_hidden_states=torch.from_numpy(enc),
        ).last_hidden_state.numpy()

    got = qformer_forward(
        params,
        encoder_hidden_states=jnp.asarray(enc),
        input_ids=jnp.asarray(input_ids),
        attention_mask=jnp.asarray(pad[:, TINY.num_query:]),
        cfg=TINY,
        self_attn_mask=jnp.asarray(mask3),
    )
    # row 1's padded tail positions attend nothing real; compare valid rows
    np.testing.assert_allclose(
        np.asarray(got[0]), want[0], atol=3e-5, rtol=3e-5)
    np.testing.assert_allclose(
        np.asarray(got[1, :-2]), want[1, :-2], atol=3e-5, rtol=3e-5)


def test_qformer_lm_head_and_loss():
    """qformer_lm_forward's head == BertOnlyMLMHead with tied decoder; loss
    == torch CrossEntropyLoss(label_smoothing=0.1) on shifted logits
    (reference: stllm/models/Qformer.py:1074-1083)."""
    from transformers.models.bert.modeling_bert import BertOnlyMLMHead
    from transformers import BertConfig

    from stllm_tpu.models.qformer import (
        init_qformer_lm, qformer_lm_forward, qformer_lm_logits)

    rng = jax.random.PRNGKey(5)
    params = init_qformer_lm(rng, TINY)

    bcfg = BertConfig(
        hidden_size=TINY.hidden, vocab_size=TINY.vocab_size,
        layer_norm_eps=TINY.ln_eps, hidden_act="gelu")
    torch.manual_seed(1)
    head = BertOnlyMLMHead(bcfg).eval()
    # copy torch head -> jax params (decoder tied to word embeddings)
    hp = {k: v.detach().numpy() for k, v in head.state_dict().items()}
    params["cls"]["transform"]["w"] = jnp.asarray(
        hp["predictions.transform.dense.weight"].T)
    params["cls"]["transform"]["b"] = jnp.asarray(
        hp["predictions.transform.dense.bias"])
    params["cls"]["transform_norm"]["scale"] = jnp.asarray(
        hp["predictions.transform.LayerNorm.weight"])
    params["cls"]["transform_norm"]["bias"] = jnp.asarray(
        hp["predictions.transform.LayerNorm.bias"])
    params["cls"]["bias"] = jnp.asarray(hp["predictions.bias"])
    with torch.no_grad():
        head.predictions.decoder.weight.copy_(
            torch.from_numpy(np.asarray(params["embeddings"]["word"])))
        head.predictions.decoder.bias.copy_(
            torch.from_numpy(hp["predictions.bias"]))

    rs = np.random.RandomState(6)
    hidden = rs.randn(2, 5, TINY.hidden).astype(np.float32)
    got = qformer_lm_logits(params, jnp.asarray(hidden), TINY)
    with torch.no_grad():
        want = head(torch.from_numpy(hidden)).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=2e-4)

    # full forward + smoothed loss vs torch oracle
    b, t, s_img = 2, 6, 10
    input_ids = rs.randint(0, TINY.vocab_size, (b, t))
    labels = input_ids.copy()
    labels[0, :2] = -100
    enc = rs.randn(b, s_img, TINY.encoder_width).astype(np.float32)
    loss, logits = qformer_lm_forward(
        params, input_ids=jnp.asarray(input_ids),
        encoder_hidden_states=jnp.asarray(enc),
        labels=jnp.asarray(labels), cfg=TINY)
    lg = torch.from_numpy(np.asarray(logits[:, :-1], np.float32))
    lb = torch.from_numpy(labels[:, 1:].astype(np.int64))
    want_loss = torch.nn.CrossEntropyLoss(label_smoothing=0.1)(
        lg.reshape(-1, TINY.vocab_size), lb.reshape(-1)).item()
    assert abs(float(loss) - want_loss) < 1e-5, (float(loss), want_loss)


def test_qformer_lm_generate():
    from stllm_tpu.models.qformer import init_qformer_lm, qformer_lm_generate

    params = init_qformer_lm(jax.random.PRNGKey(7), TINY)
    enc = jnp.asarray(np.random.RandomState(8).randn(2, 10, TINY.encoder_width),
                      jnp.float32)
    out = qformer_lm_generate(params, enc, bos_token_id=1, eos_token_id=2,
                              max_new_tokens=5, cfg=TINY)
    assert len(out) == 2 and all(1 <= len(r) <= 5 for r in out)
    # greedy property: re-running the forward on the emitted prefix
    # reproduces each chosen token
    from stllm_tpu.models.qformer import qformer_lm_forward

    row = [1] + out[0]
    logits = qformer_lm_forward(
        params, input_ids=jnp.asarray([row], jnp.int32),
        encoder_hidden_states=enc[:1], cfg=TINY)
    for i, tok in enumerate(out[0]):
        assert int(jnp.argmax(logits[0, i])) == tok


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
