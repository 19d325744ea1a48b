"""Fusion model (ST-LLM) + packing tests on tiny configs.

Key invariants verified:
  - packing layout matches the reference's compacted splicing semantics
    (reference: stllm/models/st_llm.py:379-432, 496-542);
  - residual (global-local) module is a no-op at init (zero-init up_proj,
    reference: st_llm.py:240-247);
  - with a keep-everything mask the student and teacher sequences coincide, so
    loss_mvm == 0 and the CE matches the unmasked run (reference MVM loss:
    st_llm.py:86-91).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stllm_tpu.data.packing import (
    IGNORE,
    pack_rows,
    pack_training_batch,
    sample_video_mask,
    text_seg,
    video_seg,
)
from stllm_tpu.models.llama import LlamaConfig
from stllm_tpu.models.qformer import QFormerConfig
from stllm_tpu.models.stllm import (
    STLLMConfig,
    apply_video_input,
    encode_img,
    init_stllm,
    residual_frame_index,
    stllm_forward,
)
from stllm_tpu.models.vit import ViTConfig

TINY = STLLMConfig(
    vit=ViTConfig(image_size=28, patch_size=14, width=32, depth=2, heads=2,
                  mlp_hidden=64, dtype=jnp.float32, use_flash=False),
    qformer=QFormerConfig(hidden=16, num_layers=2, heads=2, intermediate=32,
                          encoder_width=32, num_query=4, vocab_size=64,
                          dtype=jnp.float32),
    llama=LlamaConfig(vocab_size=97, hidden=32, num_layers=2, heads=2,
                      intermediate=64, max_positions=256, dtype=jnp.float32),
    video_input="residual",
    residual_size=2,
)

B, T, PAD = 2, 4, 0


@pytest.fixture(scope="module")
def params():
    return init_stllm(jax.random.PRNGKey(0), TINY)


def _frames(b=B, t=T):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(size=(b, t, 28, 28, 3)), jnp.float32)


# ---------------------------------------------------------------------------
# packing
# ---------------------------------------------------------------------------

def test_pack_rows_layout():
    rows = [[text_seg([5, 6]), video_seg([0, 1, 2]), text_seg([7]),
             text_seg([8, 9], labels=[8, 9])]]
    p = pack_rows(rows, seq_len=12, pad_id=PAD, num_video=3)
    assert p.token_ids[0, :2].tolist() == [5, 6]
    assert p.video_slot[0, 2:5].tolist() == [0, 1, 2]
    assert p.token_ids[0, 5] == 7
    assert p.labels[0].tolist() == [IGNORE] * 6 + [8, 9] + [IGNORE] * 4
    assert p.attn_mask[0].tolist() == [1] * 8 + [0] * 4
    assert p.video_pos[0].tolist() == [2, 3, 4]


def test_pack_masked_student_keeps_order():
    keep = np.array([[True, False, True, True, False, True]])
    batch = pack_training_batch(
        [[1, 2]], [[3]], [[4, 5]], num_video=6, seq_len=16, pad_id=PAD, keep=keep
    )
    # student video slots contain kept original indices, in order
    slots = batch["video_slot"][0]
    assert slots[slots >= 0].tolist() == [0, 2, 3, 5]
    # teacher has all six
    t_slots = batch["t_video_slot"][0]
    assert t_slots[t_slots >= 0].tolist() == [0, 1, 2, 3, 4, 5]
    assert batch["mvm_weight"][0].tolist() == [1, 0, 1, 1, 0, 1]
    # student/teacher slots agree for kept tokens before the first drop
    assert batch["mvm_student_slots"][0, 0] == batch["mvm_teacher_slots"][0, 0]


def test_sample_video_mask_counts():
    rng = np.random.default_rng(0)
    keep = sample_video_mask(rng, batch=4, num_tokens=40)
    kept_counts = keep.sum(axis=1)
    assert (kept_counts == kept_counts[0]).all()        # same count per row
    assert 40 * 0.3 <= kept_counts[0] <= 40 * 0.9       # rate in [0.1, 0.7]


# ---------------------------------------------------------------------------
# encode + video_input
# ---------------------------------------------------------------------------

def test_encode_img_shapes(params):
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 64, (B, 5)), jnp.int32)
    mask = jnp.ones((B, 5), jnp.int32)
    out = encode_img(params, _frames(), TINY, ids, mask)
    assert out.shape == (B, T, TINY.num_query, TINY.llama.hidden)


def test_encode_img_mapped_matches_naive(params):
    """encode_img_mapped (sequential per-video lax.map, the batched-eval
    path) produces the same embeddings as the naive batched encode_img."""
    from stllm_tpu.models.stllm import encode_img_mapped

    ids = jnp.asarray(np.random.default_rng(1).integers(0, 64, (B, 5)), jnp.int32)
    mask = jnp.ones((B, 5), jnp.int32)
    naive = encode_img(params, _frames(), TINY, ids, mask)
    mapped = encode_img_mapped(params, _frames(), TINY, ids, mask)
    np.testing.assert_allclose(np.asarray(mapped), np.asarray(naive),
                               rtol=2e-5, atol=2e-5)
    # no-question path + B=1 passthrough
    one = encode_img_mapped(params, _frames()[:1], TINY)
    assert one.shape == (1, T, TINY.num_query, TINY.llama.hidden)


def test_video_input_modes(params):
    img = jnp.asarray(np.random.default_rng(2).normal(size=(B, T, 4, 32)), jnp.float32)
    all_cfg = STLLMConfig(**{**TINY.__dict__, "video_input": "all"})
    mean_cfg = STLLMConfig(**{**TINY.__dict__, "video_input": "mean"})
    assert apply_video_input(params, img, all_cfg).shape == (B, T * 4, 32)
    assert apply_video_input(params, img, mean_cfg).shape == (B, 4, 32)
    res = apply_video_input(params, img, TINY)
    assert res.shape == (B, TINY.residual_size * 4, 32)
    # zero-init up_proj => residual output == the selected local frames
    idx = residual_frame_index(TINY.residual_size, T)
    np.testing.assert_allclose(
        np.asarray(res), np.asarray(img[:, idx].reshape(B, -1, 32)), rtol=1e-6
    )
    # image path (T == 1) bypasses video_input
    assert apply_video_input(params, img[:, :1], TINY).shape == (B, 4, 32)


def test_residual_index_matches_reference():
    # reference formula (st_llm.py:434-445) for T=16, R=4
    assert residual_frame_index(4, 16) == [2, 6, 10, 14]
    assert residual_frame_index(2, 4) == [1, 3]


# ---------------------------------------------------------------------------
# training forward
# ---------------------------------------------------------------------------

def _train_batch(keep=None):
    v = TINY.num_video_tokens(T)
    rng = np.random.default_rng(3)
    before = [[5, 6, 7], [5, 6]]
    after = [[8, 9], [8, 9, 10]]
    answer = [[11, 12, 13], [14, 15]]
    batch = pack_training_batch(before, after, answer, num_video=v, seq_len=32,
                                pad_id=PAD, keep=keep)
    batch = {k: jnp.asarray(val) for k, val in batch.items()}
    batch["frames"] = _frames()
    batch["qformer_input_ids"] = jnp.asarray(rng.integers(0, 64, (B, 5)), jnp.int32)
    batch["qformer_attention_mask"] = jnp.ones((B, 5), jnp.int32)
    return batch


def test_forward_no_mask(params):
    out = stllm_forward(params, _train_batch(), TINY)
    assert np.isfinite(float(out["loss"]))
    assert "loss_mvm" not in out


def test_forward_keep_all_mask_gives_zero_mvm(params):
    v = TINY.num_video_tokens(T)
    keep = np.ones((B, v), bool)
    out_masked = stllm_forward(params, _train_batch(keep=keep), TINY)
    out_plain = stllm_forward(params, _train_batch(), TINY)
    # identical student/teacher sequences -> cosine == 1 -> mvm loss == 0
    assert float(out_masked["loss_mvm"]) < 1e-5
    np.testing.assert_allclose(
        float(out_masked["loss_ce"]), float(out_plain["loss_ce"]), rtol=1e-5
    )


def test_forward_real_mask_grads_flow(params):
    # 1-layer stacks: value_and_grad of the full MVM step (student+teacher)
    # was the suite's #2 compile cost at 2 layers (43 s); the forward-only
    # tests keep the 2-layer config
    import dataclasses

    cfg1 = STLLMConfig(**{
        **TINY.__dict__,
        "vit": dataclasses.replace(TINY.vit, depth=1),
        "qformer": dataclasses.replace(TINY.qformer, num_layers=1),
        "llama": dataclasses.replace(TINY.llama, num_layers=1),
    })
    p1 = dict(params)
    p1["vit"] = {**params["vit"], "blocks": params["vit"]["blocks"][:1]}
    p1["qformer"] = {**params["qformer"],
                     "layers": params["qformer"]["layers"][:1]}
    p1["llama"] = {**params["llama"], "layers": params["llama"]["layers"][:1]}

    v = cfg1.num_video_tokens(T)
    rng = np.random.default_rng(0)
    keep = sample_video_mask(rng, B, v)
    batch = _train_batch(keep=keep)

    def loss_fn(p):
        return stllm_forward(p, batch, cfg1)["loss"]

    loss, grads = jax.value_and_grad(loss_fn)(p1)
    assert np.isfinite(float(loss))
    g = np.asarray(grads["llama_proj"]["w"], np.float32)
    assert np.abs(g).sum() > 0  # gradient reaches the projection
    # teacher pass is stop_gradient'd: residual up_proj grads come only from
    # the student path; just check finiteness everywhere
    flat, _ = jax.tree_util.tree_flatten(grads)
    assert all(np.isfinite(np.asarray(x, np.float32)).all() for x in flat)
