"""BTAdapter branch tests.

Invariants (vs reference stllm/models/eva_btadapter.py):
  - output shape matches the plain ViT (per-frame tokens, B*T rows);
  - the branch mixes information ACROSS frames (the plain ViT cannot);
  - spatial branch blocks are initialized as copies of the last trunk blocks;
  - gradients flow to btadapter params under the default freezing policy
    while the trunk stays frozen (reference: st_llm.py:257-261);
  - fusion encode_img works with vit_model="eva_btadapter_g".
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stllm_tpu.models.btadapter import btadapter_forward, init_btadapter
from stllm_tpu.models.llama import LlamaConfig
from stllm_tpu.models.qformer import QFormerConfig
from stllm_tpu.models.stllm import STLLMConfig, encode_img, init_stllm
from stllm_tpu.models.vit import ViTConfig, init_vit, vit_forward
from stllm_tpu.train.step import default_trainable, partition_params, path_str

CFG = ViTConfig(image_size=28, patch_size=14, width=32, depth=4, heads=2,
                mlp_hidden=64, dtype=jnp.float32, use_flash=False)
B, T = 2, 4


@pytest.fixture(scope="module")
def params():
    return init_btadapter(jax.random.PRNGKey(0), CFG, depth=2)


def _frames(seed=0, b=B, t=T):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(b * t, 28, 28, 3)), jnp.float32)


def test_output_shape(params):
    out = btadapter_forward(params, _frames(), CFG, num_frames=T)
    assert out.shape == (B * T, CFG.seq_len, CFG.width)
    assert np.isfinite(np.asarray(out)).all()


def test_quantized_btadapter_drift(params):
    """int8 BTAdapter (trunk + branch quantized, then trunk calibrated to
    static scales) stays close to the dense forward — the serving path for
    the reference's btadapter QA config."""
    from stllm_tpu.models.vit import calibrate_vit_scales, quantize_vit_params

    dense = btadapter_forward(params, _frames(), CFG, num_frames=T)
    pq = quantize_vit_params(params)
    assert "w_q" in pq["btadapter"]["temp"][0]["qkv"]
    assert "w_q" in pq["btadapter"]["spatial"][0]["fc1"]
    qout = btadapter_forward(pq, _frames(), CFG, num_frames=T)
    rel = float(jnp.abs(qout - dense).mean() / jnp.abs(dense).mean())
    assert rel < 0.02, rel

    ps = calibrate_vit_scales(pq, _frames(), CFG)
    assert all("act_scales" in b for b in ps["blocks"])  # trunk static
    sout = btadapter_forward(ps, _frames(), CFG, num_frames=T)
    rel_s = float(jnp.abs(sout - dense).mean() / jnp.abs(dense).mean())
    assert rel_s < 0.03, rel_s


def test_fully_static_btadapter_drift(params):
    """calibrate_btadapter_scales (round 3): trunk AND branch on calibrated
    static scales — the serving path for the reference QA config's encoder.
    Drift vs dense stays in the dynamic-int8 ballpark, and the static branch
    layers are actually dispatched."""
    from stllm_tpu.models.btadapter import calibrate_btadapter_scales
    from stllm_tpu.models.vit import quantize_vit_params

    dense = btadapter_forward(params, _frames(), CFG, num_frames=T)
    pq = quantize_vit_params(params)
    ps = calibrate_btadapter_scales(pq, _frames(), CFG, num_frames=T)
    assert all("act_scales" in b for b in ps["blocks"])
    assert all("act_scales" in l for l in ps["btadapter"]["temp"])
    assert all("act_scales" in l for l in ps["btadapter"]["spatial"])
    assert set(ps["btadapter"]["temp"][0]["act_scales"]) == {
        "qkv", "proj", "temporal_fc"}
    assert set(ps["btadapter"]["spatial"][0]["act_scales"]) == {
        "qkv", "proj", "fc1", "fc2", "attn"}
    sout = btadapter_forward(ps, _frames(), CFG, num_frames=T)
    rel = float(jnp.abs(sout - dense).mean() / jnp.abs(dense).mean())
    assert rel < 0.04, rel

    # robustness: uncalibrated inputs saturate, not explode
    other = btadapter_forward(ps, _frames(seed=9) * 1.5, CFG, num_frames=T)
    assert np.isfinite(np.asarray(other)).all()


def test_spatial_blocks_copy_trunk(params):
    for i, sp in enumerate(params["btadapter"]["spatial"]):
        trunk = params["blocks"][CFG.depth - 2 + i]
        np.testing.assert_array_equal(
            np.asarray(sp["qkv"]["w"]), np.asarray(trunk["qkv"]["w"])
        )


def test_branch_mixes_frames(params):
    """Perturbing frame 0 must change other frames' outputs (via the branch);
    the plain ViT treats frames independently."""
    f = _frames()
    f2 = f.at[0].add(1.0)  # frame 0 of batch row 0
    out, out2 = (btadapter_forward(params, x, CFG, num_frames=T) for x in (f, f2))
    # rows 1..T-1 belong to the same video -> must differ through the branch
    assert np.abs(np.asarray(out2[1] - out[1])).max() > 1e-6
    # rows of the OTHER video (batch row 1) must be untouched
    np.testing.assert_allclose(np.asarray(out[T:]), np.asarray(out2[T:]), atol=1e-6)

    vit_params = {k: v for k, v in params.items() if k != "btadapter"}
    v1, v2 = (vit_forward(vit_params, x, CFG) for x in (f, f2))
    np.testing.assert_allclose(np.asarray(v1[1]), np.asarray(v2[1]), atol=1e-6)


def test_freeze_policy_trains_branch_only():
    tiny = STLLMConfig(
        vit=CFG, vit_model="eva_btadapter_g", btadapter_depth=2,
        qformer=QFormerConfig(hidden=16, num_layers=2, heads=2, intermediate=32,
                              encoder_width=32, num_query=4, vocab_size=64,
                              dtype=jnp.float32),
        llama=LlamaConfig(vocab_size=97, hidden=32, num_layers=2, heads=2,
                          intermediate=64, max_positions=256, dtype=jnp.float32),
        video_input="mean",
    )
    p = init_stllm(jax.random.PRNGKey(1), tiny)
    train, _ = partition_params(p, default_trainable())
    paths = {path_str(pp) for pp, _ in jax.tree_util.tree_leaves_with_path(train)}
    assert any(x.startswith("vit/btadapter") for x in paths)
    assert not any(x.startswith("vit/blocks") for x in paths)
    assert not any(x.startswith("vit/pos_embed") for x in paths)

    ids = jnp.zeros((1, 3), jnp.int32)
    mask = jnp.ones((1, 3), jnp.int32)
    out = encode_img(p, _frames(b=1).reshape(1, T, 28, 28, 3), tiny, ids, mask)
    assert out.shape == (1, T, tiny.num_query, tiny.llama.hidden)


def test_no_buffer_aliasing_with_trunk(params):
    """Regression (round 3): init_btadapter must COPY the last trunk blocks,
    not alias them — the trunk is frozen while the branch trains, so a
    shared buffer lands on both sides of the partitioned train state and
    fails jit donation ('attempt to donate the same buffer twice')."""
    trunk_ids = {id(l) for l in jax.tree_util.tree_leaves(
        params["blocks"][-2:])}
    branch_ids = {id(l) for l in jax.tree_util.tree_leaves(
        params["btadapter"]["spatial"])}
    assert not (trunk_ids & branch_ids)

    # and the donated train step actually runs with the branch trainable
    from stllm_tpu.train.step import (
        create_train_state, default_trainable, make_optimizer,
        make_train_step)
    from stllm_tpu.models.stllm import STLLMConfig
    from stllm_tpu.models.llama import LlamaConfig
    from stllm_tpu.models.qformer import QFormerConfig
    from stllm_tpu.models.stllm import init_stllm
    from stllm_tpu.data.packing import pack_training_batch

    cfg = STLLMConfig(
        vit_model="eva_btadapter_g", vit=CFG, btadapter_depth=2,
        qformer=QFormerConfig(hidden=32, num_layers=2, heads=4,
                              intermediate=64, encoder_width=CFG.width,
                              num_query=8, vocab_size=128,
                              dtype=jnp.float32),
        llama=LlamaConfig(vocab_size=256, hidden=64, num_layers=2, heads=4,
                          intermediate=128, max_positions=256,
                          dtype=jnp.float32),
        use_mask=False,
    )
    full = init_stllm(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(1e-3)
    state = create_train_state(full, opt, default_trainable())
    step = jax.jit(make_train_step(cfg, opt), donate_argnums=(0,))
    rng = np.random.default_rng(0)
    v = cfg.num_video_tokens(T)
    batch = pack_training_batch([[5]], [[8]], [[9, 10]], num_video=v,
                                seq_len=64, pad_id=0)
    batch = {k: jnp.asarray(x) for k, x in batch.items()}
    batch["frames"] = jnp.asarray(rng.normal(size=(1, T, 28, 28, 3)),
                                  jnp.float32)
    batch["qformer_input_ids"] = jnp.asarray(
        rng.integers(0, 128, (1, 6)), jnp.int32)
    batch["qformer_attention_mask"] = jnp.ones((1, 6), jnp.int32)
    state, metrics = step(state, batch)
    state, metrics = step(state, batch)  # donated re-entry
    assert np.isfinite(float(metrics["loss"]))


def test_single_frame_t1(params):
    """T=1 degenerates gracefully (temporal attention over one frame)."""
    out = btadapter_forward(params, _frames(t=1), CFG, num_frames=1)
    assert out.shape == (B, CFG.seq_len, CFG.width)
    assert np.isfinite(np.asarray(out)).all()


def test_convert_roundtrip():
    """Torch-style key dict -> converter -> params matching a manual build."""
    from stllm_tpu.convert.torch_to_jax import convert_btadapter

    rng = np.random.default_rng(0)
    d, depth = CFG.width, 2
    state = {}
    # trunk
    state["patch_embed.proj.weight"] = rng.normal(size=(d, 3, 14, 14)).astype(np.float32)
    state["patch_embed.proj.bias"] = rng.normal(size=(d,)).astype(np.float32)
    state["cls_token"] = rng.normal(size=(1, 1, d)).astype(np.float32)
    state["pos_embed"] = rng.normal(size=(1, CFG.seq_len, d)).astype(np.float32)
    for i in range(CFG.depth):
        pre = f"blocks.{i}"
        state[f"{pre}.norm1.weight"] = np.ones(d, np.float32)
        state[f"{pre}.norm1.bias"] = np.zeros(d, np.float32)
        state[f"{pre}.attn.qkv.weight"] = rng.normal(size=(3 * d, d)).astype(np.float32)
        state[f"{pre}.attn.q_bias"] = np.zeros(d, np.float32)
        state[f"{pre}.attn.v_bias"] = np.zeros(d, np.float32)
        state[f"{pre}.attn.proj.weight"] = rng.normal(size=(d, d)).astype(np.float32)
        state[f"{pre}.attn.proj.bias"] = np.zeros(d, np.float32)
        state[f"{pre}.norm2.weight"] = np.ones(d, np.float32)
        state[f"{pre}.norm2.bias"] = np.zeros(d, np.float32)
        state[f"{pre}.mlp.fc1.weight"] = rng.normal(size=(CFG.mlp_hidden, d)).astype(np.float32)
        state[f"{pre}.mlp.fc1.bias"] = np.zeros(CFG.mlp_hidden, np.float32)
        state[f"{pre}.mlp.fc2.weight"] = rng.normal(size=(d, CFG.mlp_hidden)).astype(np.float32)
        state[f"{pre}.mlp.fc2.bias"] = np.zeros(d, np.float32)
    # branch
    state["BTAdapter_cls"] = np.zeros((1, 1, d), np.float32)
    state["BTAdapter_position.weight"] = rng.normal(size=(64, d)).astype(np.float32)
    for i in range(depth):
        for pre, spatial in ((f"BTAdapter_T.{i}", False), (f"BTAdapter_S.{i}", True)):
            state[f"{pre}.norm1.weight"] = np.ones(d, np.float32)
            state[f"{pre}.norm1.bias"] = np.zeros(d, np.float32)
            state[f"{pre}.attn.qkv.weight"] = rng.normal(size=(3 * d, d)).astype(np.float32)
            state[f"{pre}.attn.q_bias"] = np.zeros(d, np.float32)
            state[f"{pre}.attn.v_bias"] = np.zeros(d, np.float32)
            state[f"{pre}.attn.proj.weight"] = rng.normal(size=(d, d)).astype(np.float32)
            state[f"{pre}.attn.proj.bias"] = np.zeros(d, np.float32)
            if spatial:
                state[f"{pre}.norm2.weight"] = np.ones(d, np.float32)
                state[f"{pre}.norm2.bias"] = np.zeros(d, np.float32)
                state[f"{pre}.mlp.fc1.weight"] = rng.normal(size=(CFG.mlp_hidden, d)).astype(np.float32)
                state[f"{pre}.mlp.fc1.bias"] = np.zeros(CFG.mlp_hidden, np.float32)
                state[f"{pre}.mlp.fc2.weight"] = rng.normal(size=(d, CFG.mlp_hidden)).astype(np.float32)
                state[f"{pre}.mlp.fc2.bias"] = np.zeros(d, np.float32)
            else:
                state[f"{pre}.temporal_fc.weight"] = np.zeros((d, d), np.float32)
                state[f"{pre}.temporal_fc.bias"] = np.zeros(d, np.float32)

    params = convert_btadapter(state, CFG, depth=depth, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(params["btadapter"]["temp"][0]["qkv"]["w"]),
        state["BTAdapter_T.0.attn.qkv.weight"].T,
    )
    out = btadapter_forward(params, _frames(), CFG, num_frames=T)
    assert out.shape == (B * T, CFG.seq_len, CFG.width)
    assert np.isfinite(np.asarray(out)).all()
