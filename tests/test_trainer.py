"""Trainer + orbax checkpoint tests: loop runs, stats logged, save/resume
roundtrip restores step/params/optimizer state exactly."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stllm_tpu.data.packing import pack_training_batch
from stllm_tpu.models.llama import LlamaConfig
from stllm_tpu.models.qformer import QFormerConfig
from stllm_tpu.models.stllm import STLLMConfig, init_stllm
from stllm_tpu.models.vit import ViTConfig
from stllm_tpu.train.checkpoint import CheckpointManager, flatten_tree
from stllm_tpu.train.trainer import Trainer

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
    use_mask=False,
)
B, T = 2, 4


def _loader():
    rng = np.random.default_rng(0)
    v = TINY.num_video_tokens(T)
    batch = pack_training_batch([[5, 6]] * B, [[8]] * B, [[11, 12]] * B,
                                num_video=v, seq_len=32, pad_id=0)
    batch["frames"] = rng.normal(size=(B, T, 28, 28, 3)).astype(np.float32)
    batch["qformer_input_ids"] = rng.integers(0, 64, (B, 5)).astype(np.int32)
    batch["qformer_attention_mask"] = np.ones((B, 5), np.int32)
    while True:
        yield batch


def test_train_loop_and_logs(tmp_path):
    params = init_stllm(jax.random.PRNGKey(0), TINY)
    tr = Trainer(TINY, params, output_dir=str(tmp_path), learning_rate=1e-3,
                 log_freq=2, save_freq=100)
    avgs = tr.train(_loader(), max_steps=4)
    assert np.isfinite(avgs["loss"])
    lines = [json.loads(l) for l in (tmp_path / "log.txt").read_text().splitlines()]
    assert lines[-1]["step"] == 4 and "loss" in lines[-1]


def test_checkpoint_roundtrip(tmp_path):
    params = init_stllm(jax.random.PRNGKey(0), TINY)
    tr = Trainer(TINY, params, output_dir=str(tmp_path), learning_rate=1e-3,
                 save_freq=2, log_freq=100)
    tr.train(_loader(), max_steps=2)
    assert tr.ckpt.latest_step() == 2
    saved = {k: np.asarray(v) for k, v in flatten_tree(tr.state.params).items()}

    # fresh trainer resumes and matches
    params2 = init_stllm(jax.random.PRNGKey(1), TINY)  # different init
    tr2 = Trainer(TINY, params2, output_dir=str(tmp_path), learning_rate=1e-3)
    step = tr2.resume_if_available()
    assert step == 2
    for k, v in flatten_tree(tr2.state.params).items():
        np.testing.assert_array_equal(np.asarray(v), saved[k])
    # optimizer state restored too (adam moments non-zero after 2 steps)
    m = [np.abs(np.asarray(x)).sum()
         for x in jax.tree_util.tree_leaves(tr2.state.opt_state)]
    assert sum(m) > 0


def test_eval_best_checkpoint(tmp_path):
    params = init_stllm(jax.random.PRNGKey(0), TINY)
    tr = Trainer(TINY, params, output_dir=str(tmp_path), learning_rate=1e-3,
                 save_freq=100, log_freq=100)
    metrics = iter([1.0, 3.0, 2.0])
    calls = []

    def eval_fn():
        m = next(metrics)
        calls.append(m)
        return m

    tr.train(_loader(), max_steps=4, eval_fn=eval_fn, eval_freq=2)
    assert calls == [1.0, 3.0]  # step 2 and step 4 (no duplicate final eval)
    best = json.loads((tmp_path / "best.json").read_text())
    assert best["metric"] == 3.0 and best["step"] == 4
    # a non-aligned max_steps still gets the final eval
    tr2 = Trainer(TINY, init_stllm(jax.random.PRNGKey(1), TINY),
                  output_dir=str(tmp_path / "b"), learning_rate=1e-3,
                  save_freq=100, log_freq=100)
    calls2 = []
    tr2.train(_loader(), max_steps=3, eval_fn=lambda: calls2.append(1) or 1.0,
              eval_freq=2)
    assert len(calls2) == 2  # step 2 + final step 3


def test_resume_continues_training(tmp_path):
    params = init_stllm(jax.random.PRNGKey(0), TINY)
    tr = Trainer(TINY, params, output_dir=str(tmp_path), learning_rate=1e-3,
                 save_freq=2, log_freq=100)
    tr.train(_loader(), max_steps=2)
    tr2 = Trainer(TINY, init_stllm(jax.random.PRNGKey(2), TINY),
                  output_dir=str(tmp_path), learning_rate=1e-3)
    tr2.resume_if_available()
    avgs = tr2.train(_loader(), max_steps=4)  # continues 2 -> 4
    assert int(tr2.state.step) == 4
    assert np.isfinite(avgs["loss"])
