"""Misc parity-surface tests: runner_base, randaugment, io utils, ModelZoo,
EasyDict."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import stllm_tpu.models  # noqa: F401
import stllm_tpu.runners  # noqa: F401
from stllm_tpu.common.config import Config
from stllm_tpu.common.io_utils import (
    is_url,
    load_json,
    now,
    save_json,
    save_pickle,
    load_pickle,
)
from stllm_tpu.common.registry import Registry
from stllm_tpu.conversation import EasyDict
from stllm_tpu.data.randaugment import OPS, RandomAugment, VideoRandomAugment


def test_easydict():
    d = EasyDict({"a": 1})
    assert d.a == 1
    d.b = 2
    assert d["b"] == 2
    with pytest.raises(AttributeError):
        d.missing


def test_model_zoo_table():
    from stllm_tpu.models import model_zoo

    s = str(model_zoo)
    assert "st_llm_hf" in s and "instructblip_vicuna0" in s


def test_io_utils(tmp_path):
    assert is_url("https://x.com/a.pth") and not is_url("/local/path")
    assert len(now()) == 11
    p = tmp_path / "a" / "b.json"
    save_json({"x": 1}, str(p))
    assert load_json(str(p)) == {"x": 1}
    pk = tmp_path / "c.pkl"
    save_pickle([1, 2], str(pk))
    assert load_pickle(str(pk)) == [1, 2]


def test_randaugment_ops():
    img = np.random.default_rng(0).integers(0, 256, (32, 32, 3)).astype(np.uint8)
    for name, (fn, rng_) in OPS.items():
        lo, hi = rng_
        out = fn(img, (lo + hi) / 2 if hi else 0)
        assert out.shape == img.shape and out.dtype == np.uint8, name
    aug = RandomAugment(n=2, m=9, seed=0)
    assert aug(img).shape == img.shape
    clip = np.stack([img] * 3)
    vout = VideoRandomAugment(n=2, m=5, seed=0)(clip)
    assert vout.shape == clip.shape
    # same ops across frames: all frames transformed identically
    assert np.array_equal(vout[0], vout[1])


def test_runner_base_registered_and_trains(tmp_path):
    from stllm_tpu.data.packing import pack_training_batch
    from stllm_tpu.models.zoo import STLLM

    cfg_dict = {
        "model": {
            "arch": "st_llm_hf", "model_type": "instructblip_vicuna0",
            "dtype": "fp32", "use_mask": False,
            "vit": {"image_size": 28, "patch_size": 14, "width": 32,
                    "depth": 2, "heads": 2, "mlp_hidden": 64,
                    "use_flash": False},
            "qformer": {"hidden": 16, "num_layers": 2, "heads": 2,
                        "intermediate": 32, "encoder_width": 32,
                        "num_query": 4, "vocab_size": 64},
            "llama": {"vocab_size": 97, "hidden": 32, "num_layers": 2,
                      "heads": 2, "intermediate": 64, "max_positions": 256},
        },
        "run": {"task": "video_text_it", "max_epoch": 1, "iters_per_epoch": 2,
                "batch_size_train": 2, "init_lr": 1e-3,
                "output_dir": str(tmp_path)},
        "datasets": {},
    }
    cfg = Config(cfg_dict=cfg_dict)
    model = STLLM.from_config(cfg.model_cfg)

    class FakeDataset:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            return i

    runner_cls = Registry.get_runner_class("runner_base")
    runner = runner_cls(cfg, task=None, model=model,
                        datasets={"d": {"train": FakeDataset()}})

    rng = np.random.default_rng(0)
    v = model.cfg.num_video_tokens(4)

    def collate(samples):
        b = len(samples)
        batch = pack_training_batch([[5, 6]] * b, [[8]] * b, [[11, 12]] * b,
                                    num_video=v, seq_len=32, pad_id=0)
        batch["frames"] = rng.normal(size=(b, 4, 28, 28, 3)).astype(np.float32)
        batch["qformer_input_ids"] = rng.integers(0, 64, (b, 5)).astype(np.int32)
        batch["qformer_attention_mask"] = np.ones((b, 5), np.int32)
        return batch

    stats = runner.train(collate_fn=collate)
    assert np.isfinite(stats["loss"])
    assert runner.trainer.ckpt.latest_step() == 2
