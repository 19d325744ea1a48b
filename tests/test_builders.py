"""Builder + PT dataset + gradcam tests."""

import io
import json
import tarfile

import numpy as np
import pytest

import stllm_tpu.data  # noqa: F401
from stllm_tpu.common.gradcam import get_att_map
from stllm_tpu.common.registry import Registry
from stllm_tpu.data.builders import BaseDatasetBuilder
from stllm_tpu.data.datasets import PTImgTrainDataset, PTVidTrainDataset, pre_text


def _shard(path, n=4):
    import cv2

    with tarfile.open(path, "w") as tf:
        for i in range(n):
            ok, enc = cv2.imencode(".jpg", np.full((16, 16, 3), 20 * i, np.uint8))
            data = enc.tobytes()
            ti = tarfile.TarInfo(f"{i:05d}.jpg")
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))
            meta = json.dumps({"caption": f"Caption {i}!"}).encode()
            ti = tarfile.TarInfo(f"{i:05d}.json")
            ti.size = len(meta)
            tf.addfile(ti, io.BytesIO(meta))


def test_cc_sbu_builder(tmp_path):
    import stllm_tpu.data.builders  # noqa: F401

    shard = str(tmp_path / "cc-00000.tar")
    _shard(shard)
    builder_cls = Registry.get_builder_class("cc_sbu")
    assert issubclass(builder_cls, BaseDatasetBuilder)
    from stllm_tpu.common.config import wrap

    cfg = wrap({
        "build_info": {"storage": shard},
        "vis_processor": {"train": {"name": "blip2_image_eval",
                                    "image_size": 16}},
        "text_processor": {"train": {"name": "blip_caption"}},
    })
    ds = builder_cls(cfg).build_datasets()
    sample = next(iter(ds["train"]))
    assert sample["image"].shape == (16, 16, 3)
    assert sample["answer"].startswith("caption")  # blip_caption lowercases


def test_builder_default_yaml_loads():
    import stllm_tpu.data.builders  # noqa: F401

    for name in ("cc_sbu", "laion", "cc_sbu_align"):
        b = Registry.get_builder_class(name)()
        assert "storage" in b.config["build_info"]


def test_pre_text():
    assert pre_text("A Dog, running!") == "a dog running"
    assert pre_text("Keep AS-IS", pre=False) == "Keep AS-IS"


def test_pt_datasets(tmp_path):
    import cv2

    d = tmp_path / "media"
    d.mkdir()
    cv2.imwrite(str(d / "img.jpg"), np.full((16, 16, 3), 128, np.uint8))
    vw = cv2.VideoWriter(str(d / "v.mp4"), cv2.VideoWriter_fourcc(*"mp4v"),
                         10, (16, 16))
    for i in range(12):
        vw.write(np.full((16, 16, 3), 20 * i, np.uint8))
    vw.release()
    (tmp_path / "img_anno.json").write_text(json.dumps(
        [{"image": "img.jpg", "caption": "A Cat."}]))
    (tmp_path / "vid_anno.json").write_text(json.dumps(
        [{"video": "v.mp4", "caption": "Some Video."}]))

    ds = PTImgTrainDataset([str(tmp_path / "img_anno.json"), str(d)], seed=0)
    img, cap, idx = ds[0]
    assert cap == "a cat" and img.shape == (16, 16, 3)

    vds = PTVidTrainDataset([str(tmp_path / "vid_anno.json"), str(d), "video"],
                            num_frames=4, seed=0)
    frames, cap, idx = vds[0]
    assert frames.shape == (4, 16, 16, 3) and cap == "some video"


def test_gradcam_overlay():
    img = np.random.default_rng(0).random((32, 40, 3)).astype(np.float32)
    att = np.random.default_rng(1).random((8, 10)).astype(np.float32)
    out = get_att_map(img, att)
    assert out.shape == (32, 40, 3)
    assert 0.0 <= out.min() and out.max() <= 1.0 + 1e-6
