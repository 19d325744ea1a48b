"""Tasks layer + wds pipeline + length-grouped sampler tests."""

import io
import json
import os
import tarfile

import numpy as np
import pytest

import stllm_tpu.models.zoo  # noqa: F401
from stllm_tpu.common.config import Config
from stllm_tpu.data.samplers_grouped import (
    LengthGroupedSampler,
    get_modality_length_grouped_indices,
    split_to_even_chunks,
)
from stllm_tpu.data.wds import (
    WebDatasetPipeline,
    cc_sbu_map,
    expand_shards,
    laion_map,
    tar_samples,
)
from stllm_tpu.tasks import setup_task
from stllm_tpu.tasks.base_task import BaseTask, main_process


def test_setup_task():
    cfg = Config(cfg_dict={"run": {"task": "video_text_it"},
                           "model": {}, "datasets": {}})
    task = setup_task(cfg)
    assert type(task).__name__ == "VideoTextItTask"


def test_task_build_datasets(tmp_path, monkeypatch):
    import cv2

    vids = tmp_path / "vids"
    vids.mkdir()
    vw = cv2.VideoWriter(str(vids / "a.mp4"), cv2.VideoWriter_fourcc(*"mp4v"),
                         10, (32, 32))
    for i in range(20):
        vw.write(np.full((32, 32, 3), 10 * i, np.uint8))
    vw.release()
    ann = tmp_path / "anno.json"
    ann.write_text(json.dumps([{"video": "a.mp4",
                                "QA": [{"q": "?", "a": "a"}]}]))
    import stllm_tpu.data.instruction_data as idata

    monkeypatch.setitem(idata.available_corpus, "test_corpus",
                        [str(ann), str(vids), "video"])
    cfg = Config(cfg_dict={
        "run": {"task": "video_text_it"},
        "model": {"qformer_text_input": True},
        "datasets": {"test_corpus": {"num_frames": 4}},
    })
    task = setup_task(cfg)
    ds = task.build_datasets(cfg)
    assert "test_corpus" in ds
    item = ds["test_corpus"]["train"][0]
    assert item["image"].shape[0] == 4
    assert item["instruction_input"].startswith("<ImageHere>")  # simple mode


def test_save_result_merge(tmp_path):
    out = BaseTask.save_result(
        [{"id": 1}, {"id": 1}, {"id": 2}], str(tmp_path), "res",
        remove_duplicate="id")
    merged = json.loads(open(out).read())
    assert merged == [{"id": 1}, {"id": 2}]


def test_main_process_decorator():
    calls = []

    @main_process
    def fn(x):
        calls.append(x)
        return x

    assert fn(3) == 3 and calls == [3]


# ---------------------------------------------------------------------------
# wds
# ---------------------------------------------------------------------------

def _make_shard(path, n, with_json):
    import cv2

    with tarfile.open(path, "w") as tf:
        for i in range(n):
            img = np.full((16, 16, 3), 10 * i, np.uint8)
            ok, enc = cv2.imencode(".jpg", img)
            data = enc.tobytes()
            ti = tarfile.TarInfo(f"{i:05d}.jpg")
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))
            if with_json:
                meta = json.dumps({"caption": f"cap {i}"}).encode()
                ti = tarfile.TarInfo(f"{i:05d}.json")
                ti.size = len(meta)
                tf.addfile(ti, io.BytesIO(meta))
            else:
                txt = f"text {i}".encode()
                ti = tarfile.TarInfo(f"{i:05d}.txt")
                ti.size = len(txt)
                tf.addfile(ti, io.BytesIO(txt))


def test_expand_shards():
    assert expand_shards("s-{0000..0002}.tar") == [
        "s-0000.tar", "s-0001.tar", "s-0002.tar"]
    assert expand_shards(["a", "b"]) == ["a", "b"]


def test_tar_samples_and_pipelines(tmp_path):
    cc = str(tmp_path / "cc-0000.tar")
    la = str(tmp_path / "laion-0000.tar")
    _make_shard(cc, 5, with_json=True)
    _make_shard(la, 5, with_json=False)

    samples = list(tar_samples(cc))
    assert len(samples) == 5 and "jpg" in samples[0] and "json" in samples[0]

    pipe = WebDatasetPipeline(cc, cc_sbu_map(), shuffle_buffer=2, resample=False)
    out = list(pipe)
    assert len(out) == 5
    assert out[0]["instruction_input"] == "<ImageHere> "
    assert any(o["answer"].startswith("cap") for o in out)

    pipe2 = WebDatasetPipeline(la, laion_map(), shuffle_buffer=1, resample=False)
    first = next(iter(pipe2))
    assert first["answer"].startswith("text")
    assert first["image"].shape == (16, 16, 3)


def test_resampled_infinite(tmp_path):
    cc = str(tmp_path / "cc-0000.tar")
    _make_shard(cc, 3, with_json=True)
    pipe = iter(WebDatasetPipeline(cc, cc_sbu_map(), shuffle_buffer=1,
                                   resample=True, seed=0))
    got = [next(pipe) for _ in range(7)]  # > one shard's worth
    assert len(got) == 7


# ---------------------------------------------------------------------------
# length-grouped sampler
# ---------------------------------------------------------------------------

def test_split_to_even_chunks():
    # caller pre-sorts indices by descending length (stllm_trainer.py:100)
    chunks = split_to_even_chunks([0, 3, 1, 2], [10, 1, 1, 10], 2)
    assert sorted(len(c) for c in chunks) == [2, 2]
    sums = sorted(sum([10, 1, 1, 10][i] for i in c) for c in chunks)
    assert sums == [11, 11]


def test_modality_grouped_megabatches():
    lengths = [5, 6, 7, 8, -5, -6, -7, -8]  # 4 multimodal, 4 language
    idx = get_modality_length_grouped_indices(lengths, batch_size=2,
                                              world_size=2,
                                              rng=np.random.default_rng(0))
    assert sorted(idx) == list(range(8))
    # each megabatch (4 indices) is single-modality
    for i in range(0, 8, 4):
        signs = {lengths[j] > 0 for j in idx[i:i + 4]}
        assert len(signs) == 1


def test_sampler_iterates_all():
    s = LengthGroupedSampler(2, 2, [3, 1, 2, 8, 5, 4, 7, 6], seed=0)
    assert sorted(s) == list(range(8))
