"""Data layer tests: IT datasets (prompt format, retry), collator bridge,
loader wrappers, and dataset -> loader -> collator -> forward integration."""

import zlib
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stllm_tpu.data.collate import TrainCollator, qformer_text_from_instruction
from stllm_tpu.data.datasets import ITImgTrainDataset, ITVidTrainDataset
from stllm_tpu.data.instruction_data import build_corpus
from stllm_tpu.data.loaders import (
    DataLoader,
    DevicePrefetcher,
    IterLoader,
    MetaLoader,
    MultiIterLoader,
)
from stllm_tpu.models.llama import LlamaConfig
from stllm_tpu.models.qformer import QFormerConfig
from stllm_tpu.models.stllm import STLLMConfig, init_stllm, stllm_forward
from stllm_tpu.models.vit import ViTConfig

TINY = STLLMConfig(
    vit=ViTConfig(image_size=28, patch_size=14, width=32, depth=2, heads=2,
                  mlp_hidden=64, dtype=jnp.float32, use_flash=False),
    qformer=QFormerConfig(hidden=16, num_layers=2, heads=2, intermediate=32,
                          encoder_width=32, num_query=4, vocab_size=64,
                          dtype=jnp.float32),
    llama=LlamaConfig(vocab_size=4096, hidden=32, num_layers=2, heads=2,
                      intermediate=64, max_positions=512, dtype=jnp.float32),
    video_input="residual",
    residual_size=2,
)


class ToyTokenizer:
    def __init__(self, vocab=4096):
        self.vocab = vocab

    def encode(self, text, add_special_tokens=False):
        ids = [1] if add_special_tokens else []
        ids += [10 + (zlib.crc32(w.encode()) % (self.vocab - 10))
                for w in text.split(" ")]
        return ids

    def decode(self, ids):
        return " ".join(str(i) for i in ids)


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("corpus")
    vids = root / "vids"
    vids.mkdir()
    for name in ("a.mp4", "b.mp4"):
        vw = cv2.VideoWriter(str(vids / name), cv2.VideoWriter_fourcc(*"mp4v"),
                             10, (48, 48))
        for i in range(30):
            vw.write(np.full((48, 48, 3), 20 + 5 * i, np.uint8))
        vw.release()
    anno = [
        {"video": "a.mp4",
         "QA": [{"i": "Watch carefully.", "q": "what color?", "a": "gray"}]},
        {"video": "b.mp4", "QA": [{"q": "count?", "a": "three"}],
         "start": 0.5, "end": 2.5},
        {"video": "missing.mp4", "QA": [{"q": "broken?", "a": "yes"}]},
    ]
    ann_path = root / "anno.json"
    ann_path.write_text(json.dumps(anno))
    return str(ann_path), str(vids)


def _resize28(frames):
    import cv2

    return np.stack([cv2.resize(f, (28, 28)) for f in frames]).astype(np.float32) / 255.0


def test_vid_dataset_prompt_format(corpus_dir):
    ann, vids = corpus_dir
    ds = ITVidTrainDataset([ann, vids, "video"], transform=_resize28,
                           num_frames=4, seed=0, random_shuffle=False)
    item = ds[0]
    assert item["image"].shape == (4, 28, 28, 3)
    # reference layout: instruction + ###Human: <Video><ImageHere></Video> q ###Assistant: "
    assert item["instruction_input"] == (
        "Watch carefully. ###Human: <Video><ImageHere></Video> what color? "
        "###Assistant: "
    )
    assert item["answer"] == "gray"


def test_vid_dataset_simple_mode(corpus_dir):
    ann, vids = corpus_dir
    ds = ITVidTrainDataset([ann, vids, "video"], transform=_resize28,
                           num_frames=4, seed=0, simple=True,
                           random_shuffle=False)
    item = ds[0]
    assert item["instruction_input"] == (
        "<ImageHere>###Human: Watch carefully. what color? ###Assistant: "
    )


def test_vid_dataset_retry_on_missing(corpus_dir):
    ann, vids = corpus_dir
    ds = ITVidTrainDataset([ann, vids, "video"], transform=_resize28,
                           num_frames=4, seed=3)
    item = ds[2]  # missing.mp4 -> random replacement
    assert item["image"].shape == (4, 28, 28, 3)


def test_clip_window(corpus_dir):
    ann, vids = corpus_dir
    ds = ITVidTrainDataset([ann, vids, "video"], transform=_resize28,
                           num_frames=4, seed=0, sample_type="middle")
    item = ds[1]  # has start/end 0.5..2.5 at 10fps -> frames 5..25
    assert item["image"].shape == (4, 28, 28, 3)


def test_qformer_text_extraction():
    ins = ("sys ###Human: <Video><ImageHere></Video> what is shown? "
           "###Assistant: ")
    assert qformer_text_from_instruction(ins) == \
        "<Video><ImageHere></Video> what is shown?"


def test_collator_shapes_and_masking(corpus_dir):
    ann, vids = corpus_dir
    ds = ITVidTrainDataset([ann, vids, "video"], transform=_resize28,
                           num_frames=4, seed=0, random_shuffle=False)
    coll = TrainCollator(TINY, ToyTokenizer(), qformer_tokenizer=ToyTokenizer(64),
                         seed=0)
    batch = coll([ds[0], ds[1]])
    v = TINY.num_video_tokens(4)
    assert batch["frames"].shape == (2, 4, 28, 28, 3)
    assert batch["token_ids"].shape[1] % 128 == 0
    assert "mvm_weight" in batch and batch["mvm_weight"].shape == (2, v)
    assert "qformer_input_ids" in batch
    # qformer_text_input mode: NO bos at slot 0 (reference: st_llm.py:521-531)
    assert batch["token_ids"][0, 0] != 1


def test_collator_bos_without_qformer_text(corpus_dir):
    ann, vids = corpus_dir
    ds = ITVidTrainDataset([ann, vids, "video"], transform=_resize28,
                           num_frames=4, seed=0, random_shuffle=False)
    cfg = STLLMConfig(**{**TINY.__dict__, "qformer_text_input": False,
                         "use_mask": False})
    coll = TrainCollator(cfg, ToyTokenizer(), seed=0)
    batch = coll([ds[0]])
    assert batch["token_ids"][0, 0] == 1  # bos
    assert "mvm_weight" not in batch


def test_end_to_end_forward(corpus_dir):
    ann, vids = corpus_dir
    ds = ITVidTrainDataset([ann, vids, "video"], transform=_resize28,
                           num_frames=4, seed=0)
    coll = TrainCollator(TINY, ToyTokenizer(64), qformer_tokenizer=ToyTokenizer(64),
                         seed=0)
    loader = DataLoader(ds, batch_size=2, collate_fn=coll, num_workers=2, seed=1)
    batch = next(iter(loader))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = init_stllm(jax.random.PRNGKey(0), TINY)
    out = stllm_forward(params, batch, TINY)
    assert np.isfinite(float(out["loss"]))
    assert "loss_mvm" in out


def test_dataloader_basics(corpus_dir):
    ann, vids = corpus_dir
    ds = ITVidTrainDataset([ann, vids, "video"], transform=_resize28,
                           num_frames=4, seed=0)
    loader = DataLoader(ds, batch_size=2, collate_fn=lambda s: s, seed=0)
    assert len(loader) == 1  # 3 samples, drop_last
    batches = list(loader)
    assert len(batches) == 1 and len(batches[0]) == 2


def test_meta_loader_schedule_deterministic():
    a = iter(lambda: "a", None)
    b = iter(lambda: "b", None)

    class FakeLoader:
        def __init__(self, tag, n):
            self.tag, self.n = tag, n

        def __len__(self):
            return self.n

        def __next__(self):
            return self.tag

    m1 = MetaLoader([FakeLoader("a", 3), FakeLoader("b", 2)], seed=7)
    m2 = MetaLoader([FakeLoader("a", 3), FakeLoader("b", 2)], seed=7)
    assert m1.iter_order == m2.iter_order  # same seed -> same schedule everywhere
    assert sorted(m1.iter_order) == [0, 0, 0, 1, 1]
    it = iter(m1)
    seq = [next(it) for _ in range(5)]
    assert sorted(seq) == ["a", "a", "a", "b", "b"]


def test_iter_loader_wraps():
    class TwoBatch:
        def __init__(self):
            self.epochs = []

        def set_epoch(self, e):
            self.epochs.append(e)

        def __iter__(self):
            return iter([1, 2])

        def __len__(self):
            return 2

    dl = TwoBatch()
    it = IterLoader(dl)
    got = [next(it) for _ in range(5)]
    assert got == [1, 2, 1, 2, 1]
    assert it.epoch == 2 and dl.epochs == [1, 2]


def test_multi_iter_loader_ratios():
    def inf(tag):
        while True:
            yield tag

    m = MultiIterLoader([inf("x"), inf("y")], ratios=[9, 1], seed=0)
    draws = [next(m) for _ in range(200)]
    assert draws.count("x") > 150


def test_loader_determinism(corpus_dir):
    """Same seeds -> byte-identical batches across loader instances, even
    with threaded workers (the schedule and every rng draw are seeded; the
    reference relied on cudnn.deterministic + a broadcast order instead)."""
    ann, vids = corpus_dir
    def build():
        ds = ITVidTrainDataset([ann, vids, "video"], transform=_resize28,
                               num_frames=4, seed=7, sample_type="middle",
                               random_shuffle=False)
        coll = TrainCollator(TINY, ToyTokenizer(), qformer_tokenizer=ToyTokenizer(64),
                             seed=7)
        return DataLoader(ds, batch_size=2, collate_fn=coll, num_workers=4, seed=7)

    b1 = next(iter(build()))
    b2 = next(iter(build()))
    for k in b1:
        np.testing.assert_array_equal(b1[k], b2[k])


def test_device_prefetcher():
    batches = [{"a": np.ones((2, 2))} for _ in range(3)]
    pf = DevicePrefetcher(batches)
    out = list(pf)
    assert len(out) == 3
    assert isinstance(out[0]["a"], jax.Array)


def test_corpus_registry_roots():
    corpus = build_corpus("/anno", "/data")
    assert len(corpus) == 37
    assert corpus["caption_webvid"] == [
        "/anno/video/caption/webvid/train.json", "/data/WebVid2M", "video"]
    assert corpus["vqa_gqa"] == ["/anno/image/vqa/gqa/train.json", "/data/m3it/gqa"]


def test_prompt_golden_strings(corpus_dir):
    """Byte-exact prompt strings for every process_qa branch (the prompt is
    protocol: it must match the reference's concatenation at
    image_video_itdatasets.py:223-250 exactly, incl. spacing)."""
    ds = ITVidTrainDataset(corpus_dir, transform=None, num_frames=2,
                           system="You are a helper. ", seed=0)
    # normal mode + instruction + second-message
    msg = " The video contains 2 frames sampled at 0.0, 1.0 seconds. "
    prompt, ans = ds.process_qa(
        [{"i": "Watch carefully.", "q": "what color?", "a": "gray"}], msg)
    assert prompt == (
        "You are a helper. Watch carefully. ###Human: "
        "<Video><ImageHere></Video> The video contains 2 frames sampled at "
        "0.0, 1.0 seconds. what color? ###Assistant: "
    )
    assert ans == "gray"
    # normal mode, no instruction, no msg
    prompt, _ = ds.process_qa([{"q": "count?", "a": "three"}])
    assert prompt == (
        "You are a helper. ###Human: <Video><ImageHere></Video> count? "
        "###Assistant: "
    )
    # simple mode inlines the instruction, drops media wrapper tokens,
    # and concatenates msg/question with NO space
    ds_simple = ITVidTrainDataset(corpus_dir, transform=None, num_frames=2,
                                  simple=True, seed=0)
    prompt, _ = ds_simple.process_qa(
        [{"i": "Describe.", "q": "what?", "a": "x"}], msg)
    assert prompt == (
        "<ImageHere>###Human: Describe.  The video contains 2 frames sampled "
        "at 0.0, 1.0 seconds.what? ###Assistant: "
    )
    # empty-string instruction behaves as absent (reference checks != "")
    prompt, _ = ds_simple.process_qa([{"i": "", "q": "what?", "a": "x"}])
    assert prompt == "<ImageHere>###Human: what? ###Assistant: "


def test_system_trailing_space_enforced(corpus_dir):
    with pytest.raises(ValueError):
        ITVidTrainDataset(corpus_dir, transform=None, system="no trailing space")
