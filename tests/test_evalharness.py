"""Eval harness tests: MVBench dataset/infer/check_ans, VideoQA driver, GPT
judge harness (fake judge backend). Prompt layouts asserted against the
reference's flattened formats (mvbench_conversation.py get_prompt2)."""

import zlib
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stllm_tpu.conversation import CONV_instructblip_Vicuna0, Chat
from stllm_tpu.evalharness import (
    MVBenchDataset,
    check_ans,
    infer_mvbench,
    run_mvbench,
    run_videoqa,
)
from stllm_tpu.evalharness.gpt_eval import RUBRICS, evaluate
from stllm_tpu.evalharness.mvbench import ANSWER_PROMPT, SYSTEM, mvbench_prompt
from stllm_tpu.models.llama import LlamaConfig
from stllm_tpu.models.qformer import QFormerConfig
from stllm_tpu.models.stllm import STLLMConfig
from stllm_tpu.models.vit import ViTConfig

TINY = STLLMConfig(
    vit=ViTConfig(image_size=28, patch_size=14, width=32, depth=2, heads=2,
                  mlp_hidden=64, dtype=jnp.float32, use_flash=False),
    qformer=QFormerConfig(hidden=16, num_layers=2, heads=2, intermediate=32,
                          encoder_width=32, num_query=4, vocab_size=64,
                          dtype=jnp.float32),
    llama=LlamaConfig(vocab_size=4096, hidden=32, num_layers=2, heads=2,
                      intermediate=64, max_positions=2048, dtype=jnp.float32),
    video_input="residual",
    residual_size=2,
)


class ToyTokenizer:
    def __init__(self, vocab=4096):
        self.vocab = vocab
        self.rev = {}

    def encode(self, text, add_special_tokens=False):
        # crc32, NOT hash(): PYTHONHASHSEED salts hash() per process, so
        # every pytest run rolled different prompt ids — occasionally
        # landing on an fp32 near-tie where the batched-beam program
        # (different shape => different reduction order) tie-breaks
        # differently from the sequential one (round-5 flaky
        # test_run_videoqa_batched_matches_sequential)
        ids = [1] if add_special_tokens else []
        for w in text.split(" "):
            t = 10 + (zlib.crc32(w.encode()) % (self.vocab - 10))
            self.rev[t] = w
            ids.append(t)
        return ids

    def decode(self, ids):
        return " ".join(self.rev.get(int(t), "<unk>") for t in ids if t > 1)


@pytest.fixture(scope="module")
def chat():
    from stllm_tpu.models.stllm import init_stllm

    params = init_stllm(jax.random.PRNGKey(0), TINY)
    return Chat(params, TINY, ToyTokenizer(), qformer_tokenizer=ToyTokenizer(64),
                image_size=28)


@pytest.fixture(scope="module")
def bench_dir(tmp_path_factory):
    """Synthetic two-task MVBench layout: one mp4 task (with bounds), one
    frame-dir task."""
    import cv2

    root = tmp_path_factory.mktemp("mvb")
    anno = root / "json"
    anno.mkdir()
    media = root / "media"
    (media / "vids").mkdir(parents=True)
    (media / "frames" / "clip1").mkdir(parents=True)

    path = str(media / "vids" / "a.mp4")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 64))
    for i in range(50):
        vw.write(np.full((64, 64, 3), 20 + 4 * i, np.uint8))
    vw.release()
    for i in range(1, 13):  # frame task names 00001.jpg.. (first_idx=1)
        cv2.imwrite(str(media / "frames" / "clip1" / f"{i:05d}.jpg"),
                    np.full((64, 64, 3), 10 * i, np.uint8))

    (anno / "taskA.json").write_text(json.dumps([
        {"video": "a.mp4", "question": "what color?",
         "candidates": ["red", "green", "blue"], "answer": "green",
         "start": 1.0, "end": 4.0},
        {"video": "a.mp4", "question": "how many?",
         "candidates": ["one", "two"], "answer": "one",
         "start": 0.0, "end": 5.0},
    ]))
    (anno / "taskB.json").write_text(json.dumps([
        {"video": "clip1", "question": "what moves?",
         "candidates": ["cat", "dog"], "answer": "dog"},
    ]))
    data_list = {
        "Task A": ("taskA.json", "vids/", "video", True),
        "Task B": ("taskB.json", "frames/", "frame", False),
    }
    return str(anno), str(media), data_list


def test_dataset_items(bench_dir):
    anno, media, data_list = bench_dir
    ds = MVBenchDataset(anno, media, data_list, num_segments=4, resolution=28)
    assert len(ds) == 3
    item = ds[0]
    assert item["video"].shape == (4, 28, 28, 3)
    assert item["task_type"] == "Task A"
    assert item["question"].startswith("Question: what color?\nOptions:\n(A) red")
    assert item["answer"] == "(B) green"
    frame_item = ds[2]
    assert frame_item["video"].shape[1:] == (28, 28, 3)


def test_dataset_str_summary(bench_dir):
    """__str__ reproduces the reference's per-task summary + random-accuracy
    arithmetic verbatim, including its stray 1/options accounting
    (reference: mv_bench.py:86-108)."""
    anno, media, data_list = bench_dir
    ds = MVBenchDataset(anno, media, data_list, num_segments=4, resolution=28)
    s = str(ds)
    assert s.startswith("There are 3 videos as follow:")
    assert "for Task A" in s and "for Task B" in s
    # reference math on this fixture: Task A: 2 videos, 3+2=5 options;
    # Task B: 1 video, 2 options. correct = 2 + 1/5 + 1 + 1/2; total = 7.
    want = (2 + 1 / 5 + 1 + 1 / 2) / 7 * 100
    assert f"Total random accuracy: {want:.2f}%" in s


def test_qa_template_exact():
    q, a = MVBenchDataset.qa_template(
        {"question": "Q?", "candidates": ["x", "y"], "answer": "y"})
    assert q == "Question: Q?\nOptions:\n(A) x\n(B) y"
    assert a == "(B) y"


def test_mvbench_prompt_keeps_tail():
    p = mvbench_prompt(SYSTEM, "QTEXT", ANSWER_PROMPT)
    assert p.endswith("Assistant: Best option:(")  # no trailing sep
    assert "<Video><VideoHere></Video>\nQTEXT\n###" in p
    p2 = mvbench_prompt(SYSTEM, "QTEXT", None)
    assert p2.endswith("Assistant:")


def test_check_ans():
    assert check_ans("(b) green", "(B) green.")
    assert check_ans("(B)", "(b) green")
    assert not check_ans("(a) red", "(b) green")
    assert check_ans("b. something", "(b) green")


def test_infer_and_run(bench_dir, chat, tmp_path):
    anno, media, data_list = bench_dir
    ds = MVBenchDataset(anno, media, data_list, num_segments=4, resolution=28)
    pred = infer_mvbench(chat, ds[0], max_new_tokens=4)
    assert pred.startswith("(")
    result = run_mvbench(chat, ds, output_dir=str(tmp_path), output_name="r",
                         verbose=False)
    assert result["acc_dict"]["Task A"][1] == 2
    assert result["acc_dict"]["Task B"][1] == 1
    assert "Total Acc" in result["acc_dict"]
    assert os.path.exists(tmp_path / "r.json")


def test_batched_matches_sequential(bench_dir, chat, tmp_path):
    from stllm_tpu.evalharness.mvbench import infer_mvbench_batch

    anno, media, data_list = bench_dir
    ds = MVBenchDataset(anno, media, data_list, num_segments=4, resolution=28)
    samples = [ds[0], ds[1]]  # same frame count, different prompt lengths
    seq = [infer_mvbench(chat, s, max_new_tokens=6) for s in samples]
    batched = infer_mvbench_batch(chat, samples, max_new_tokens=6)
    assert batched == seq

    res = run_mvbench(chat, ds, output_dir=str(tmp_path), output_name="b",
                      verbose=False, batch_size=2)
    assert sum(v[1] for k, v in res["acc_dict"].items() if k != "Total Acc") == 3


def test_serving_matches_sequential(bench_dir, chat, tmp_path):
    """infer_mvbench_serving (continuous video-QA server) produces the
    SAME per-sample predictions as infer_mvbench, across mixed prompt
    lengths and both ask modes, with more samples than slots."""
    from stllm_tpu.evalharness.mvbench import infer_mvbench_serving

    anno, media, data_list = bench_dir
    ds = MVBenchDataset(anno, media, data_list, num_segments=4, resolution=28)
    samples = [ds[i] for i in range(3)]
    want = {s["question"]: infer_mvbench(chat, s, max_new_tokens=6)
            for s in samples}
    got = {ex["question"]: pred for ex, pred in infer_mvbench_serving(
        chat, samples, slots=2, max_len=256, chunk=4, max_new_tokens=6)}
    assert got == want

    # ask_simple layout (video first, BOS inside the trailing text)
    want_s = infer_mvbench(chat, ds[1], ask_simple=True, max_new_tokens=4)
    [(_, got_s)] = list(infer_mvbench_serving(
        chat, [ds[1]], slots=1, max_len=256, chunk=4, ask_simple=True,
        max_new_tokens=4))
    assert got_s == want_s

    res = run_mvbench(chat, ds, output_dir=str(tmp_path), output_name="s",
                      verbose=False, serving_slots=2, serving_max_len=256)
    assert sum(v[1] for k, v in res["acc_dict"].items()
               if k != "Total Acc") == 3


def test_serving_overlong_prompt_falls_back(bench_dir, chat):
    """A sample whose prompt exceeds serving_max_len runs through the
    per-sample path instead of aborting the whole eval; every sample still
    gets the same prediction as infer_mvbench."""
    from stllm_tpu.evalharness.mvbench import infer_mvbench_serving

    anno, media, data_list = bench_dir
    ds = MVBenchDataset(anno, media, data_list, num_segments=4, resolution=28)
    samples = [ds[i] for i in range(3)]
    want = {s["question"]: infer_mvbench(chat, s, max_new_tokens=6)
            for s in samples}
    # max_len too small for any prompt (video tokens alone exceed it):
    # everything falls back, nothing is lost, predictions unchanged
    got = {ex["question"]: pred for ex, pred in infer_mvbench_serving(
        chat, samples, slots=2, max_len=32, chunk=4, max_new_tokens=6)}
    assert got == want


def test_infer_simple_mode(bench_dir, chat):
    anno, media, data_list = bench_dir
    ds = MVBenchDataset(anno, media, data_list, num_segments=4, resolution=28)
    pred = infer_mvbench(chat, ds[1], ask_simple=True, max_new_tokens=4)
    assert isinstance(pred, str) and pred.startswith("(")


def test_run_videoqa(chat, tmp_path):
    import cv2

    vdir = tmp_path / "videos"
    vdir.mkdir()
    vw = cv2.VideoWriter(str(vdir / "v1.mp4"), cv2.VideoWriter_fourcc(*"mp4v"),
                         10, (64, 64))
    for i in range(30):
        vw.write(np.full((64, 64, 3), 30 + 5 * i, np.uint8))
    vw.release()
    gt = [{"video_name": "v1", "question_id": "q1",
           "question": "what is shown?", "answer": "a gradient"}]
    gt_file = tmp_path / "gt.json"
    gt_file.write_text(json.dumps(gt))

    out = run_videoqa(chat, CONV_instructblip_Vicuna0, str(gt_file), str(vdir),
                      str(tmp_path / "out"), "msvd", num_frames=4, num_beams=2,
                      verbose=False)
    assert len(out) == 1 and "pred" in out[0]
    saved = json.loads((tmp_path / "out" / "msvd.json").read_text())
    assert saved[0]["id"] == "q1"


def test_run_videoqa_batched_matches_sequential(chat, tmp_path):
    """--batch-videos: B videos' beams advance in one program with preds
    identical to the one-at-a-time protocol (3 samples over batch 2 also
    exercises the final partial flush)."""
    import cv2

    vdir = tmp_path / "videos"
    vdir.mkdir()
    for n, base in (("v1", 30), ("v2", 90), ("v3", 160)):
        vw = cv2.VideoWriter(str(vdir / f"{n}.mp4"),
                             cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 64))
        for i in range(30):
            vw.write(np.full((64, 64, 3), base + 2 * i, np.uint8))
        vw.release()
    gt = [{"video_name": f"v{i}", "question_id": f"q{i}",
           "question": q, "answer": "x"}
          for i, q in ((1, "what is shown?"), (2, "what changes over time?"),
                       (3, "describe the scene"))]
    gt_file = tmp_path / "gt.json"
    gt_file.write_text(json.dumps(gt))

    seq = run_videoqa(chat, CONV_instructblip_Vicuna0, str(gt_file),
                      str(vdir), str(tmp_path / "o1"), "seq", num_frames=4,
                      num_beams=2, verbose=False)
    bat = run_videoqa(chat, CONV_instructblip_Vicuna0, str(gt_file),
                      str(vdir), str(tmp_path / "o2"), "bat", num_frames=4,
                      num_beams=2, verbose=False, batch_videos=2)
    assert [r["pred"] for r in bat] == [r["pred"] for r in seq]
    assert [r["id"] for r in bat] == [r["id"] for r in seq]


def test_gpt_eval_fake_judge(tmp_path):
    preds = [{"id": "s1", "question": "q", "answer": "a", "pred": "a"},
             {"id": "s2", "question": "q2", "answer": "b", "pred": "wrong"}]
    pf = tmp_path / "preds.json"
    pf.write_text(json.dumps(preds))

    calls = []

    def fake_judge(messages):
        calls.append(messages)
        assert messages[0]["role"] == "system"
        return "{'pred': 'yes', 'score': 4}"

    res = evaluate("activitynet_qa", str(pf), str(tmp_path / "ann"), fake_judge)
    assert res == {"count": 2, "average_score": 4.0, "accuracy": 1.0,
                   "yes_count": 2, "no_count": 0}
    # resumable: second run skips all completed keys
    n = len(calls)
    evaluate("activitynet_qa", str(pf), str(tmp_path / "ann"), fake_judge)
    assert len(calls) == n


def test_gpt_eval_concurrent_retry(tmp_path):
    """Thread-pool fan-out keeps the reference's resumable retry-round
    semantics (evaluate_activitynet_qa.py:125-148): a sample whose judge
    call fails is retried on the next round, and no .tmp litter survives."""
    import threading

    preds = [{"id": f"s{i}", "question": "q", "answer": "a", "pred": "a"}
             for i in range(6)]
    pf = tmp_path / "preds.json"
    pf.write_text(json.dumps(preds))

    seen_threads = set()
    failed_once = []
    lock = threading.Lock()

    def flaky_judge(messages):
        with lock:
            seen_threads.add(threading.get_ident())
            if not failed_once:
                failed_once.append(True)
                raise RuntimeError("transient judge error")
        return "{'pred': 'yes', 'score': 5}"

    res = evaluate("activitynet_qa", str(pf), str(tmp_path / "ann"),
                   flaky_judge, workers=4)
    assert res["count"] == 6 and res["accuracy"] == 1.0
    leftovers = [f for f in os.listdir(tmp_path / "ann") if f.endswith(".tmp")]
    assert leftovers == []
    assert len(seen_threads) >= 1  # fan-out path exercised


def test_rubric_prompts_match_reference_text():
    r = RUBRICS["correctness"]
    assert "factually consistent" in r.system
    user = r.user_template({"q": "Q", "a": "A", "pred": "P"})
    assert "Question: Q\n" in user and user.endswith("{''score': 4.8}.")
    c = RUBRICS["consistency"].user_template(
        {"q1": "1", "q2": "2", "a": "A", "pred1": "x", "pred2": "y"})
    assert "Predicted Answer to Question 2: y" in c
    assert len(RUBRICS) == 6
