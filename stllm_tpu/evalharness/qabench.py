"""Open-ended VideoQA + VideoChatGPT-Bench inference drivers.

Port of the reference scripts (reference: stllm/test/qabench/{msvd,msrvtt,
activitynet}_qa.py:94-123, stllm/test/vcgbench/videochatgpt_benchmark_
general.py:86-120 and _consist.py:90-120): per-sample Chat.upload_video with
the question as Q-Former text, beam-5 greedy answers, JSON prediction dumps
consumed by the GPT judges (gpt_eval.py).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

VIDEO_FORMATS = [".mp4", ".avi", ".mov", ".mkv"]


def _find_video(video_dir: str, name: str) -> Optional[str]:
    cand = os.path.join(video_dir, name)
    if os.path.splitext(name)[1]:
        return cand if os.path.exists(cand) else None
    for fmt in VIDEO_FORMATS:
        p = cand + fmt
        if os.path.exists(p):
            return p
    return None


def _answer(chat, conv_template, video_path: str, question: str,
            num_frames: int, system: bool, num_beams: int = 5,
            max_new_tokens: int = 300) -> str:
    conv = conv_template.copy()
    img_list: List = []
    chat.upload_video(video_path, conv, img_list, num_frames, question)
    chat.ask(question, conv)
    text, _ = chat.answer(
        conv=conv, img_list=img_list, num_beams=num_beams, do_sample=False,
        temperature=1.0, system=system, max_new_tokens=max_new_tokens,
        max_length=2000,
    )
    return text


def run_videoqa(
    chat,
    conv_template,
    gt_file: str,
    video_dir: str,
    output_dir: str,
    output_name: str,
    num_frames: int = 64,
    num_beams: int = 5,
    verbose: bool = True,
) -> List[Dict]:
    """MSVD/MSRVTT/ActivityNet zero-shot QA: dump {id, question, answer, pred}
    (reference: msvd_qa.py:94-123; answer() called with system=False)."""
    with open(gt_file) as f:
        gt = json.load(f)
    os.makedirs(output_dir, exist_ok=True)
    out: List[Dict] = []
    for sample in gt:
        video_name = sample.get("video_name", sample.get("video"))
        qid = sample.get("question_id", sample.get("id"))
        question = sample["question"]
        rec = {"id": qid, "question": question, "answer": sample["answer"]}
        path = _find_video(video_dir, video_name)
        if path is None:
            if verbose:
                print(f"missing video {video_name}, skipped")
            continue
        rec["pred"] = _answer(chat, conv_template, path, question, num_frames,
                              system=False, num_beams=num_beams)
        out.append(rec)
        if verbose:
            print(f"[{len(out)}/{len(gt)}] {qid}: {rec['pred']!r}")
    with open(os.path.join(output_dir, f"{output_name}.json"), "w") as f:
        json.dump(out, f)
    return out


def run_vcgbench_general(
    chat,
    conv_template,
    gt_file: str,
    video_dir: str,
    output_dir: str,
    output_name: str,
    num_frames: int = 64,
    num_beams: int = 5,
    verbose: bool = True,
) -> List[Dict]:
    """Single-question VCG bench (generic/detail/context/temporal inference;
    reference: videochatgpt_benchmark_general.py:86-120; system prompt kept)."""
    with open(gt_file) as f:
        gt = json.load(f)
    os.makedirs(output_dir, exist_ok=True)
    out: List[Dict] = []
    for sample in gt:
        rec = dict(sample)
        path = _find_video(video_dir, sample["video_name"])
        if path is None:
            if verbose:
                print(f"missing video {sample['video_name']}, skipped")
            continue
        rec["pred"] = _answer(chat, conv_template, path, sample["Q"],
                              num_frames, system=True, num_beams=num_beams)
        out.append(rec)
        if verbose:
            print(f"[{len(out)}/{len(gt)}] {rec['pred']!r}")
    with open(os.path.join(output_dir, f"{output_name}.json"), "w") as f:
        json.dump(out, f)
    return out


def run_vcgbench_consistency(
    chat,
    conv_template,
    gt_file: str,
    video_dir: str,
    output_dir: str,
    output_name: str,
    num_frames: int = 64,
    num_beams: int = 5,
    verbose: bool = True,
) -> List[Dict]:
    """Q1/Q2 consistency pairs -> pred1/pred2
    (reference: videochatgpt_benchmark_consist.py:90-120)."""
    with open(gt_file) as f:
        gt = json.load(f)
    os.makedirs(output_dir, exist_ok=True)
    out: List[Dict] = []
    for sample in gt:
        rec = dict(sample)
        path = _find_video(video_dir, sample["video_name"])
        if path is None:
            continue
        for i, q in enumerate((sample["Q1"], sample["Q2"]), start=1):
            rec[f"pred{i}"] = _answer(chat, conv_template, path, q, num_frames,
                                      system=True, num_beams=num_beams)
        out.append(rec)
        if verbose:
            print(f"[{len(out)}/{len(gt)}] consist pair done")
    with open(os.path.join(output_dir, f"{output_name}.json"), "w") as f:
        json.dump(out, f)
    return out
