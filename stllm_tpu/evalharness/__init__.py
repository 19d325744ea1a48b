"""Eval harness: MVBench, open-ended VideoQA, VCG-Bench, GPT judges."""

from stllm_tpu.evalharness.gpt_eval import RUBRICS, evaluate as gpt_evaluate
from stllm_tpu.evalharness.mvbench import (
    DATA_LIST,
    MVBenchDataset,
    check_ans,
    infer_mvbench,
    infer_mvbench_batch,
    run_mvbench,
)
from stllm_tpu.evalharness.qabench import (
    run_vcgbench_consistency,
    run_vcgbench_general,
    run_videoqa,
)

__all__ = [
    "DATA_LIST",
    "MVBenchDataset",
    "RUBRICS",
    "check_ans",
    "gpt_evaluate",
    "infer_mvbench",
    "infer_mvbench_batch",
    "run_mvbench",
    "run_vcgbench_consistency",
    "run_vcgbench_general",
    "run_videoqa",
]
