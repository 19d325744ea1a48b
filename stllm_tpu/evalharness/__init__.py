"""Eval harness: MVBench, open-ended VideoQA, VCG-Bench, GPT judges."""

from stllm_tpu.evalharness.mvbench import (
    DATA_LIST,
    MVBenchDataset,
    check_ans,
    infer_mvbench,
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
    "check_ans",
    "infer_mvbench",
    "run_mvbench",
    "run_vcgbench_consistency",
    "run_vcgbench_general",
    "run_videoqa",
]
