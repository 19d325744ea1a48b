"""BaseTask: model/dataset construction + evaluation + multi-host result merge.

Re-design of the reference task base (reference: stllm/tasks/base_task.py):
the training inner loop lives in stllm_tpu.train.trainer (jitted step); what
remains here is the config-driven build surface and the distributed-eval
conventions — rank-sharded JSON results merged on the lead host
(base_task.py:248-286), with jax process index/count replacing torch.dist
ranks and a multihost barrier replacing dist.barrier().
"""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, Iterable, List, Optional

import jax

logger = logging.getLogger(__name__)


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return get_rank() == 0


def main_process(func):
    """Run only on the lead host (reference: stllm/common/dist_utils.py:110-117)."""
    import functools

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        if is_main_process():
            return func(*args, **kwargs)
        return None

    return wrapper


def barrier() -> None:
    if get_world_size() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("stllm_barrier")


class BaseTask:
    def __init__(self):
        self.inst_id_key = "instance_id"

    @classmethod
    def setup_task(cls, **kwargs):
        return cls()

    def build_model(self, cfg):
        from stllm_tpu.common.registry import Registry

        model_cfg = cfg.model_cfg
        model_cls = Registry.get_model_class(model_cfg["arch"])
        return model_cls.from_config(model_cfg)

    def build_datasets(self, cfg) -> Dict:
        raise NotImplementedError

    def valid_step(self, model, samples) -> List[Dict]:
        raise NotImplementedError

    def evaluation(self, model, data_loader, print_freq: int = 10) -> List[Dict]:
        """(reference: base_task.py:83-100)"""
        from stllm_tpu.common.logging import MetricLogger

        metric_logger = MetricLogger()
        results: List[Dict] = []
        for samples in metric_logger.log_every(data_loader, print_freq, "Evaluation"):
            results.extend(self.valid_step(model=model, samples=samples))
        barrier()
        return results

    @staticmethod
    def save_result(result: List[Dict], result_dir: str, filename: str,
                    remove_duplicate: str = "") -> str:
        """Rank-sharded JSON merge (reference: base_task.py:248-286)."""
        os.makedirs(result_dir, exist_ok=True)
        result_file = os.path.join(result_dir, f"{filename}_rank{get_rank()}.json")
        final_result_file = os.path.join(result_dir, f"{filename}.json")
        with open(result_file, "w") as f:
            json.dump(result, f)
        barrier()
        if is_main_process():
            logger.info("rank %d starts merging results.", get_rank())
            merged: List[Dict] = []
            for rank in range(get_world_size()):
                with open(os.path.join(result_dir,
                                       f"{filename}_rank{rank}.json")) as f:
                    merged += json.load(f)
            if remove_duplicate:
                seen, dedup = set(), []
                for res in merged:
                    if res[remove_duplicate] not in seen:
                        seen.add(res[remove_duplicate])
                        dedup.append(res)
                merged = dedup
            with open(final_result_file, "w") as f:
                json.dump(merged, f)
            logger.info("result file saved to %s", final_result_file)
        return final_result_file
