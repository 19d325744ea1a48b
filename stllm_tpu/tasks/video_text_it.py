"""Instruction-tuning tasks (reference: stllm/tasks/image_text_pretrain.py).

``video_text_it`` builds ITImg/ITVid datasets straight from available_corpus +
per-dataset config; ``simple`` prompt mode tracks qformer_text_input
(reference: image_text_pretrain.py:40-47).
"""

from __future__ import annotations

from typing import Dict

from stllm_tpu.common.registry import Registry
from stllm_tpu.tasks.base_task import BaseTask


def get_media_type(dataset_info) -> str:
    return "video" if len(dataset_info) == 3 and dataset_info[2] == "video" else "image"


@Registry.register_task("image_text_pretrain")
class ImageTextPretrainTask(BaseTask):
    def evaluation(self, model, data_loader, **kwargs):  # noqa: D102
        # no-op evaluation (reference: image_text_pretrain.py:13-19)
        return []


@Registry.register_task("video_text_it")
class VideoTextItTask(ImageTextPretrainTask):
    def build_datasets(self, cfg, transform=None, seed: int = 42) -> Dict:
        """{name: {'train': dataset}} (reference: image_text_pretrain.py:26-49)."""
        from stllm_tpu.data.datasets import ITImgTrainDataset, ITVidTrainDataset
        from stllm_tpu.data.instruction_data import available_corpus

        datasets: Dict = {}
        datasets_config = cfg.datasets_cfg
        assert len(datasets_config) > 0, "At least one dataset has to be specified."
        simple = cfg.model_cfg.get("qformer_text_input", False)
        for name in datasets_config:
            dataset_config = dict(datasets_config[name] or {})
            dataset_info = available_corpus[name]
            cls = (ITImgTrainDataset if get_media_type(dataset_info) == "image"
                   else ITVidTrainDataset)
            datasets[name] = {"train": cls(
                ann_file=dataset_info, simple=simple, transform=transform,
                seed=seed, **dataset_config)}
        return datasets
