"""Training entry point (reference: stllm/train/train_hf.py — the primary
deepspeed path — and stllm/train/train.py — the LAVIS runner path — collapsed
into one config-driven CLI).

Usage:
  python -m stllm_tpu.train.train --cfg-path config/instructblipbase_stllm_qa.yaml
  python -m stllm_tpu.train.train --cfg-path config/tiny_debug.yaml \
      --synthetic-data 8   # offline smoke run with synthetic media

The `run:` section keeps the reference's HF-style keys (learning_rate,
num_train_epochs, per_device_train_batch_size, gradient_accumulation_steps,
warmup_ratio, logging_steps, save_steps, output_dir...).
"""

from __future__ import annotations

import argparse
import logging
import math

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg-path", required=True)
    p.add_argument("--options", nargs="+", default=None)
    p.add_argument("--max-steps", type=int, default=None,
                   help="override computed step count")
    p.add_argument("--synthetic-data", type=int, default=0,
                   help="use N synthetic videos instead of the corpus (smoke runs)")
    p.add_argument("--data-parallel", type=int, default=None)
    p.add_argument("--model-parallel", type=int, default=1)
    p.add_argument("--cpu", action="store_true")
    return p.parse_args()


def build_datasets(cfg, run_cfg, synthetic: int, tmp_dir: str = "/tmp/stllm_synth"):
    """Build IT datasets from the corpus registry, or a synthetic stand-in."""
    from stllm_tpu.data.datasets import ITVidTrainDataset

    num_frames = int(run_cfg.get("num_frames", 16))
    image_size = int(run_cfg.get("image_size", 224))

    # reference train_transform = RandomResizedCrop(224, .5-1) + normalize
    # (instruction_data.py:8-19); here the crop stays uint8 on the host and
    # CLIP normalization happens on device inside encode_img
    from stllm_tpu.data.processors import random_resized_crop

    rrc_rng = np.random.default_rng(int(run_cfg.get("seed", 42)))

    def transform(frames):
        return random_resized_crop(rrc_rng, frames, image_size).astype(np.uint8)

    if synthetic:
        import json
        import os

        import cv2

        os.makedirs(f"{tmp_dir}/vids", exist_ok=True)
        anno = []
        for i in range(synthetic):
            path = f"{tmp_dir}/vids/{i}.mp4"
            if not os.path.exists(path):
                vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                                     (image_size, image_size))
                for j in range(24):
                    vw.write(np.full((image_size, image_size, 3),
                                     (i * 37 + j * 5) % 255, np.uint8))
                vw.release()
            anno.append({"video": f"{i}.mp4",
                         "QA": [{"q": f"question {i}?", "a": f"answer {i}"}]})
        ann_path = f"{tmp_dir}/anno.json"
        with open(ann_path, "w") as f:
            json.dump(anno, f)
        return [ITVidTrainDataset([ann_path, f"{tmp_dir}/vids", "video"],
                                  transform=transform, num_frames=num_frames,
                                  seed=42)]

    from stllm_tpu.data.instruction_data import available_corpus

    datasets = []
    for name, ds_cfg in (cfg.datasets_cfg or {}).items():
        spec = available_corpus[name]
        nf = int(ds_cfg.get("num_frames", num_frames)) if ds_cfg else num_frames
        datasets.append(ITVidTrainDataset(
            spec, transform=transform, num_frames=nf, seed=42,
            video_reader_type=(ds_cfg or {}).get("video_reader_type", "decord"),
        ))
    return datasets


def main():
    args = parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    logging.basicConfig(level=logging.INFO)

    import jax
    import optax

    from stllm_tpu.common.config import Config
    from stllm_tpu.common.registry import registry
    from stllm_tpu.data.collate import TrainCollator
    from stllm_tpu.data.loaders import DataLoader, IterLoader, MetaLoader
    import stllm_tpu.data  # noqa: F401
    import stllm_tpu.models.zoo  # noqa: F401
    from stllm_tpu.parallel.mesh import init_distributed, make_mesh
    from stllm_tpu.train.step import make_optimizer
    from stllm_tpu.train.trainer import Trainer

    cfg = Config(args.cfg_path, options=args.options)
    run = cfg.run_cfg
    model_cfg = cfg.model_cfg

    init_distributed()
    n_dev = len(jax.devices())
    mesh = None
    if n_dev > 1:
        mesh = make_mesh(data=args.data_parallel, model=args.model_parallel)

    model_cls = registry.get_model_class(model_cfg["arch"])
    model = model_cls.from_config(model_cfg)

    datasets = build_datasets(cfg, run, args.synthetic_data)
    batch_size = int(run.get("per_device_train_batch_size", 2)) * (
        mesh.shape["data"] if mesh else 1)
    accum = int(run.get("gradient_accumulation_steps", 1))

    from stllm_tpu.models.zoo import ensure_tokenizers

    ensure_tokenizers(model)
    collate = TrainCollator(model.cfg, model.llama_tokenizer,
                            qformer_tokenizer=model.qformer_tokenizer, seed=42)
    loaders = [
        IterLoader(DataLoader(ds, batch_size * accum, collate,
                              num_workers=int(run.get("dataloader_num_workers", 4)),
                              seed=42))
        for ds in datasets
    ]
    meta = iter(MetaLoader(loaders, seed=42))

    steps_per_epoch = sum(len(l) for l in loaders)
    epochs = float(run.get("num_train_epochs", 1))
    max_steps = args.max_steps or max(1, math.ceil(steps_per_epoch * epochs))
    warmup = int(max_steps * float(run.get("warmup_ratio", 0.0)))
    lr = optax.warmup_cosine_decay_schedule(
        0.0, float(run.get("learning_rate", 1e-4)), max(warmup, 1), max_steps)

    optimizer = make_optimizer(lr, weight_decay=float(run.get("weight_decay", 0.0)))
    trainer = Trainer(
        model.cfg, model.params, optimizer,
        output_dir=str(run.get("output_dir", "output")),
        mesh=mesh, accum_steps=accum,
        trainable_fn=model.trainable_fn(),
        log_freq=int(run.get("logging_steps", 10)),
        save_freq=int(run.get("save_steps", 1000)),
    )
    trainer.resume_if_available()
    stats = trainer.train(meta, max_steps)
    print("final:", stats)


if __name__ == "__main__":
    main()
