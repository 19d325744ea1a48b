#!/bin/bash
# Training launcher (reference: script/train/train.sh — deepspeed over 8 GPUs
# becomes one JAX process per host; the mesh spans all local chips).
python -m stllm_tpu.train.train --cfg-path config/instructblipbase_stllm_qa.yaml "$@"
