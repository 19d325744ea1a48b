#!/bin/bash
# (reference: script/inference/vcgbench/test_temporal.sh — the general
#  benchmark driver pointed at temporal_qa.json)
python -m stllm_tpu.evalharness.qabench --bench vcg_general \
  --cfg-path config/instructblipbase_stllm_qa.yaml \
  --ckpt-path "${CKPT:?set CKPT}" \
  --gt_file "${GT_FILE:?set GT_FILE (temporal_qa.json)}" --video_dir "${VIDEO_DIR:?set VIDEO_DIR}" \
  --num-frames 64 --num-beams 5 \
  --output_dir output/vcg --output_name vcg_temporal_pred "$@"
