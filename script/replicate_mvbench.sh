#!/usr/bin/env bash
# One-command real-weights MVBench replication gate:
#   convert torch checkpoints -> verify logit parity vs recorded goldens
#   -> run the 20-task MVBench harness (reference protocol:
#   stllm/test/mvbench/mv_bench_infer.py; headline 54.9%).
#
# Real run:
#   script/replicate_mvbench.sh \
#     --cfg config/instructblipbase_stllm_qa.yaml \
#     --llama /ckpts/vicuna-7b-v1.1 \
#     --qformer /ckpts/instruct_blip_vicuna7b_trimmed.pth \
#     --ckpt /ckpts/stllm_instructblip_qa.pth \
#     --anno /data/MVBench/json --data-root /data/MVBench/video
#
# Dry run (no weights; synthetic tiny checkpoints, same three stages):
#   script/replicate_mvbench.sh --dry-run
set -euo pipefail
cd "$(dirname "$0")/.."
exec python script/replicate_mvbench.py "$@"
