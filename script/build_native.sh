#!/bin/bash
# Build the first-party C++ FFmpeg video decoder (decord replacement;
# reference frame-accuracy contract: stllm/datasets/datasets/utils.py:345-373).
# Produces native/videodec/build/libvideodec.so. Idempotent and fast (~10 s).
set -e
cd "$(dirname "$0")/../native/videodec"
cmake -B build -DCMAKE_BUILD_TYPE=Release >/dev/null
cmake --build build --parallel >/dev/null
echo "built: $(pwd)/build/libvideodec.so"
