"""Sharding rules for the ST-LLM param tree: FSDP ('data') x tensor parallel
('model').

TPU-native replacement for the reference's DeepSpeed ZeRO-2/3 configs
(reference: stllm/train/zero2.json, zero3.json — parameter/optimizer sharding
over the data-parallel group). The reference has NO tensor parallel
(SURVEY.md §2.10); here TP is a first-class axis: attention heads and MLP
hidden are sharded over ``model`` by annotating params, and XLA GSPMD inserts
the all-reduces over ICI.

Rules are path-pattern driven:
  - each 2-D weight gets its TP axis from the table below (None = replicated
    over 'model');
  - FSDP then shards the LARGEST remaining divisible axis over 'data';
  - small leaves (< min_size) replicate fully.
"""

from __future__ import annotations

import re
from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stllm_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# (path regex, axis index sharded over 'model') — contraction-friendly:
# column-parallel (out axis) for fan-out matmuls, row-parallel (in axis) for
# the projections that follow them, so each attn/MLP pair needs ONE psum.
_TP_RULES: Tuple[Tuple[str, int], ...] = (
    # LLaMA attention + MLP
    (r"llama/layers/\d+/(q|k|v)/w$", 1),
    (r"llama/layers/\d+/o/w$", 0),
    (r"llama/layers/\d+/(gate|up)/w$", 1),
    (r"llama/layers/\d+/down/w$", 0),
    (r"llama/embed_tokens$", 1),          # (vocab, d): shard d
    (r"llama/lm_head/w$", 1),             # (d, vocab): shard vocab
    # ViT blocks
    (r"vit/blocks/\d+/qkv/w$", 1),
    (r"vit/blocks/\d+/proj/w$", 0),
    (r"vit/blocks/\d+/fc1/w$", 1),
    (r"vit/blocks/\d+/fc2/w$", 0),
    # BTAdapter branch mirrors ViT block layout
    (r"vit/btadapter/.*/qkv/w$", 1),
    (r"vit/btadapter/.*/proj/w$", 0),
    (r"vit/btadapter/.*/fc1/w$", 1),
    (r"vit/btadapter/.*/fc2/w$", 0),
    # Q-Former attention / FFN
    (r"qformer/layers/\d+/(attention|crossattention)/(q|k|v)/w$", 1),
    (r"qformer/layers/\d+/(attention|crossattention)/out/w$", 0),
    (r"qformer/layers/\d+/intermediate(_query)?/w$", 1),
    (r"qformer/layers/\d+/(output|output_query)/dense/w$", 0),
)

_COMPILED = [(re.compile(pat), dim) for pat, dim in _TP_RULES]


def tp_dim_for(path: str) -> Optional[int]:
    for pat, dim in _COMPILED:
        if pat.search(path):
            return dim
    return None


def _path_str(path) -> str:
    parts = []
    for p in path:
        parts.append(str(getattr(p, "key", getattr(p, "idx", p))))
    return "/".join(parts)


def stllm_param_shardings(mesh: Mesh, params, min_size: int = 2 ** 14):
    """NamedSharding tree: TP per the rule table + FSDP over the largest
    remaining divisible axis. Works for any subtree of the stllm param dict
    (paths are matched by suffix patterns)."""
    data_n = mesh.shape[DATA_AXIS]
    model_n = mesh.shape[MODEL_AXIS]

    def spec_for(path, leaf):
        if leaf is None or not hasattr(leaf, "ndim"):
            return NamedSharding(mesh, P())
        if leaf.size < min_size:
            return NamedSharding(mesh, P())
        spec = [None] * leaf.ndim
        p = _path_str(path)
        tp = tp_dim_for(p)
        if tp is not None and model_n > 1 and leaf.ndim >= 2:
            # patterns index the last two dims (stacked trees keep leading dims)
            dim = leaf.ndim - 2 + tp
            if leaf.shape[dim] % model_n == 0:
                spec[dim] = MODEL_AXIS
        if data_n > 1:
            order = sorted(range(leaf.ndim), key=lambda d: -leaf.shape[d])
            for d in order:
                if spec[d] is None and leaf.shape[d] % data_n == 0:
                    spec[d] = DATA_AXIS
                    break
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(spec_for, params)


def batch_shardings(mesh: Mesh, batch):
    """Shard every batch leaf's leading (batch) axis over 'data'."""
    def spec_for(leaf):
        spec = [None] * leaf.ndim
        if leaf.ndim and leaf.shape[0] % mesh.shape[DATA_AXIS] == 0:
            spec[0] = DATA_AXIS
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(spec_for, batch)
