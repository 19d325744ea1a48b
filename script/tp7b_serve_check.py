"""AOT validation of 7B TENSOR-PARALLEL *serving* on a v5e 1x4 slice.

The single-chip serving stack quantizes (16 GB cannot hold bf16 7B plus
beam program temps — DESIGN.md records the bf16 beam-chunk compile OOM).
This check proves the bf16 parity path SERVES across 4 chips with the
existing TP rule table (parallel/sharding.py): it AOT-compiles, against a
v5e:1x4 PJRT topology,

  1. the 512-token prefill program, and
  2. the production 16-step greedy decode chunk
     (generation._decode_chunk_greedy),

with LLaMA params sharded by the TP rules and the KV cache sharded over
heads on the same 'model' axis, then asserts per-chip peak memory fits
16 GB and the per-layer TP reductions (all-reduce / reduce-scatter) are in
the optimized module. No hardware needed.

Run: python script/tp7b_serve_check.py  -> prints JSON, TP7B_SERVE.json.
"""

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.topologies import get_topology_desc
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stllm_tpu.models.generation import _decode_chunk_greedy, _prefill
from stllm_tpu.models.llama import VICUNA_7B, init_kv_cache, init_llama
from stllm_tpu.parallel.sharding import stllm_param_shardings

PROMPT, NEW, CHUNK = 512, 64, 16


def _struct(tree, shardings):
    return jax.tree_util.tree_map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        tree, shardings)


def main():
    topo = get_topology_desc("v5e:2x2", "tpu")  # 4 chips (1x4 isn't a
    mesh = Mesh(np.array(topo.devices).reshape(1, 4), ("data", "model"))
    # valid chips-per-host layout; the mesh shape is what matters)
    cfg = VICUNA_7B
    repl = NamedSharding(mesh, P())

    params_shape = jax.eval_shape(
        lambda: init_llama(jax.random.PRNGKey(0), cfg))
    p_sh = stllm_param_shardings(mesh, {"llama": params_shape})["llama"]
    params_args = _struct(params_shape, p_sh)

    max_len = PROMPT + NEW
    cache_shape = jax.eval_shape(
        lambda: init_kv_cache(cfg, 1, max_len))
    head_sh = NamedSharding(mesh, P(None, None, "model", None))
    cache_sh = cache_shape._replace(
        k=tuple(head_sh for _ in cache_shape.k),
        v=tuple(head_sh for _ in cache_shape.v),
        length=repl)
    cache_args = _struct(cache_shape, cache_sh)

    emb = jax.ShapeDtypeStruct((1, PROMPT, cfg.hidden), jnp.bfloat16,
                               sharding=repl)
    mask = jax.ShapeDtypeStruct((1, PROMPT), jnp.int32, sharding=repl)
    tok = jax.ShapeDtypeStruct((1,), jnp.int32, sharding=repl)

    out = {"what": "AOT TP(4) 7B bf16 serving on a 4-chip v5e slice "
                   "(prefill + 16-step greedy decode chunk)"}
    peaks = {}
    colls = {}
    for name, fn, args in (
        ("prefill", _prefill.__wrapped__,
         (params_args, emb, mask, cfg, max_len)),
        ("decode_chunk", _decode_chunk_greedy.__wrapped__,
         (params_args, tok, cache_args, cfg, CHUNK)),
    ):
        static = {"prefill": (3, 4), "decode_chunk": (3, 4)}[name]
        compiled = jax.jit(
            fn, static_argnums=static,
            donate_argnums=(2,) if name == "decode_chunk" else (),
        ).lower(*args).compile()
        ma = compiled.memory_analysis()
        peak = (ma.argument_size_in_bytes + ma.output_size_in_bytes
                + ma.temp_size_in_bytes) / 2**30
        # arguments are per-chip under GSPMD memory analysis
        peaks[name] = round(peak, 3)
        hlo = compiled.as_text()
        colls[name] = {
            "all_reduce": len(re.findall(r"all-reduce(?:-start)?\(", hlo)),
            "reduce_scatter": len(re.findall(r"reduce-scatter\(", hlo)),
            "all_gather": len(re.findall(r"all-gather(?:-start)?\(", hlo)),
        }
    out["per_chip_peak_gib"] = peaks
    out["fits_16gib"] = all(p < 16.0 for p in peaks.values())
    out["collectives"] = colls
    # decode must carry at least one TP reduction per layer (o/down rows)
    dec = colls["decode_chunk"]
    out["tp_reductions_ok"] = (
        dec["all_reduce"] + dec["reduce_scatter"] >= cfg.num_layers)
    out["ok"] = bool(out["fits_16gib"] and out["tp_reductions_ok"])
    print(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "TP7B_SERVE.json"), "w") as f:
        json.dump(out, f, indent=1)
    sys.exit(0 if out["ok"] else 1)


if __name__ == "__main__":
    main()
