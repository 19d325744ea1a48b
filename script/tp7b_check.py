"""AOT validation of the 7B TENSOR-PARALLEL sharding rules (VERDICT r2 weak
#7: dryrun_multichip exercises tiny shapes; nothing validated that the TP
rule table produces the expected shardings and collectives AT 7B).

Lowers the full MVM train step for a v5e 2x4 topology with a
('data'=2, 'model'=4) mesh — FSDP x TP — through
parallel/sharding.py:stllm_param_shardings, then checks:

  1. the TP rule table lands 'model' on the expected axis for each LLaMA
     matmul family (column-parallel q/k/v/gate/up: output dim; row-parallel
     o/down: input dim) at the real 7B shapes;
  2. the optimized SPMD module contains the collectives this layout implies
     (all-gather for FSDP param gathering, reduce-scatter or all-reduce for
     grad/TP partial reduction);
  3. per-device peak memory fits 16 GB (the FSDP-only proof is
     MEM7B_V5E8.json; this is the FSDPxTP variant).

Run: python script/tp7b_check.py  -> prints JSON, writes TP7B_CHECK.json.
No hardware needed (PJRT topology description).
"""

import dataclasses
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

from stllm_tpu.data.packing import pack_training_batch, sample_video_mask
from stllm_tpu.models.llama import VICUNA_7B
from stllm_tpu.models.stllm import STLLMConfig, init_stllm
from stllm_tpu.models.vit import EVA_VIT_G
from stllm_tpu.parallel.sharding import batch_shardings, stllm_param_shardings
from stllm_tpu.train.step import (
    create_train_state, default_trainable, make_optimizer, make_train_step)

FRAMES = 16
GLOBAL_BATCH = 16


def main():
    cfg = STLLMConfig(
        vit=dataclasses.replace(EVA_VIT_G, remat=True),
        llama=dataclasses.replace(VICUNA_7B, remat=True),
        video_input="all",
        use_mask=True,
        max_txt_len=256,
    )
    topo = get_topology_desc("v5e:2x4", "tpu")
    mesh = Mesh(np.array(topo.devices).reshape(2, 4), ("data", "model"))

    opt = make_optimizer(2e-5)
    trainable = default_trainable(freeze_llm=False)

    def make_state():
        params = init_stllm(jax.random.PRNGKey(0), cfg)
        return create_train_state(params, opt, trainable)

    state_shape = jax.eval_shape(make_state)
    state_sh = jax.tree_util.tree_map(
        lambda sub: stllm_param_shardings(mesh, sub),
        (state_shape.params, state_shape.frozen, state_shape.opt_state),
        is_leaf=lambda x: x in (state_shape.params, state_shape.frozen,
                                state_shape.opt_state))
    # assemble full-state shardings (step counter replicated)
    state_args = type(state_shape)(
        jax.ShapeDtypeStruct(state_shape.step.shape, state_shape.step.dtype,
                             sharding=NamedSharding(mesh, P())),
        *[jax.tree_util.tree_map(
            lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
            part, shard)
          for part, shard in zip((state_shape.params, state_shape.frozen,
                                  state_shape.opt_state), state_sh)],
    )

    # --- check 1: TP rule placement at 7B shapes ---
    # freeze_llm=False puts the LLaMA in state.params (trainable), so scan
    # BOTH partitions and require the llama prefix (a bare 'q' would also
    # match the Q-Former attention).
    checks = {}
    for part in (state_shape.params, state_shape.frozen):
        part_sh = stllm_param_shardings(mesh, part, min_size=2 ** 14)
        for path, sharding in jax.tree_util.tree_flatten_with_path(part_sh)[0]:
            key = jax.tree_util.keystr(path)
            if "'llama'" not in key or not key.endswith("['w']"):
                continue
            spec = sharding.spec
            for fam, want in (("q", ("col", 1)), ("v", ("col", 1)),
                              ("gate", ("col", 1)), ("up", ("col", 1)),
                              ("o", ("row", 0)), ("down", ("row", 0))):
                if key.endswith(f"['{fam}']['w']"):
                    checks.setdefault(
                        f"{fam}_{want[0]}_parallel",
                        len(spec) > want[1] and spec[want[1]] == "model")

    rules_ok = all(checks.values()) and len(checks) == 6
    if "--rules-only" in sys.argv:  # fast path: skip the 7B AOT compile
        print(json.dumps({"tp_rule_checks": checks, "tp_rules_ok": rules_ok},
                         indent=2))
        sys.exit(0 if rules_ok else 1)

    b = GLOBAL_BATCH
    v = cfg.num_video_tokens(FRAMES)
    seq_len = v + cfg.max_txt_len
    rng = np.random.default_rng(0)
    keep = sample_video_mask(rng, b, v)
    batch = pack_training_batch(
        [[5] * 24] * b, [[6] * 40] * b, [[7] * 48] * b,
        num_video=v, seq_len=seq_len, pad_id=0, keep=keep)
    batch["frames"] = np.zeros((b, FRAMES, 224, 224, 3), np.float32)
    batch["qformer_input_ids"] = np.zeros((b, 32), np.int32)
    batch["qformer_attention_mask"] = np.ones((b, 32), np.int32)
    batch_sh = batch_shardings(mesh, jax.tree_util.tree_map(jnp.asarray, batch))
    batch_args = {
        k: jax.ShapeDtypeStruct(
            a.shape, jnp.bfloat16 if k == "frames" else a.dtype,
            sharding=batch_sh[k])
        for k, a in batch.items()
    }

    from stllm_tpu.ops.spmd import kernel_sharding

    step = make_train_step(cfg, opt)
    with kernel_sharding(mesh):
        lowered = jax.jit(step, donate_argnums=(0,)).lower(
            state_args, batch_args)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()

    # --- check 2: collectives in the optimized SPMD module ---
    hlo = compiled.as_text()
    coll = {
        "all_gather": len(re.findall(r"all-gather(?:-start)?\(", hlo)),
        "reduce_scatter": len(re.findall(r"reduce-scatter\(", hlo)),
        "all_reduce": len(re.findall(r"all-reduce(?:-start)?\(", hlo)),
        "collective_permute": len(re.findall(r"collective-permute", hlo)),
    }
    del hlo

    gib = 1024 ** 3
    report = {
        "what": "AOT FSDP(2) x TP(4) 7B MVM train step on v5e:2x4",
        "tp_rule_checks": checks,
        "tp_rules_ok": all(checks.values()) and len(checks) == 6,
        "collectives": coll,
        "collectives_ok": bool(coll["all_gather"]
                               and (coll["reduce_scatter"]
                                    or coll["all_reduce"])),
        "per_device_peak_gib": round(ma.peak_memory_in_bytes / gib, 3),
        "fits_16gib": bool(ma.peak_memory_in_bytes <= 16 * gib),
        "global_batch": b,
        "seq_len": seq_len,
    }
    print(json.dumps(report, indent=2))
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "TP7B_CHECK.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    if not (report["tp_rules_ok"] and report["collectives_ok"]):
        sys.exit(1)


if __name__ == "__main__":
    main()
