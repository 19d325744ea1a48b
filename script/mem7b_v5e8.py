"""7B MVM trainability proof on v5e-8 — AOT compile + memory analysis.

Mirrors the reference's 8-GPU ZeRO-3 training configuration
(reference: config/instructblipbase_stllm_qa.yaml — BTAdapter ViT,
video_input='all', use_mask+mvm_decode, freeze_LLM=False, 16 frames,
per_device_train_batch_size=16, grad checkpointing; launched by
script/train/train.sh via stllm/train/zero3.json) as an FSDP-sharded JAX
train step and compiles it ahead-of-time for a real v5e-8 topology
(no hardware needed: PJRT topology description), then records the
compiler's per-device memory analysis.

The step is the FULL MVM objective: ViT-g+BTAdapter encode (trunk frozen,
branch trainable), Q-Former, masked student 7B pass + no-grad teacher 7B
pass, CE + MVM cosine loss, AdamW update — params and optimizer state
sharded over the 8-device 'data' axis (ZeRO-3 equivalent), remat on ViT
and LLaMA.

Run: python script/mem7b_v5e8.py [accum_steps]  -> prints JSON, writes
MEM7B_V5E8.json. Global batch stays 128 (reference 8x16); accum_steps
trades per-micro-batch activation memory for steps.
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.topologies import get_topology_desc
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stllm_tpu.data.packing import pack_training_batch, sample_video_mask
from stllm_tpu.models.stllm import STLLMConfig, init_stllm
from stllm_tpu.models.vit import EVA_VIT_G
from stllm_tpu.models.llama import VICUNA_7B
from stllm_tpu.train.step import (
    create_train_state, default_trainable, make_optimizer, make_train_step)

GLOBAL_BATCH = 128   # reference: 8 GPUs x per_device_train_batch_size 16
FRAMES = 16
HBM_PER_CHIP = 16 * 1024 ** 3  # v5e


def full_cfg() -> STLLMConfig:
    return STLLMConfig(
        vit=dataclasses.replace(EVA_VIT_G, remat=True),
        llama=dataclasses.replace(VICUNA_7B, remat=True),
        vit_model="eva_btadapter_g",
        video_input="all",
        use_mask=True,
        mvm_decode=True,
        max_txt_len=256,
    )


def fsdp_state_shardings(mesh, tree, min_size=2 ** 15):
    """ZeRO-3 rule for every array in the train state (params, frozen, AdamW
    m/v): shard the largest 8-divisible axis over 'data'; small leaves
    replicate."""
    n = mesh.shape["data"]

    def spec(leaf):
        if not hasattr(leaf, "ndim") or leaf.ndim == 0 or leaf.size < min_size:
            return NamedSharding(mesh, P())
        order = sorted(range(leaf.ndim), key=lambda d: -leaf.shape[d])
        for d in order:
            if leaf.shape[d] % n == 0:
                s = [None] * leaf.ndim
                s[d] = "data"
                return NamedSharding(mesh, P(*s))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec, tree)


def main():
    accum = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    cfg = full_cfg()
    topo = get_topology_desc("v5e:2x4", "tpu")
    mesh = Mesh(np.array(topo.devices).reshape(8, 1), ("data", "model"))

    opt = make_optimizer(2e-5)
    trainable = default_trainable(freeze_llm=False)  # reference freeze_LLM: False

    def make_state():
        params = init_stllm(jax.random.PRNGKey(0), cfg)
        return create_train_state(params, opt, trainable)

    state_shape = jax.eval_shape(make_state)
    state_sh = fsdp_state_shardings(mesh, state_shape)
    state_args = jax.tree_util.tree_map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        state_shape, state_sh)

    b = GLOBAL_BATCH
    v = cfg.num_video_tokens(FRAMES)          # 16 frames x 32 = 512 ('all')
    seq_len = v + cfg.max_txt_len              # 768
    rng = np.random.default_rng(0)
    keep = sample_video_mask(rng, b, v)
    batch = pack_training_batch(
        [[5] * 24] * b, [[6] * 40] * b, [[7] * 48] * b,
        num_video=v, seq_len=seq_len, pad_id=0, keep=keep)
    batch["frames"] = np.zeros((b, FRAMES, 224, 224, 3), np.float32)
    batch["qformer_input_ids"] = np.zeros((b, 32), np.int32)
    batch["qformer_attention_mask"] = np.ones((b, 32), np.int32)

    def batch_spec(a):
        s = [None] * a.ndim
        if a.ndim and a.shape[0] % 8 == 0:
            s[0] = "data"
        return NamedSharding(mesh, P(*s))

    batch_args = {
        k: jax.ShapeDtypeStruct(
            a.shape, jnp.bfloat16 if k == "frames" else a.dtype,
            sharding=batch_spec(a))
        for k, a in batch.items()
    }

    from stllm_tpu.ops.spmd import kernel_sharding

    step = make_train_step(cfg, opt, accum_steps=accum)
    with kernel_sharding(mesh):  # shard_map-wrap Pallas kernels (ops/spmd.py)
        lowered = jax.jit(step, donate_argnums=(0,)).lower(state_args,
                                                           batch_args)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()

    gib = 1024 ** 3
    report = {
        "what": "AOT-compiled full MVM train step (student+teacher 7B, "
                "ViT-g+BTAdapter, Q-Former), FSDP over v5e-8 'data' axis",
        "reference_parity": "config/instructblipbase_stllm_qa.yaml + "
                            "train/zero3.json (8-GPU ZeRO-3, batch 16/dev)",
        "topology": "v5e:2x4 (8 chips, AOT — no hardware attached)",
        "global_batch": b,
        "accum_steps": accum,
        "micro_batch_per_device": b // accum // 8,
        "seq_len": seq_len,
        "frames": FRAMES,
        "per_device": {
            "arguments_gib": round(ma.argument_size_in_bytes / gib, 3),
            "outputs_gib": round(ma.output_size_in_bytes / gib, 3),
            "temps_gib": round(ma.temp_size_in_bytes / gib, 3),
            "peak_gib": round(ma.peak_memory_in_bytes / gib, 3),
            "aliased_gib": round(ma.alias_size_in_bytes / gib, 3),
        },
        "hbm_per_chip_gib": 16.0,
        "fits": bool(ma.peak_memory_in_bytes <= HBM_PER_CHIP),
    }
    print(json.dumps(report, indent=2))
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MEM7B_V5E8.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
