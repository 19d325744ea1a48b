"""W4A16 accuracy vs decoder DEPTH on trained proxies (VERDICT round-4 #4).

EQUIV_INT8.json's trained W4A16 arm was 4 layers deep; production decode is
32 layers, and per-matmul quantization error compounds with depth — the
random-weight arm flips first tokens at bf16 margins up to 1.2 logits
(int8's bound: 0.26). This script measures how the error actually GROWS
with depth, and whether per-group scales (g=128/g=64, which the int4
packing already supports) close the gap, to defend (or demote) W4A16 as
the decode default.

Protocol per depth d in {4, 8, 16}: train a full-width (4096/11008,
32 heads) d-layer LLaMA to map n random 24-token prompt embeddings to
fixed 16-token answers (production CE semantics, AdamW; adafactor at
16 layers where AdamW's moments exceed the chip); then for each weight
form — int8 W8A8, W4A16 per-channel, g=128, g=64 — compare greedy answers
vs the trained bf16 stack and record logit-error statistics of the first
answer position. Writes EQUIV_INT8.json["w4a16_depth_scaling"].

Run: python script/w4a16_depth.py [steps] [n] [depths...]   (one v5e chip)
Protocol anchor: beam-5/greedy answers,
reference stllm/test/qabench/msvd_qa.py:108-115.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from stllm_tpu.models.generation import GenerationConfig, generate
from stllm_tpu.models.llama import (
    LlamaConfig, init_llama, llama_forward, lm_head, quantize_llama_params,
    quantize_llama_params_int4)

PROMPT = 24
ANSWER = 16
WIDTH, INTER, HEADS, VOCAB = 4096, 11008, 32, 32000


def make_cfg(depth):
    return LlamaConfig(vocab_size=VOCAB, hidden=WIDTH, num_layers=depth,
                       heads=HEADS, intermediate=INTER, max_positions=128)


def build_data(rng, n, cfg):
    data = []
    for _ in range(n):
        data.append({
            "prompt": (rng.normal(size=(1, PROMPT, WIDTH)) * 0.02
                       ).astype(np.float32),
            "answer": list(rng.integers(10, VOCAB - 10, ANSWER)),
        })
    return data


def make_step(cfg, tx):
    def loss_fn(params, prompt, ans_ids):
        ans_emb = params["embed_tokens"][ans_ids].astype(cfg.dtype)
        x = jnp.concatenate([prompt.astype(cfg.dtype), ans_emb], axis=1)
        hidden, _ = llama_forward(params, inputs_embeds=x, cfg=cfg)
        # positions PROMPT-1 .. PROMPT+ANSWER-2 predict the answer tokens
        logits = lm_head(params, hidden[:, PROMPT - 1:PROMPT + ANSWER - 1])
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ll = jnp.take_along_axis(logp, ans_ids[..., None], axis=-1)
        return -ll.mean()

    # donate params+opt_state: at depth 16 the tree is ~7 GB bf16, and an
    # undonated step holds old params + grads + new params concurrently —
    # past the 16 GB chip. Donation lets XLA write updates in place.
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, prompt, ans_ids):
        loss, grads = jax.value_and_grad(loss_fn)(params, prompt, ans_ids)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step


def greedy(params, cfg, prompt):
    gen = GenerationConfig(max_new_tokens=ANSWER, stop_sequences=(),
                           eos_token_id=-1, pad_to_multiple=8)
    return generate(params, jnp.asarray(prompt), llama_cfg=cfg, gen=gen)[0]


def first_logits(params, cfg, prompt):
    """fp32 logits at the first answer position (prefill last position)."""
    from stllm_tpu.models.generation import _pad_prompt, _prefill

    e, m = _pad_prompt(jnp.asarray(prompt),
                       jnp.ones((1, PROMPT), jnp.int32), 8)
    logits, _ = _prefill(params, e, m, cfg, e.shape[1] + ANSWER)
    return np.asarray(logits[0], np.float64)


def run_depth(depth, steps, n, rng):
    cfg = make_cfg(depth)
    params = init_llama(jax.random.PRNGKey(depth), cfg)
    data = build_data(rng, n, cfg)
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(params))
    # same memory-driven chooser as the trained-equivalence harness, so the
    # depth-scaling and equivalence arms train under one regime
    from stllm_tpu.train.step import make_probe_optimizer

    tx = make_probe_optimizer(params, lr=2e-4)
    opt_name = "adafactor" if n_params > 1_500_000_000 else "adamw"
    opt_state = tx.init(params)
    step = make_step(cfg, tx)

    print(f"depth {depth}: {n_params/1e9:.2f}B params, {opt_name}, "
          f"{steps} steps", flush=True)
    t0 = time.perf_counter()
    batch = 4
    prompts = np.concatenate([d["prompt"] for d in data], axis=0)
    answers = np.asarray([d["answer"] for d in data], np.int32)
    for it in range(steps):
        sel = np.arange(it * batch, (it + 1) * batch) % n
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(prompts[sel]),
            jnp.asarray(answers[sel]))
        if (it + 1) % 100 == 0:
            print(f"  step {it+1}: loss {float(loss):.4f} "
                  f"({time.perf_counter()-t0:.0f}s)", flush=True)
    del opt_state

    bf16_ans, bf16_lg = [], []
    for d in data:
        bf16_ans.append(greedy(params, cfg, d["prompt"]))
        bf16_lg.append(first_logits(params, cfg, d["prompt"]))
    target_ok = sum(a == d["answer"] for a, d in zip(bf16_ans, data))
    margins = [float(np.sort(lg)[-1] - np.sort(lg)[-2]) for lg in bf16_lg]
    print(f"  targets matched {target_ok}/{n}; median margin "
          f"{np.median(margins):.3f}", flush=True)

    variants = {
        "int8": lambda: quantize_llama_params(params),
        "w4a16_per_channel": lambda: quantize_llama_params_int4(
            params, group=None),
        "w4a16_g128": lambda: quantize_llama_params_int4(params, group=128),
        "w4a16_g64": lambda: quantize_llama_params_int4(params, group=64),
    }
    out = {"depth": depth, "n": n, "train_steps": steps,
           "optimizer": opt_name,
           "bf16_targets_matched": target_ok / n,
           "median_margin": round(float(np.median(margins)), 4),
           "variants": {}}
    for name, build in variants.items():
        qp = build()
        q_ans, dl, flips = [], [], []
        for d, blg, ba in zip(data, bf16_lg, bf16_ans):
            qa = greedy(qp, cfg, d["prompt"])
            q_ans.append(qa)
            qlg = first_logits(qp, cfg, d["prompt"])
            dl.append(float(np.abs(qlg - blg).mean()))
            flips.append(qa[0] != ba[0])
        del qp
        flips = np.asarray(flips)
        m = np.asarray(margins)
        out["variants"][name] = {
            "first_token_match": float((~flips).mean()),
            "exact_16_match": sum(a == b for a, b in zip(bf16_ans, q_ans)) / n,
            "mean_abs_logit_err_first_pos": round(float(np.mean(dl)), 4),
            "max_margin_flipped": (round(float(m[flips].max()), 4)
                                   if flips.any() else 0.0),
        }
        print(f"  {name}: {json.dumps(out['variants'][name])}", flush=True)
    # free before the next (bigger) depth
    for leaf in jax.tree_util.tree_leaves(params):
        if isinstance(leaf, jax.Array):
            leaf.delete()
    return out


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    depths = [int(x) for x in sys.argv[3:]] or [4, 8, 16]
    rng = np.random.default_rng(11)
    rows = [run_depth(d, steps, n, rng) for d in depths]

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "EQUIV_INT8.json")
    doc = json.load(open(path)) if os.path.exists(path) else {}
    doc["w4a16_depth_scaling"] = {
        "harness": "script/w4a16_depth.py",
        "model": "full-width (4096/11008, 32 heads) LLaMA at varying depth, "
                 "trained to emit fixed 16-token answers from random "
                 "prompt embeddings",
        "rows": rows,
    }
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"written": path}))


if __name__ == "__main__":
    main()
