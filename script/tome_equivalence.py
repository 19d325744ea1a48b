"""Token-merging answer-equivalence envelope on the full-size pipeline.

Gate for the FLOP-reduction encode (ops/tome.py): the int8 roofline closed
the matmul-rate route to the 4x target (DESIGN.md), so the remaining lever
is fewer tokens per frame — this script quantifies what staged token
merging does to MVBench-style greedy answers, the same way
script/int8_equivalence.py legitimized int8 (EQUIV_INT8.json).

Protocol mirrors int8_equivalence.py: N samples of 16-frame video ->
headline static-int8 encode -> 608-token prompt -> 16-token greedy answer
(reference: stllm/test/mvbench/mv_bench.py:229-283, do_sample=False).
BASELINE = the unmerged static-int8 stack (the current headline); each
merge level re-encodes the same videos and compares answers. Both arms
share ONE quantized model — merging is a pure config change
(cfg.vit.merge_schedule) — so every flip is attributable to merging alone.

Frames are SYNTHETIC VIDEO (smooth per-frame motion over a random base),
not iid noise: merging exploits temporal/spatial redundancy, and iid noise
has none — it is reported as the adversarial case (`noise_frames` section)
where merging is expected to perturb most.

Run: python script/tome_equivalence.py [N]    (one real chip)
Writes TOME_EQUIV.json.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from stllm_tpu.models.generation import GenerationConfig, generate
from stllm_tpu.models.stllm import STLLMConfig, encode_img, init_stllm
from stllm_tpu.models.vit import EVA_VIT_G

FRAMES = 16
PREFIX_TOKENS = 64
SUFFIX_TOKENS = 32
ANSWER_TOKENS = 16

# Named schedules come from ops/tome.py:MERGE_LEVELS — the single source
# shared with every throughput bench, so this accuracy envelope always
# describes the exact schedules that were measured. Spatial levels:
# (block_idx, tokens_after) staged in-trunk merges. Temporal levels:
# cross-frame folds (which exploit adjacent-frame redundancy — present in
# the synthetic drifting video, absent in the adversarial iid-noise arm)
# plus a post-trunk re-merge.
from stllm_tpu.ops.tome import MERGE_LEVELS

LEVELS = {k: v["merge_schedule"] for k, v in MERGE_LEVELS.items()
          if "temporal_schedule" not in v and k != "off"}
T_LEVELS = {k: (v["temporal_schedule"], v["merge_schedule"])
            for k, v in MERGE_LEVELS.items() if "temporal_schedule" in v}


from stllm_tpu.data.synth import synth_video  # noqa: E402  (shared arms)


def make_samples(n, cfg, video=True):
    rng = np.random.default_rng(7)
    d = cfg.llama.hidden
    s = cfg.vit.image_size
    samples = []
    for _ in range(n):
        frames = (synth_video(rng, FRAMES, s) if video else
                  rng.integers(0, 256, (1, FRAMES, s, s, 3)).astype(np.uint8))
        samples.append({
            "frames": frames,
            "q_ids": rng.integers(
                0, cfg.qformer.vocab_size, (1, 16)).astype(np.int32),
            "q_mask": np.ones((1, 16), np.int32),
            "prefix": (rng.normal(size=(1, PREFIX_TOKENS, d)) * 0.02
                       ).astype(np.float32),
            "suffix": (rng.normal(size=(1, SUFFIX_TOKENS, d)) * 0.02
                       ).astype(np.float32),
        })
    return samples


def run_samples(params, cfg, samples, label):
    """``cfg`` is an STLLMConfig, or a callable sample -> STLLMConfig (the
    auto arm resolves a merge level per video)."""
    cfg_fn = cfg if callable(cfg) else (lambda s: cfg)
    d = cfg_fn(samples[0]).llama.hidden
    enc_cache = {}

    def encode_for(c):
        if c not in enc_cache:
            @jax.jit
            def encode(params, frames, q_ids, q_mask):
                vid = encode_img(params, frames, c, q_ids, q_mask)
                return vid.reshape(1, -1, d)

            enc_cache[c] = encode
        return enc_cache[c]

    gen = GenerationConfig(max_new_tokens=ANSWER_TOKENS, stop_sequences=(),
                           eos_token_id=-1)
    outs, margins = [], []
    t0 = time.perf_counter()
    for s in samples:
        cfg = cfg_fn(s)
        vid = encode_for(cfg)(params, s["frames"], s["q_ids"], s["q_mask"])
        embeds = jnp.concatenate(
            [jnp.asarray(s["prefix"], cfg.llama.dtype), vid,
             jnp.asarray(s["suffix"], cfg.llama.dtype)], axis=1)
        toks = generate(params["llama"], embeds, llama_cfg=cfg.llama, gen=gen)
        outs.append(list(toks[0]))
        margins.append(_first_token_margin(params["llama"], embeds, cfg, gen))
    dt = time.perf_counter() - t0
    print(f"[{label}] {len(samples)} samples in {dt:.1f}s", file=sys.stderr)
    return outs, margins


def _first_token_margin(llama_params, embeds, cfg, gen):
    from stllm_tpu.models.generation import _pad_prompt, _prefill

    b, s, _ = embeds.shape
    mask = jnp.ones((b, s), jnp.int32)
    e, m = _pad_prompt(embeds, mask, gen.pad_to_multiple)
    logits, _ = _prefill(llama_params, e, m, cfg.llama,
                         e.shape[1] + gen.max_new_tokens)
    top2 = jax.lax.top_k(logits[0].astype(jnp.float32), 2)[0]
    return float(top2[0] - top2[1])


def grade(base_out, base_margins, got_out):
    n = len(base_out)
    first = sum(a[0] == b[0] for a, b in zip(base_out, got_out))
    exact = sum(a == b for a, b in zip(base_out, got_out))
    margins = np.asarray(base_margins)
    flips = np.asarray([a[0] != b[0] for a, b in zip(base_out, got_out)])
    med = float(np.median(margins))
    above = margins > med
    return {
        "first_token_match": first / n,
        "exact_16_match": exact / n,
        "max_margin_flipped": (round(float(margins[flips].max()), 4)
                               if flips.any() else 0.0),
        "first_token_match_above_median_margin":
            (float((~flips[above]).mean()) if above.any() else 1.0),
    }


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    cfg = STLLMConfig(vit=dataclasses.replace(EVA_VIT_G, gelu_approx=True))
    params = init_stllm(jax.random.PRNGKey(0), cfg, init_llama_params=True)

    samples = make_samples(n, cfg, video=True)
    noise = make_samples(max(n // 3, 8), cfg, video=False)

    # headline static-int8 stack for BOTH arms (int8_equivalence.py recipe)
    from stllm_tpu.models.llama import quantize_llama_params
    from stllm_tpu.models.vit import calibrate_vit_scales, quantize_vit_params

    cfg_q = dataclasses.replace(
        cfg, llama=dataclasses.replace(cfg.llama, kv_int8=True))
    params["vit"] = quantize_vit_params(params["vit"], free_dense=True)
    calib = np.concatenate([s["frames"][0] for s in samples[:4]], axis=0)
    params["vit"] = calibrate_vit_scales(
        params["vit"], jnp.asarray(calib), cfg.vit)
    params["llama"] = quantize_llama_params(params["llama"], free_dense=True)

    base_out, base_margins = run_samples(params, cfg_q, samples, "unmerged")
    base_noise, noise_margins = run_samples(params, cfg_q, noise,
                                            "unmerged-noise")

    doc = {
        "metric": "token-merging vs unmerged greedy answer equivalence "
                  "(16-frame MVBench-shaped QA, static-int8 stack, random "
                  "full-size weights)",
        "harness": "script/tome_equivalence.py",
        "n": n,
        "baseline_stack": "W8A8 static-scale ViT incl. static-s8 qkv "
                          "attention + W8A8 LLaMA + int8 KV (headline)",
        "median_top2_margin_bf16_arm": round(
            float(np.median(base_margins)), 4),
        "levels": {},
    }
    only = sys.argv[2] if len(sys.argv) > 2 else ""   # substring filter
    for name, sched in LEVELS.items():
        if only and only not in name:
            continue
        cfg_m = dataclasses.replace(
            cfg_q, vit=dataclasses.replace(cfg_q.vit, merge_schedule=sched))
        out, _ = run_samples(params, cfg_m, samples, f"tome-{name}")
        entry = grade(base_out, base_margins, out)
        entry["merge_schedule"] = [list(x) for x in sched]
        nout, _ = run_samples(params, cfg_m, noise, f"tome-{name}-noise")
        entry["noise_frames"] = grade(base_noise, noise_margins, nout)
        doc["levels"][name] = entry
        print(json.dumps({name: entry}))
    for name, (tsched, msched) in T_LEVELS.items():
        if only and only not in name:
            continue
        cfg_m = dataclasses.replace(
            cfg_q, vit=dataclasses.replace(
                cfg_q.vit, temporal_schedule=tsched, merge_schedule=msched))
        out, _ = run_samples(params, cfg_m, samples, f"tome-{name}")
        entry = grade(base_out, base_margins, out)
        entry["temporal_schedule"] = [list(x) for x in tsched]
        entry["post_trunk_merge"] = [list(x) for x in msched]
        nout, _ = run_samples(params, cfg_m, noise, f"tome-{name}-noise")
        entry["noise_frames"] = grade(base_noise, noise_margins, nout)
        doc["levels"][name] = entry
        print(json.dumps({name: entry}))

    # -- AUTO arm: the redundancy-adaptive selector picks a level per video
    # (ops/tome.py select_merge_level). The claim under test: on mixed
    # smooth/noise traffic it keeps smooth-video gains while backing off to
    # no merging on irredundant input (noise subset must grade ~like the
    # unmerged baseline).
    if not only or only in "auto":
        from stllm_tpu.models.stllm import resolve_auto_merge
        from stllm_tpu.ops.tome import select_merge_level

        cfg_auto = dataclasses.replace(
            cfg_q, vit=dataclasses.replace(cfg_q.vit, merge_level="auto"))
        chosen = {"smooth": {}, "noise": {}}
        for kind, arm in (("smooth", samples), ("noise", noise)):
            for s in arm:
                lvl = select_merge_level(s["frames"])
                chosen[kind][lvl] = chosen[kind].get(lvl, 0) + 1

        def cfg_fn(s):
            return resolve_auto_merge(cfg_auto, s["frames"])

        out, _ = run_samples(params, cfg_fn, samples, "tome-auto")
        entry = grade(base_out, base_margins, out)
        nout, _ = run_samples(params, cfg_fn, noise, "tome-auto-noise")
        entry["noise_frames"] = grade(base_noise, noise_margins, nout)
        entry["levels_chosen"] = chosen
        doc["levels"]["auto"] = entry
        print(json.dumps({"auto": entry}))

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "TOME_EQUIV.json")
    # merge-preserving: the trained-model section is written by its own
    # script; per-level entries update in place
    old = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                old = json.load(f)
        except ValueError:
            old = {}
    old_levels = old.get("levels", {})
    old_levels.update(doc["levels"])
    old.update(doc)
    old["levels"] = old_levels
    with open(path, "w") as f:
        json.dump(old, f, indent=1)
    print(json.dumps({"written": path}))


if __name__ == "__main__":
    main()
