"""One-command MVBench replication gate: convert -> parity -> MVBench.

Drives the full real-weights replication of the reference's headline result
(MVBench 54.9%, reference protocol: stllm/test/mvbench/mv_bench_infer.py)
as THREE gated stages, stopping at the first failure:

  1. convert   — build the model from the experiment YAML with the supplied
                 torch checkpoint paths (the zoo runs the torch->jax
                 conversion: stllm_tpu/convert/torch_to_jax.py, mirroring
                 reference loading at stllm/models/st_llm.py:160-203).
  2. parity    — verify logits against recorded goldens:
                 (a) the recorded-golden converter/math suite
                     (tests/test_golden_full_size.py — full-width layers vs
                     an HF torch oracle),
                 (b) if --golden FILE.npz is supplied, compare the converted
                     model's lm-head logits on the recorded prompts
                     (top-1 agreement + max |diff|),
                 (c) optionally (--parity-llama) a direct HF-vs-converted
                     logit check on the llama directory itself.
  3. mvbench   — run the 20-task harness (evalharness/mvbench.py) and print
                 the per-task + total accuracy table.

Real run (weights on disk):
  script/replicate_mvbench.sh \
    --cfg config/instructblipbase_stllm_qa.yaml \
    --llama /ckpts/vicuna-7b-v1.1 \
    --qformer /ckpts/instruct_blip_vicuna7b_trimmed.pth \
    --ckpt /ckpts/stllm_instructblip_qa.pth \
    --anno /data/MVBench/json --data-root /data/MVBench/video \
    --out-dir results/mvbench

Dry run (no weights needed; synthesizes tiny torch checkpoints in the
reference's on-disk formats plus a one-task MVBench layout, then drives the
SAME three stages end-to-end on CPU):
  script/replicate_mvbench.sh --dry-run

Record goldens from a converted model for later regression comparison:
  ... --record-golden goldens.npz
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GOLDEN_PROMPTS = 4          # recorded prompts in --record-golden mode
GOLDEN_LEN = 16
GOLDEN_ATOL = 5e-2          # bf16 lm-head logits vs recorded fp32


def log(stage: str, msg: str) -> None:
    print(f"[replicate:{stage}] {msg}", flush=True)


def synthesize_dryrun(root: str):
    """Tiny real-format fixtures: an HF LLaMA dir, a reference-named ST-LLM
    .pth (module names as the release checkpoints use, incl. the
    llm_proj->llama_proj surgery path), and a one-task MVBench layout
    ('Scene Transition': scene_transition.json + scene_qa/video/*.mp4)."""
    import numpy as np
    import torch
    from transformers import LlamaConfig as HFConfig, LlamaForCausalLM

    log("dryrun", f"synthesizing tiny checkpoints + MVBench layout in {root}")
    # --- HF llama dir (tiny_debug.yaml llama dims) ---
    hf_cfg = HFConfig(vocab_size=4096, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=2, num_key_value_heads=2,
                      intermediate_size=64, max_position_embeddings=1024,
                      tie_word_embeddings=False)
    torch.manual_seed(0)
    hf = LlamaForCausalLM(hf_cfg).eval()
    llama_dir = os.path.join(root, "vicuna-tiny")
    hf.save_pretrained(llama_dir)

    # --- reference-named ST-LLM checkpoint (llm_proj + ln_vision families;
    # dims follow config/tiny_debug.yaml: qformer.hidden=16, llama.hidden=32,
    # vit.width=32, residual_size=2 -> down/up project 32 <-> 8) ---
    rng = np.random.default_rng(0)
    d_llm, d_q, d_vit = 32, 16, 32
    state = {
        "model.stllm_model.llm_proj.weight": rng.normal(size=(d_llm, d_q)).astype(np.float32),
        "model.stllm_model.llm_proj.bias": rng.normal(size=(d_llm,)).astype(np.float32),
        "model.stllm_model.ln_vision.weight": rng.normal(size=(d_vit,)).astype(np.float32),
        "model.stllm_model.ln_vision.bias": np.zeros(d_vit, np.float32),
        "model.stllm_model.down_proj.weight": rng.normal(size=(d_llm // 4, d_llm)).astype(np.float32),
        "model.stllm_model.down_proj.bias": np.zeros(d_llm // 4, np.float32),
        "model.stllm_model.up_proj.weight": rng.normal(size=(d_llm, d_llm // 4)).astype(np.float32),
        "model.stllm_model.up_proj.bias": np.zeros(d_llm, np.float32),
    }
    ckpt = os.path.join(root, "stllm_tiny.pth")
    torch.save({"model": {k: torch.from_numpy(v) for k, v in state.items()}}, ckpt)

    # --- one-task MVBench layout ---
    import cv2

    anno = os.path.join(root, "json")
    media = os.path.join(root, "video")
    os.makedirs(anno)
    os.makedirs(os.path.join(media, "scene_qa", "video"))
    vw = cv2.VideoWriter(os.path.join(media, "scene_qa", "video", "a.mp4"),
                         cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 64))
    for i in range(40):
        vw.write(np.full((64, 64, 3), 10 + 5 * i, np.uint8))
    vw.release()
    with open(os.path.join(anno, "scene_transition.json"), "w") as f:
        json.dump([
            {"video": "a.mp4", "question": "What happens first?",
             "candidates": ["fade", "cut", "wipe"], "answer": "cut"},
            {"video": "a.mp4", "question": "How many scenes?",
             "candidates": ["one", "two"], "answer": "two"},
        ], f)
    return llama_dir, ckpt, anno, media


def stage_convert(args):
    from stllm_tpu.common.config import Config
    from stllm_tpu.common.registry import registry
    import stllm_tpu.data  # noqa: F401  (registers builders)
    import stllm_tpu.models.zoo  # noqa: F401

    options = list(args.options or [])
    for key, val in (("llama_model", args.llama), ("ckpt", args.ckpt),
                     ("q_former_model", args.qformer),
                     ("vit_model_path", args.vit)):
        if val:
            options.append(f"model.{key}={val}")
    cfg = Config(args.cfg, options=options)
    model_cfg = cfg.model_cfg
    log("convert", f"building {model_cfg['arch']}/{model_cfg.get('model_type')} "
                   f"from {args.cfg}")
    model = registry.get_model_class(model_cfg["arch"]).from_config(model_cfg)
    from stllm_tpu.models.zoo import ensure_tokenizers
    ensure_tokenizers(model)

    import jax
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(model.params)
                   if hasattr(x, "size"))
    log("convert", f"OK — {len(model.params)} param families, "
                   f"{n_params / 1e6:.1f}M parameters")
    return cfg, model


def stage_parity(args, model):
    import numpy as np
    import jax.numpy as jnp

    from stllm_tpu.models.llama import llama_forward, lm_head

    ok = True
    if not args.skip_golden_suite:
        log("parity", "running recorded-golden suite "
                      "(tests/test_golden_full_size.py, HF torch oracle)")
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-q",
             os.path.join(REPO, "tests", "test_golden_full_size.py")],
            cwd=REPO)
        if r.returncode != 0:
            log("parity", "FAIL — golden suite did not pass")
            return False
        log("parity", "golden suite OK")

    if args.record_golden:
        rng = np.random.default_rng(0)
        vocab = model.cfg.llama.vocab_size
        ids = rng.integers(0, vocab, (GOLDEN_PROMPTS, GOLDEN_LEN)).astype(np.int32)
        hidden, _ = llama_forward(model.params["llama"],
                                  input_ids=jnp.asarray(ids),
                                  cfg=model.cfg.llama)
        logits = np.asarray(lm_head(model.params["llama"], hidden)[:, -1],
                            np.float32)
        np.savez(args.record_golden, input_ids=ids, logits=logits)
        log("parity", f"recorded {GOLDEN_PROMPTS} golden prompts -> "
                      f"{args.record_golden}")

    if args.golden:
        rec = np.load(args.golden)
        ids, want = rec["input_ids"], rec["logits"]
        hidden, _ = llama_forward(model.params["llama"],
                                  input_ids=jnp.asarray(ids),
                                  cfg=model.cfg.llama)
        got = np.asarray(lm_head(model.params["llama"], hidden)[:, -1],
                         np.float32)
        top1 = (got.argmax(-1) == want.argmax(-1)).mean()
        maxdiff = float(np.abs(got - want).max())
        log("parity", f"recorded goldens: top1 agreement {top1:.3f}, "
                      f"max |logit diff| {maxdiff:.4g}")
        if top1 < 1.0 or maxdiff > GOLDEN_ATOL:
            log("parity", "FAIL — converted model diverges from recorded goldens")
            ok = False

    if args.parity_llama and args.llama:
        log("parity", f"direct HF-vs-converted logit check on {args.llama}")
        import torch
        from transformers import LlamaForCausalLM

        hf = LlamaForCausalLM.from_pretrained(args.llama).eval()
        vocab = hf.config.vocab_size
        ids = np.random.default_rng(0).integers(0, vocab, (1, 8))
        with torch.no_grad():
            want = hf(torch.tensor(ids)).logits[:, -1].numpy()
        hidden, _ = llama_forward(model.params["llama"],
                                  input_ids=jnp.asarray(ids, jnp.int32),
                                  cfg=model.cfg.llama)
        got = np.asarray(lm_head(model.params["llama"], hidden)[:, -1],
                         np.float32)
        top1 = (got.argmax(-1) == want.argmax(-1)).mean()
        log("parity", f"HF direct: top1 agreement {top1:.3f}, "
                      f"max |logit diff| {float(np.abs(got - want).max()):.4g}")
        if top1 < 1.0:
            log("parity", "FAIL — converted llama diverges from HF")
            ok = False

    if ok:
        log("parity", "OK")
    return ok


def apply_tome(args, model) -> bool:
    """--tome LEVEL|auto: fold the token-merging level under test into the
    model config, so the real-weights run certifies the accuracy of the
    exact level the throughput claims ride on (BENCH_TOME.json). Returns
    False when the level can't apply to this geometry (dry-run tiny trunk)."""
    import dataclasses

    if not args.tome:
        if model.cfg.vit.merge_level:   # reset after a previous arm
            model.cfg = dataclasses.replace(
                model.cfg, vit=dataclasses.replace(model.cfg.vit,
                                                   merge_level=""))
        return True
    if args.tome == "auto":
        model.cfg = dataclasses.replace(
            model.cfg, vit=dataclasses.replace(model.cfg.vit,
                                               merge_level="auto"))
        log("mvbench", "token merging: auto (per-video redundancy selector)")
        return True
    if model.cfg.vit.seq_len != 257:
        log("mvbench", f"--tome {args.tome}: named levels are defined for "
                       "the full EVA-ViT-g geometry (257 tokens/frame); "
                       "this model is smaller — running unmerged")
        return False
    from stllm_tpu.ops.tome import level_kwargs

    model.cfg = dataclasses.replace(
        model.cfg, vit=dataclasses.replace(model.cfg.vit,
                                           **level_kwargs(args.tome)))
    log("mvbench", f"token merging: {args.tome}")
    return True


def stage_mvbench(args, cfg, model):
    from stllm_tpu.evalharness.mvbench import MVBenchDataset, run_mvbench

    model_cfg = cfg.model_cfg
    apply_tome(args, model)
    chat = model.chat()
    all_token = model_cfg.get("video_input") != "mean"
    resolution = 224
    if isinstance(model_cfg.get("vit"), dict):
        resolution = model_cfg["vit"].get("image_size", 224)
    dataset = MVBenchDataset(args.anno, args.data_root,
                             num_segments=args.num_frames,
                             resolution=resolution,
                             specified_item=args.specified_item)
    log("mvbench", f"{len(dataset)} samples "
                   f"({'task ' + args.specified_item if args.specified_item else '20-task protocol'})")
    if args.serving_slots:
        log("mvbench", f"streaming through the continuous QA server "
                       f"(slots={args.serving_slots})")
    result = run_mvbench(chat, dataset, output_dir=args.out_dir,
                         output_name=args.output_name,
                         all_token=all_token, batch_size=args.batch_size,
                         serving_slots=args.serving_slots or None)
    acc = result["acc_dict"]
    log("mvbench", "per-task accuracy:")
    for task, v in acc.items():
        if task == "Total Acc":
            continue
        log("mvbench", f"  {task}: {v[0]}/{v[1]}")
    log("mvbench", f"Total Acc: {acc['Total Acc']} "
                   f"(reference headline: 54.9% — ST-LLM paper Table 4 / "
                   f"mv_bench_infer.py protocol)")
    return True


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--cfg", default=os.path.join(REPO, "config",
                                                 "instructblipbase_stllm_qa.yaml"))
    p.add_argument("--llama", help="HF Vicuna directory")
    p.add_argument("--qformer", help="instruct_blip_vicuna7b_trimmed.pth")
    p.add_argument("--vit", help="eva_vit_g .pth (optional; qformer ckpt may cover it)")
    p.add_argument("--ckpt", help="ST-LLM release checkpoint .pth")
    p.add_argument("--anno", help="MVBench json/ directory")
    p.add_argument("--data-root", default="", help="MVBench video root")
    p.add_argument("--out-dir", default="results/mvbench")
    p.add_argument("--output-name", default="mvbench")
    p.add_argument("--num-frames", type=int, default=100,
                   help="fps-1 adaptive cap, reference default")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--specified_item", default=None)
    p.add_argument("--tome", default=None,
                   help="token-merge level to certify (named level or "
                        "'auto'); the accuracy run then scores the exact "
                        "config the BENCH_TOME.json throughput rides on")
    p.add_argument("--serving-slots", type=int, default=0,
                   help="stream the eval through the continuous QA server "
                        "(pipeline_serving.VideoQAServer) with N slots — "
                        "certifies the serving path's answers, not just the "
                        "per-sample path")
    p.add_argument("--options", nargs="+", default=None,
                   help="extra dotlist config overrides")
    p.add_argument("--golden", help="recorded-golden .npz to verify against")
    p.add_argument("--record-golden", help="record goldens .npz from this model")
    p.add_argument("--parity-llama", action="store_true",
                   help="also reload the llama dir in HF torch and compare "
                        "logits directly (doubles host RAM for 7B)")
    p.add_argument("--skip-golden-suite", action="store_true")
    p.add_argument("--dry-run", action="store_true",
                   help="synthesize tiny weights + a one-task MVBench layout "
                        "and drive all three stages on CPU")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.cpu or args.dry_run:
        jax.config.update("jax_platforms", "cpu")

    tmp = None
    if args.dry_run:
        tmp = tempfile.TemporaryDirectory(prefix="replicate_dryrun_")
        llama_dir, ckpt, anno, media = synthesize_dryrun(tmp.name)
        args.cfg = os.path.join(REPO, "config", "tiny_debug.yaml")
        args.llama, args.ckpt = llama_dir, ckpt
        args.anno, args.data_root = anno, media
        args.num_frames, args.specified_item = 4, "Scene Transition"
        args.out_dir = os.path.join(tmp.name, "out")
        args.parity_llama = True          # tiny: the direct HF check is free
        args.skip_golden_suite = True     # full-width suite runs in CI; keep
                                          # the dry run fast (~1 min)
        if not args.golden and not args.record_golden:
            # record + immediately verify: exercises both golden paths
            args.record_golden = os.path.join(tmp.name, "goldens.npz")

    cfg, model = stage_convert(args)
    if not stage_parity(args, model):
        return 1
    if args.dry_run and args.record_golden and not args.golden:
        args.golden, args.record_golden = args.record_golden, None
        if not stage_parity(args, model):
            return 1
    if args.anno:
        if not stage_mvbench(args, cfg, model):
            return 1
        if args.dry_run:
            # exercise BOTH headline-surface arms end-to-end so the gate
            # can't rot: the token-merge dispatch ('auto' resolves per
            # video — tiny geometry runs unmerged but drives the full
            # plumbing) and the serving-streamed eval path
            log("dryrun", "arm 2/3: --tome auto")
            args.tome, args.output_name = "auto", "mvbench_tome"
            if not stage_mvbench(args, cfg, model):
                return 1
            log("dryrun", "arm 3/3: --serving-slots 2")
            args.tome, args.serving_slots = None, 2
            args.output_name = "mvbench_serving"
            if not stage_mvbench(args, cfg, model):
                return 1
    else:
        log("mvbench", "skipped (no --anno given)")
    log("done", "all stages passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
