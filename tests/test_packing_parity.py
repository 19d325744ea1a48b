"""Static-shape packing vs the reference's dynamic splicing — token-level
oracle parity.

The oracle below re-derives the reference's DYNAMIC sequence construction
(reference: stllm/models/st_llm.py:379-432 prompt_wrap +
concat_emb_input_output, :447-546 forward — bos rules, after-segment
special-token quirk, -100 target windows) as an index-level simulation:
each position is ('text', token_id) or ('video', video_index), plus a label.
The packed batch from TrainCollator/pack_training_batch must reproduce the
same (content, label) sequence once padding is dropped. This is the proof
obligation SURVEY.md §7 flags for the TPU re-formulation."""

import zlib
import numpy as np
import pytest

import jax.numpy as jnp

from stllm_tpu.data.collate import TrainCollator
from stllm_tpu.data.packing import IGNORE
from stllm_tpu.models.llama import LlamaConfig
from stllm_tpu.models.qformer import QFormerConfig
from stllm_tpu.models.stllm import STLLMConfig
from stllm_tpu.models.vit import ViTConfig

BOS, EOS, PAD = 1, 2, 0


class Tok:
    """Deterministic tokenizer with HF-style add_special_tokens=bos."""

    def encode(self, text, add_special_tokens=False):
        ids = [BOS] if add_special_tokens else []
        ids += [10 + (zlib.crc32(w.encode()) % 1000) for w in text.split(" ")]
        return ids

    def decode(self, ids):
        return ""


def oracle_sequence(instruction, answer, cfg, num_video, keep_row=None):
    """Reference-order content+label list for ONE row."""
    tok = Tok()
    before, after = instruction.split("<ImageHere>")
    seq = []
    if not cfg.qformer_text_input:
        seq.append(("text", BOS, IGNORE))          # explicit front bos (:521-531)
    for t in tok.encode(before, add_special_tokens=False):
        seq.append(("text", t, IGNORE))
    vids = range(num_video) if keep_row is None else [
        v for v in range(num_video) if keep_row[v]]
    for v in vids:                                  # video tokens (masked subset)
        seq.append(("video", v, IGNORE))
    # after-segment quirk: add_special_tokens=qformer_text_input (:388-391)
    for t in tok.encode(after, add_special_tokens=cfg.qformer_text_input):
        seq.append(("text", t, IGNORE))
    if cfg.qformer_text_input:                      # answer + eos (:499-502)
        ans = tok.encode(answer, add_special_tokens=False)[: cfg.max_txt_len] + [EOS]
    else:
        ans = tok.encode(answer + cfg.end_sym,
                         add_special_tokens=False)[: cfg.max_txt_len]
    for t in ans:
        seq.append(("text", t, t))                  # labeled region (:532-542)
    return seq


def packed_sequence(batch, row):
    """Packed row -> content+label list with padding dropped."""
    out = []
    for s in range(batch["token_ids"].shape[1]):
        if not batch["attn_mask"][row, s]:
            continue
        if batch["video_slot"][row, s] >= 0:
            out.append(("video", int(batch["video_slot"][row, s]), IGNORE))
        else:
            out.append(("text", int(batch["token_ids"][row, s]),
                        int(batch["labels"][row, s])))
    return out


def _cfg(qformer_text_input=True, use_mask=False):
    return STLLMConfig(
        vit=ViTConfig(image_size=28, patch_size=14, width=32, depth=2, heads=2,
                      mlp_hidden=64, dtype=jnp.float32, use_flash=False),
        qformer=QFormerConfig(hidden=16, num_layers=2, heads=2, intermediate=32,
                              encoder_width=32, num_query=4, vocab_size=64,
                              dtype=jnp.float32),
        llama=LlamaConfig(vocab_size=1100, hidden=32, num_layers=2, heads=2,
                          intermediate=64, max_positions=512, dtype=jnp.float32),
        video_input="all", use_mask=use_mask, qformer_text_input=qformer_text_input,
        end_sym="###", max_txt_len=8,
    )


def _samples(cfg, b=3, t=4):
    rng = np.random.default_rng(0)
    samples = []
    for i in range(b):
        samples.append({
            "image": rng.normal(size=(t, 28, 28, 3)).astype(np.float32),
            "instruction_input": (
                f"sys ###Human: <Video><ImageHere></Video> question {i} longer "
                f"text ###Assistant: "),
            "answer": f"answer {i} with several words " + "x " * i,
        })
    return samples


@pytest.mark.parametrize("qti", [True, False])
def test_packed_matches_dynamic_oracle(qti):
    cfg = _cfg(qformer_text_input=qti)
    coll = TrainCollator(cfg, Tok(), qformer_tokenizer=None, seed=0,
                         eos_id=EOS, bos_id=BOS, pad_id=PAD)
    samples = _samples(cfg)
    batch = coll(samples)
    v = cfg.num_video_tokens(4)
    for i, s in enumerate(samples):
        oracle = oracle_sequence(s["instruction_input"], s["answer"], cfg, v)
        packed = packed_sequence(batch, i)
        assert packed == oracle, f"row {i} mismatch ({qti=})"


def test_packed_masked_student_matches_oracle():
    cfg = _cfg(use_mask=True)
    coll = TrainCollator(cfg, Tok(), seed=0, eos_id=EOS, bos_id=BOS, pad_id=PAD)
    samples = _samples(cfg)
    batch = coll(samples)
    v = cfg.num_video_tokens(4)
    # reconstruct the keep mask from the emitted mvm_weight
    keep = np.asarray(batch["mvm_weight"]) > 0
    for i, s in enumerate(samples):
        oracle = oracle_sequence(s["instruction_input"], s["answer"], cfg, v,
                                 keep_row=keep[i])
        assert packed_sequence(batch, i) == oracle
        # teacher pack carries ALL video tokens
        t_batch = {"token_ids": batch["t_token_ids"],
                   "video_slot": batch["t_video_slot"],
                   "attn_mask": batch["t_attn_mask"],
                   "labels": batch["labels"]}
        t_oracle_videos = [c for c in packed_sequence(t_batch, i)
                           if c[0] == "video"]
        assert [c[1] for c in t_oracle_videos] == list(range(v))
