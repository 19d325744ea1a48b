"""End-to-end integration: the full pipeline (decode -> collate -> masked
train step) OVERFITS a tiny synthetic corpus, and multi-turn chat works."""

import zlib
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stllm_tpu.conversation import CONV_VIDEO_Vicuna0, Chat
from stllm_tpu.data.collate import TrainCollator
from stllm_tpu.data.datasets import ITVidTrainDataset
from stllm_tpu.data.loaders import DataLoader, IterLoader
from stllm_tpu.models.llama import LlamaConfig
from stllm_tpu.models.qformer import QFormerConfig
from stllm_tpu.models.stllm import STLLMConfig, init_stllm
from stllm_tpu.models.vit import ViTConfig
from stllm_tpu.train.step import (
    create_train_state,
    default_trainable,
    make_optimizer,
    make_train_step,
)

TINY = STLLMConfig(
    vit=ViTConfig(image_size=28, patch_size=14, width=32, depth=2, heads=2,
                  mlp_hidden=64, dtype=jnp.float32, use_flash=False),
    qformer=QFormerConfig(hidden=16, num_layers=2, heads=2, intermediate=32,
                          encoder_width=32, num_query=4, vocab_size=64,
                          dtype=jnp.float32),
    llama=LlamaConfig(vocab_size=1100, hidden=32, num_layers=2, heads=2,
                      intermediate=64, max_positions=512, dtype=jnp.float32),
    video_input="mean",  # few video tokens -> fast
    use_mask=False,
    end_sym="###",
)


class Tok:
    def __init__(self):
        self.rev = {}

    def encode(self, text, add_special_tokens=False):
        ids = [1] if add_special_tokens else []
        for w in text.split(" "):
            t = 10 + (zlib.crc32(w.encode()) % 1000)
            self.rev[t] = w
            ids.append(t)
        return ids

    def decode(self, ids):
        return " ".join(self.rev.get(int(t), "<unk>") for t in ids if t > 2)


def test_overfit_tiny_corpus(tmp_path):
    import cv2

    vids = tmp_path / "vids"
    vids.mkdir()
    for i in range(2):
        vw = cv2.VideoWriter(str(vids / f"{i}.mp4"),
                             cv2.VideoWriter_fourcc(*"mp4v"), 10, (28, 28))
        for j in range(12):
            vw.write(np.full((28, 28, 3), 40 + 100 * i + 5 * j, np.uint8))
        vw.release()
    anno = [{"video": f"{i}.mp4",
             "QA": [{"q": f"what clip is this {i}?", "a": f"clip number {i}"}]}
            for i in range(2)]
    ann = tmp_path / "anno.json"
    ann.write_text(json.dumps(anno))

    def transform(frames):
        import cv2 as _cv2

        return np.stack([_cv2.resize(f, (28, 28)) for f in frames]).astype(
            np.float32) / 255.0

    ds = ITVidTrainDataset([str(ann), str(vids), "video"], transform=transform,
                           num_frames=4, seed=0, sample_type="middle",
                           random_shuffle=False)
    coll = TrainCollator(TINY, Tok(), seed=0)
    loader = IterLoader(DataLoader(ds, batch_size=2, collate_fn=coll,
                                   num_workers=1, seed=0, shuffle=False))

    params = init_stllm(jax.random.PRNGKey(0), TINY)
    opt = make_optimizer(3e-3, max_grad_norm=None, weight_decay=0.0)
    # reference training runs with freeze_LLM: False (config/*:12)
    state = create_train_state(params, opt, default_trainable(freeze_llm=False))
    step = jax.jit(make_train_step(TINY, opt))

    losses = []
    for _ in range(25):
        batch = {k: jnp.asarray(v) for k, v in next(loader).items()}
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < 0.6 * losses[0], f"no overfit: {losses[0]:.3f} -> {losses[-1]:.3f}"


def test_multi_turn_chat():
    params = init_stllm(jax.random.PRNGKey(0), TINY)
    chat = Chat(params, TINY, Tok(), image_size=28)
    conv = CONV_VIDEO_Vicuna0.copy()
    img_list = []
    frames = np.random.default_rng(0).integers(0, 256, (4, 40, 40, 3)).astype(np.uint8)
    chat.upload_video(frames, conv, img_list)
    chat.ask("first question", conv)
    a1, _ = chat.answer(conv, img_list, max_new_tokens=4, do_sample=False)
    chat.ask("second question", conv)
    a2, _ = chat.answer(conv, img_list, max_new_tokens=4, do_sample=False)
    # history grows: upload-turn, assistant, human, assistant
    assert len(conv.messages) == 4
    assert conv.messages[1][1] == a1 and conv.messages[3][1] == a2
    prompt = conv.get_prompt()
    assert prompt.count("Human: ") == 2 and prompt.count("Assistant: ") == 2
