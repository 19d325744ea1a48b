"""Conversation/Chat tests with a toy word-level tokenizer on the tiny model.

Prompt-format strings are asserted against the reference's template semantics
(reference: stllm/conversation/conversation.py:46-64, 205-211, 301-340)."""

import zlib
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stllm_tpu.conversation import (
    CONV_VIDEO_Vicuna0,
    CONV_instructblip_Vicuna0,
    Chat,
    Conversation,
    SeparatorStyle,
)
from stllm_tpu.models.llama import LlamaConfig
from stllm_tpu.models.qformer import QFormerConfig
from stllm_tpu.models.stllm import STLLMConfig, init_stllm
from stllm_tpu.models.vit import ViTConfig

TINY = STLLMConfig(
    vit=ViTConfig(image_size=28, patch_size=14, width=32, depth=2, heads=2,
                  mlp_hidden=64, dtype=jnp.float32, use_flash=False),
    qformer=QFormerConfig(hidden=16, num_layers=2, heads=2, intermediate=32,
                          encoder_width=32, num_query=4, vocab_size=64,
                          dtype=jnp.float32),
    llama=LlamaConfig(vocab_size=4096, hidden=32, num_layers=2, heads=2,
                      intermediate=64, max_positions=1024, dtype=jnp.float32),
    video_input="residual",
    residual_size=2,
)


class ToyTokenizer:
    """Deterministic word-hash tokenizer with exact decode via a reverse map."""

    def __init__(self, vocab=4096):
        self.vocab = vocab
        self.rev = {}

    def encode(self, text, add_special_tokens=False):
        ids = []
        if add_special_tokens:
            ids.append(1)
        for w in text.split(" "):
            t = 10 + (zlib.crc32(w.encode()) % (self.vocab - 10))
            self.rev[t] = w
            ids.append(t)
        return ids

    def decode(self, ids):
        return " ".join(self.rev.get(int(t), "<unk>") for t in ids if t > 1)


@pytest.fixture(scope="module")
def chat():
    params = init_stllm(jax.random.PRNGKey(0), TINY)
    return Chat(params, TINY, ToyTokenizer(), qformer_tokenizer=ToyTokenizer(64),
                image_size=28)


def test_get_prompt_format():
    conv = CONV_VIDEO_Vicuna0.copy()
    conv.append_message(conv.roles[0], "<Video><ImageHere></Video> what is it?")
    conv.append_message(conv.roles[1], None)
    p = conv.get_prompt()
    assert p == (
        conv.system + "###Human: <Video><ImageHere></Video> what is it?"
        "###Assistant: "
    )


def test_ask_merges_after_upload(chat):
    conv = CONV_VIDEO_Vicuna0.copy()
    conv.append_message(conv.roles[0], "<Video><ImageHere></Video>")
    chat.ask("describe the video", conv)
    assert conv.messages[-1][1] == "<Video><ImageHere></Video> describe the video"
    chat.ask("second question", conv)
    assert conv.messages[-1][1] == "second question"


def test_upload_video_and_context_emb(chat):
    conv = CONV_VIDEO_Vicuna0.copy()
    img_list = []
    frames = np.random.default_rng(0).integers(0, 256, (8, 40, 40, 3)).astype(np.uint8)
    msg = chat.upload_video(frames, conv, img_list, text="what is it")
    assert msg == "Received."
    v = TINY.num_video_tokens(8)
    assert img_list[0].shape == (1, v, TINY.llama.hidden)
    chat.ask("what is it?", conv)
    conv.append_message(conv.roles[1], None)
    embs = chat.get_context_emb(conv, img_list)
    # prompt tokens + V video tokens
    n_text = sum(
        len(chat.llama_tokenizer.encode(s, add_special_tokens=(i == 0)))
        for i, s in enumerate(conv.get_prompt().split("<ImageHere>"))
    )
    assert embs.shape == (1, n_text + v, TINY.llama.hidden)


def test_simple_mode_layout(chat):
    conv = CONV_instructblip_Vicuna0.copy()
    img_list = []
    frames = np.random.default_rng(1).integers(0, 256, (4, 40, 40, 3)).astype(np.uint8)
    chat.upload_video(frames, conv, img_list, text="q")
    chat.ask("what happens?", conv)
    embs = chat.get_context_emb_sim(conv, img_list)
    v = TINY.num_video_tokens(4)
    text = conv.system + "###Human: " + "what happens?" + " ###Assistant: "
    n_text = len(chat.llama_tokenizer.encode(text, add_special_tokens=True))
    assert embs.shape == (1, v + n_text, TINY.llama.hidden)
    # video tokens FIRST in simple mode (reference: conversation.py:337)
    np.testing.assert_allclose(
        np.asarray(embs[:, :v], np.float32),
        np.asarray(img_list[0], np.float32), rtol=1e-5)


def test_answer_greedy(chat):
    conv = CONV_VIDEO_Vicuna0.copy()
    img_list = []
    frames = np.random.default_rng(2).integers(0, 256, (4, 40, 40, 3)).astype(np.uint8)
    chat.upload_video(frames, conv, img_list)
    chat.ask("say something", conv)
    text, tokens = chat.answer(conv, img_list, max_new_tokens=8, do_sample=False)
    assert isinstance(text, str)
    assert conv.messages[-1][0] == conv.roles[1]
    assert conv.messages[-1][1] == text
    assert 1 <= len(tokens) <= 8


def test_answer_beam(chat):
    conv = CONV_instructblip_Vicuna0.copy()
    img_list = []
    frames = np.random.default_rng(3).integers(0, 256, (4, 40, 40, 3)).astype(np.uint8)
    chat.upload_video(frames, conv, img_list, text="q")
    chat.ask("option?", conv)
    text, tokens = chat.answer(conv, img_list, max_new_tokens=6, num_beams=2,
                               do_sample=False)
    assert isinstance(text, str) and len(tokens) <= 6


def test_get_prompt_two_style_golden():
    """TWO-style separator alternation + mid-dialog rendering, byte-exact
    (protocol: reference conversation.py:42-51)."""
    conv = Conversation(
        system="SYS", roles=("U: ", "A: "), messages=[], offset=0,
        instruction=False, sep_style=SeparatorStyle.TWO, sep="#", sep2="&",
    )
    conv.append_message(conv.roles[0], "q1")
    conv.append_message(conv.roles[1], "a1")
    conv.append_message(conv.roles[0], "q2")
    conv.append_message(conv.roles[1], None)
    assert conv.get_prompt() == "SYS#U: q1#A: a1&U: q2#A: "
    # copy() deep-copies turns and resets the transient skip flag
    conv.skip_next = True
    clone = conv.copy()
    clone.messages[0][1] = "changed"
    assert conv.messages[0][1] == "q1" and clone.skip_next is False
    assert conv.dict()["sep2"] == "&"
