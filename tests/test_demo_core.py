"""Shared demo core (stllm_tpu/demo_core.py): the model/Chat construction
and the gradio handler logic both demos ride on — tested here so
demo_gradio.py (thin wiring, gradio not installed in this image) has its
behavior covered: per-question re-encode with the question as Q-Former text
(reference demo_gradio.py:73-82)."""

import numpy as np
import pytest

from stllm_tpu.demo_core import build_chat, gradio_ask, gradio_upload


@pytest.fixture(scope="module")
def chat():
    return build_chat("config/tiny_debug.yaml", cpu=True)


@pytest.fixture(scope="module")
def video_path(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    path = str(tmp_path_factory.mktemp("vid") / "v.mp4")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 64))
    for i in range(20):
        vw.write(np.full((64, 64, 3), 25 + 9 * i, np.uint8))
    vw.release()
    return path


def test_upload_builds_state(video_path):
    state, status = gradio_upload(video_path, 4)
    assert state["video"] == video_path and state["num_segments"] == 4
    assert state["img_list"] == [] and "ask" in status

    empty, status = gradio_upload(None, 4)
    assert empty == {} and "Choose" in status


def test_ask_without_upload_is_graceful(chat):
    chatbot, state = gradio_ask(chat, "what?", 1, 1.0, [], None)
    assert chatbot[-1][1].startswith("Please upload")
    assert state is None


def test_ask_reencodes_and_answers(chat, video_path):
    state, _ = gradio_upload(video_path, 4)
    chatbot, state = gradio_ask(chat, "What is shown?", 1, 1.0, [], state,
                                max_new_tokens=4)
    assert chatbot[-1][0] == "What is shown?"
    assert isinstance(chatbot[-1][1], str)
    # per-question re-encode: img_list repopulated, conv holds Q/A pair
    assert len(state["img_list"]) == 1
    assert len(state["conv"].messages) == 2

    # second question: history cleared and re-encoded (reference semantics)
    chatbot, state = gradio_ask(chat, "And now?", 2, 1.0, chatbot, state,
                                max_new_tokens=4)
    assert len(chatbot) == 2
    assert len(state["conv"].messages) == 2  # re-cleared per question
