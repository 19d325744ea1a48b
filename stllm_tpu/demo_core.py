"""Shared UI-free core for the chat demos.

Both front ends — `demo_web.py` (first-party stdlib HTTP page, e2e-tested)
and `demo_gradio.py` (gradio wiring matching the reference UI,
reference: /root/reference/demo_gradio.py) — build the same model/Chat stack
and run the same question-answer semantics. Keeping that logic here means
the gradio demo's behavior is covered by tests even though the ``gradio``
package itself is not installed in this image: the handlers below are plain
functions over (chat, state) and the gradio file is wiring only.

Reference semantics preserved by the gradio handlers: every question
re-encodes the uploaded video with the question as the Q-Former text input
(reference demo_gradio.py:73-82), and the sliders map to num_segments /
num_beams / temperature (reference demo_gradio.py:157-182).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple


def build_chat(cfg_path: str, ckpt_path: Optional[str] = None,
               options=None, cpu: bool = False):
    """YAML config -> model -> Chat (tokenizers ensured). The single
    construction path both demos share."""
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")

    from stllm_tpu.common.config import Config
    from stllm_tpu.common.registry import registry
    from stllm_tpu.models.zoo import ensure_tokenizers
    import stllm_tpu.data  # noqa: F401  (registers processors)
    import stllm_tpu.models.zoo  # noqa: F401  (registers st_llm_hf)

    cfg = Config(cfg_path, options=options)
    model_cfg = cfg.model_cfg
    if ckpt_path:
        model_cfg["ckpt"] = ckpt_path
    model = registry.get_model_class(model_cfg["arch"]).from_config(model_cfg)
    ensure_tokenizers(model)
    vit_cfg = model_cfg.get("vit")
    size = vit_cfg.get("image_size", 224) if isinstance(vit_cfg, dict) else 224
    return model.chat(image_size=size)


def gradio_upload(video: Optional[str], num_segments: int) -> Tuple[Dict, str]:
    """Upload handler: returns (state, status message). The video is only
    recorded — encoding happens per question (reference demo_gradio.py:73-82
    re-encodes with the question as Q-Former text)."""
    if not video:
        return {}, "Choose a video first."
    from stllm_tpu.conversation import CONV_instructblip_Vicuna0

    state = {"conv": CONV_instructblip_Vicuna0.copy(), "img_list": [],
             "video": video, "num_segments": int(num_segments)}
    return state, "Video received — ask a question."


def gradio_ask(chat, question: str, num_beams: int, temperature: float,
               chatbot: List, state: Optional[Dict],
               max_new_tokens: int = 300) -> Tuple[List, Optional[Dict]]:
    """Question handler: re-encode the video with the question as Q-Former
    text, ask, answer. Returns (chatbot', state)."""
    if not state or state.get("video") is None:
        return chatbot + [[question, "Please upload a video first."]], state
    conv = state["conv"]
    img_list = state["img_list"]
    img_list.clear()
    conv.messages.clear()
    chat.upload_video(state["video"], conv, img_list,
                      state["num_segments"], text=question)
    chat.ask(question, conv)
    answer, _ = chat.answer(conv=conv, img_list=img_list,
                            num_beams=int(num_beams), do_sample=False,
                            temperature=float(temperature),
                            max_new_tokens=max_new_tokens, max_length=2000)
    return chatbot + [[question, answer]], state
