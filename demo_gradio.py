"""Gradio chat demo (reference: /root/reference/demo_gradio.py).

Requires the optional ``gradio`` package (not bundled in minimal images):
    pip install gradio && python demo_gradio.py --cfg-path config/... --ckpt-path ...

UI semantics follow the reference: upload a video, ask questions; every
question re-encodes the video with the question as Q-Former text
(demo_gradio.py:73-82), sliders for beam count / temperature / number of
sampled segments (:157-182).
"""

import argparse


def parse_args():
    parser = argparse.ArgumentParser(description="Gradio demo")
    parser.add_argument("--cfg-path",
                        default="config/instructblipbase_stllm_conversation.yaml")
    parser.add_argument("--ckpt-path", default=None)
    parser.add_argument("--options", nargs="+", default=None)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--server-port", type=int, default=7860)
    return parser.parse_args()


def main():
    args = parse_args()
    try:
        import gradio as gr
    except ImportError:
        raise SystemExit(
            "demo_gradio.py requires the optional 'gradio' package "
            "(pip install gradio). For a CLI demo use demo.py instead.")

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from stllm_tpu.common.config import Config
    from stllm_tpu.common.registry import Registry
    from stllm_tpu.conversation import CONV_instructblip_Vicuna0
    from stllm_tpu.models.zoo import ensure_tokenizers
    import stllm_tpu.data  # noqa: F401
    import stllm_tpu.models.zoo  # noqa: F401

    cfg = Config(args.cfg_path, options=args.options)
    model_cfg = cfg.model_cfg
    if args.ckpt_path:
        model_cfg["ckpt"] = args.ckpt_path
    model = Registry.get_model_class(model_cfg["arch"]).from_config(model_cfg)
    ensure_tokenizers(model)
    chat = model.chat()

    def upload(video, num_segments, state):
        conv = CONV_instructblip_Vicuna0.copy()
        state = {"conv": conv, "img_list": [], "video": video,
                 "num_segments": int(num_segments)}
        return state, "Video received — ask a question."

    def ask_answer(question, num_beams, temperature, chatbot, state):
        if not state or state.get("video") is None:
            return chatbot + [[question, "Please upload a video first."]], state
        conv = state["conv"]
        img_list = state["img_list"]
        # re-encode with the question as Q-Former text (reference :73-82)
        img_list.clear()
        conv.messages.clear()
        chat.upload_video(state["video"], conv, img_list,
                          state["num_segments"], text=question)
        chat.ask(question, conv)
        answer, _ = chat.answer(conv=conv, img_list=img_list,
                                num_beams=int(num_beams), do_sample=False,
                                temperature=float(temperature),
                                max_new_tokens=300, max_length=2000)
        return chatbot + [[question, answer]], state

    with gr.Blocks() as demo:
        gr.Markdown("# ST-LLM (TPU) video chat")
        state = gr.State()
        with gr.Row():
            with gr.Column():
                video = gr.Video()
                num_segments = gr.Slider(4, 96, value=64, step=4,
                                         label="num segments")
                num_beams = gr.Slider(1, 10, value=5, step=1, label="beams")
                temperature = gr.Slider(0.1, 2.0, value=1.0, step=0.1,
                                        label="temperature")
                upload_btn = gr.Button("Upload")
                status = gr.Textbox(label="status")
            with gr.Column():
                chatbot = gr.Chatbot()
                question = gr.Textbox(label="question")
        upload_btn.click(upload, [video, num_segments, state], [state, status])
        question.submit(ask_answer,
                        [question, num_beams, temperature, chatbot, state],
                        [chatbot, state])
    demo.launch(server_port=args.server_port)


if __name__ == "__main__":
    main()
