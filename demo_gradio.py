"""Gradio chat demo (reference: /root/reference/demo_gradio.py).

Requires the optional ``gradio`` package (not bundled in minimal images):
    pip install gradio && python demo_gradio.py --cfg-path config/... --ckpt-path ...

UI semantics follow the reference: upload a video, ask questions; every
question re-encodes the video with the question as Q-Former text
(demo_gradio.py:73-82), sliders for beam count / temperature / number of
sampled segments (:157-182).

All model-facing logic lives in ``stllm_tpu/demo_core.py`` (shared with the
tested demo_web.py); this file is gradio wiring only, so the behavior here
is covered by tests/test_demo_core.py even without gradio installed.
"""

import argparse
import functools

from stllm_tpu.demo_core import build_chat, gradio_ask, gradio_upload


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

    chat = build_chat(args.cfg_path, ckpt_path=args.ckpt_path,
                      options=args.options, cpu=args.cpu)

    def upload(video, num_segments, state):
        new_state, status = gradio_upload(video, num_segments)
        return new_state or state, status

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
        question.submit(functools.partial(gradio_ask, chat),
                        [question, num_beams, temperature, chatbot, state],
                        [chatbot, state])
    demo.launch(server_port=args.server_port)


if __name__ == "__main__":
    main()
