"""Single-video QA demo (reference: /root/reference/demo.py).

Usage:
  python demo.py --cfg-path config/tiny_debug.yaml \
      --video-path example/BaoguoMa.mp4 --question "Why is it funny?"

With real checkpoints set in the config (or --ckpt-path), this reproduces the
reference demo; with config/tiny_debug.yaml it runs offline on random weights.
"""

import argparse

import jax


def parse_args():
    parser = argparse.ArgumentParser(description="Demo")
    parser.add_argument("--cfg-path",
                        default="config/instructblipbase_stllm_conversation.yaml",
                        help="path to configuration file.")
    parser.add_argument("--ckpt-path", default=None,
                        help="path to STLLM conversation weights.")
    parser.add_argument("--video-path", default="/root/reference/example/BaoguoMa.mp4")
    parser.add_argument("--image-path", default=None,
                        help="single-image QA instead of video (1-frame path)")
    parser.add_argument("--question", default="Tell me why this video looks so funny?")
    parser.add_argument("--num-frames", type=int, default=64)
    parser.add_argument("--num-beams", type=int, default=5)
    parser.add_argument("--max-new-tokens", type=int, default=300)
    parser.add_argument("--cpu", action="store_true", help="force CPU backend")
    parser.add_argument("--options", nargs="+",
                        help="override config options, key=value")
    return parser.parse_args()


def main():
    args = parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from stllm_tpu.common.config import Config
    from stllm_tpu.common.registry import registry
    from stllm_tpu.conversation import CONV_instructblip_Vicuna0
    import stllm_tpu.models.zoo  # noqa: F401  (registers st_llm_hf)
    import stllm_tpu.data  # noqa: F401  (registers processors)

    print("Initializing Chat")
    cfg = Config(args.cfg_path, options=args.options)
    model_cfg = cfg.model_cfg
    if args.ckpt_path:
        model_cfg["ckpt"] = args.ckpt_path
    model_cls = registry.get_model_class(model_cfg["arch"])
    model = model_cls.from_config(model_cfg)

    from stllm_tpu.models.zoo import ensure_tokenizers

    ensure_tokenizers(model)

    chat = model.chat(image_size=model_cfg.get("vit", {}).get("image_size", 224)
                      if isinstance(model_cfg.get("vit"), dict) else 224)
    print("Initialization Finished")

    conv = CONV_instructblip_Vicuna0.copy()
    img_list = []
    if args.image_path:
        import cv2

        img = cv2.cvtColor(cv2.imread(args.image_path), cv2.COLOR_BGR2RGB)
        chat.upload_img(img, conv, img_list)
    else:
        chat.upload_video(args.video_path, conv, img_list, args.num_frames,
                          text=args.question)
    chat.ask("###Human: " + args.question + " ###Assistant: ", conv)
    answer, _ = chat.answer(
        conv=conv, img_list=img_list, num_beams=args.num_beams,
        do_sample=False, temperature=1.0, max_new_tokens=args.max_new_tokens,
        max_length=2000,
    )
    print(answer)


if __name__ == "__main__":
    main()
