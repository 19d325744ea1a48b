"""Image/video preprocessing — TPU-native split of the reference's
torchvision processor pipeline (reference: stllm/processors/blip_processors.py,
stllm/conversation/conversation.py:192-200, instruction_data.py:8-19).

Design: geometric ops (resize / crop) run on the HOST over uint8 with cv2
(C++), so frames cross PCIe as uint8 — 4x less transfer than float32; the
divide-by-255 + CLIP-normalize + dtype cast runs ON DEVICE as one jitted op
(`normalize_frames`) that XLA fuses into the encode graph. A pure-JAX resize
(`resize_bicubic`) is provided for fully-on-device pipelines.

All processors take/return NumPy NHWC (T,H,W,C) or HWC uint8/float arrays —
no torch, no PIL on the hot path (both accepted and converted at the edge).
"""

from __future__ import annotations

import functools
import re
from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from stllm_tpu.common.registry import Registry
from stllm_tpu.data.samplers import sample_frames_indices

# CLIP normalization constants (reference: blip_processors.py:21-24)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def _to_numpy(img) -> np.ndarray:
    """PIL.Image | np.ndarray -> HWC/THWC uint8-or-float ndarray."""
    if hasattr(img, "convert"):  # PIL
        img = np.asarray(img.convert("RGB"))
    return np.asarray(img)


# ---------------------------------------------------------------------------
# device-side (jitted) ops
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("dtype",))
def normalize_frames(frames: jax.Array, dtype: str = "bfloat16") -> jax.Array:
    """uint8 (or [0,255] float) (..., H, W, 3) -> CLIP-normalized ``dtype``.
    The ToTensor + Normalize stage of every reference processor, fused."""
    mean = jnp.asarray(CLIP_MEAN, jnp.float32) * 255.0
    std = jnp.asarray(CLIP_STD, jnp.float32) * 255.0
    x = (frames.astype(jnp.float32) - mean) / std
    return x.astype(dtype)


@functools.partial(jax.jit, static_argnames=("size",))
def resize_bicubic(frames: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """On-device bicubic resize of (..., H, W, C) to ``size`` (H', W')."""
    out_shape = frames.shape[:-3] + (size[0], size[1], frames.shape[-1])
    return jax.image.resize(frames.astype(jnp.float32), out_shape, method="bicubic")


# ---------------------------------------------------------------------------
# host-side geometric ops (uint8, cv2)
# ---------------------------------------------------------------------------

def _cv2():
    import cv2

    return cv2


def resize_hw(frames: np.ndarray, h: int, w: int) -> np.ndarray:
    """Bicubic resize of HWC or THWC uint8/float frames to (h, w)."""
    cv2 = _cv2()
    single = frames.ndim == 3
    if single:
        frames = frames[None]
    out = np.stack([cv2.resize(f, (w, h), interpolation=cv2.INTER_CUBIC) for f in frames])
    return out[0] if single else out


def scale_short_side(frames: np.ndarray, size: int) -> np.ndarray:
    """Resize so the SHORTER side equals ``size``, keeping aspect ratio
    (reference GroupScale, stllm/test/video_transforms.py + conversation.py:195)."""
    h, w = frames.shape[-3:-1]
    if h <= w:
        nh, nw = size, max(1, int(round(w * size / h)))
    else:
        nh, nw = max(1, int(round(h * size / w))), size
    return resize_hw(frames, nh, nw)


def center_crop(frames: np.ndarray, size: int) -> np.ndarray:
    """(…, H, W, C) -> centered (…, size, size, C)."""
    h, w = frames.shape[-3:-1]
    top = max(0, (h - size) // 2)
    left = max(0, (w - size) // 2)
    return frames[..., top:top + size, left:left + size, :]


def random_resized_crop_box(
    rng: np.random.Generator,
    h: int,
    w: int,
    scale: Tuple[float, float] = (0.5, 1.0),
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
) -> Tuple[int, int, int, int]:
    """torchvision RandomResizedCrop.get_params semantics: 10 tries of
    (area-scaled, log-uniform aspect) boxes, else center-crop fallback.
    Returns (top, left, crop_h, crop_w)."""
    area = h * w
    log_ratio = (np.log(ratio[0]), np.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(scale[0], scale[1])
        aspect = np.exp(rng.uniform(*log_ratio))
        cw = int(round(np.sqrt(target_area * aspect)))
        ch = int(round(np.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            top = int(rng.integers(0, h - ch + 1))
            left = int(rng.integers(0, w - cw + 1))
            return top, left, ch, cw
    in_ratio = w / h
    if in_ratio < ratio[0]:
        cw = w
        ch = int(round(cw / ratio[0]))
    elif in_ratio > ratio[1]:
        ch = h
        cw = int(round(ch * ratio[1]))
    else:
        cw, ch = w, h
    return (h - ch) // 2, (w - cw) // 2, ch, cw


def random_resized_crop(
    rng: np.random.Generator,
    frames: np.ndarray,
    size: int,
    scale: Tuple[float, float] = (0.5, 1.0),
) -> np.ndarray:
    """RandomResizedCrop(size, scale, bicubic) over HWC or THWC frames; one
    box shared by all frames of a clip (matching per-sample torchvision use —
    the reference applies the transform to the whole stacked clip tensor)."""
    h, w = frames.shape[-3:-1]
    top, left, ch, cw = random_resized_crop_box(rng, h, w, scale)
    crop = frames[..., top:top + ch, left:left + cw, :]
    return resize_hw(crop, size, size)


def normalize_np(frames: np.ndarray) -> np.ndarray:
    """Host-side ToTensor+Normalize (float32, NHWC) for torch-free parity."""
    x = frames.astype(np.float32) / 255.0
    return (x - np.asarray(CLIP_MEAN, np.float32)) / np.asarray(CLIP_STD, np.float32)


# ---------------------------------------------------------------------------
# processors (registry names match the reference YAMLs)
# ---------------------------------------------------------------------------

class BaseProcessor:
    """Identity transform (reference: processors/base_processor.py:11-26)."""

    def __call__(self, item):
        return item

    @classmethod
    def from_config(cls, cfg=None):
        return cls()


@Registry.register_processor("blip_caption")
class BlipCaptionProcessor(BaseProcessor):
    """Caption cleanup: strip punctuation/extra spaces, word-cap, optional
    prompt prefix (reference: blip_processors.py:29-69)."""

    def __init__(self, prompt: str = "", max_words: int = 50):
        self.prompt = prompt
        self.max_words = max_words

    def __call__(self, caption: str) -> str:
        return self.prompt + self.pre_caption(caption)

    def pre_caption(self, caption: str) -> str:
        caption = re.sub(r"([.!\"()*#:;~])", " ", caption.lower())
        caption = re.sub(r"\s{2,}", " ", caption)
        caption = caption.rstrip("\n").strip(" ")
        words = caption.split(" ")
        if len(words) > self.max_words:
            caption = " ".join(words[: self.max_words])
        return caption

    @classmethod
    def from_config(cls, cfg=None):
        cfg = cfg or {}
        return cls(prompt=cfg.get("prompt", ""), max_words=cfg.get("max_words", 50))


@Registry.register_processor("blip2_image_train")
class Blip2ImageTrainProcessor(BaseProcessor):
    """RandomResizedCrop(224, scale .5-1, bicubic) + normalize
    (reference: blip_processors.py:72-111). Returns float32 NHWC (or HWC);
    pass normalize=False to keep uint8 and normalize on device."""

    def __init__(self, image_size: int = 224, min_scale: float = 0.5,
                 max_scale: float = 1.0, normalize: bool = True,
                 seed: Optional[int] = None):
        self.image_size = image_size
        self.scale = (min_scale, max_scale)
        self.normalize = normalize
        self.rng = np.random.default_rng(seed)

    def __call__(self, item):
        frames = _to_numpy(item)
        out = random_resized_crop(self.rng, frames, self.image_size, self.scale)
        return normalize_np(out) if self.normalize else out

    @classmethod
    def from_config(cls, cfg=None):
        cfg = cfg or {}
        return cls(
            image_size=cfg.get("image_size", 224),
            min_scale=cfg.get("min_scale", 0.5),
            max_scale=cfg.get("max_scale", 1.0),
        )


@Registry.register_processor("blip2_image_eval")
class Blip2ImageEvalProcessor(BaseProcessor):
    """Resize(224,224, bicubic) + normalize (reference: blip_processors.py:138-165)."""

    def __init__(self, image_size: int = 224, normalize: bool = True):
        self.image_size = image_size
        self.normalize = normalize

    def __call__(self, item):
        frames = _to_numpy(item)
        out = resize_hw(frames, self.image_size, self.image_size)
        return normalize_np(out) if self.normalize else out

    @classmethod
    def from_config(cls, cfg=None):
        cfg = cfg or {}
        return cls(image_size=cfg.get("image_size", 224))


@Registry.register_processor("blip2_video_train")
class Blip2VideoTrainProcessor(BaseProcessor):
    """SampleFrames(clip_len=1, num_clips=num_frames) over a decoded clip
    (reference: blip_processors.py:113-135). Returns the sampled THWC frames
    (un-normalized, like the reference's bare ToTensor)."""

    def __init__(self, num_frames: int = 16, test_mode: bool = True,
                 seed: Optional[int] = None):
        self.num_frames = num_frames
        self.test_mode = test_mode
        self.rng = np.random.default_rng(seed)

    def __call__(self, item):
        frames = _to_numpy(item)  # (T, H, W, C)
        idx = sample_frames_indices(
            frames.shape[0], self.num_frames, test_mode=self.test_mode, rng=self.rng
        )
        return frames[idx]

    @classmethod
    def from_config(cls, cfg=None):
        cfg = cfg or {}
        return cls(num_frames=cfg.get("num_frames", 16),
                   test_mode=cfg.get("test_mode", True))


@Registry.register_processor("chat_video_eval")
class ChatVideoEvalProcessor(BaseProcessor):
    """GroupScale(224) + GroupCenterCrop(224) + normalize — the Chat/eval
    transform (reference: conversation.py:192-200)."""

    def __init__(self, image_size: int = 224, normalize: bool = True):
        self.image_size = image_size
        self.normalize = normalize

    def __call__(self, item):
        frames = _to_numpy(item)
        out = center_crop(scale_short_side(frames, self.image_size), self.image_size)
        return normalize_np(out) if self.normalize else out

    @classmethod
    def from_config(cls, cfg=None):
        cfg = cfg or {}
        return cls(image_size=cfg.get("image_size", 224))
