"""RandomAugment / VideoRandomAugment — cv2/NumPy augmentation ops.

Parity surface for the reference's randaugment module
(reference: stllm/processors/randaugment.py:326-398 — registered in the
processor file but unused by the shipped ST-LLM configs; provided here for
completeness of the processor inventory). Op set matches: Identity,
AutoContrast, Equalize, Brightness, Sharpness, ShearX/Y, TranslateX/Y,
Rotate, Posterize, Solarize, Color, Contrast.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np


def _cv2():
    import cv2

    return cv2


def identity(img, _):
    return img


def autocontrast(img, _):
    lo, hi = img.min(), img.max()
    if hi <= lo:
        return img
    scaled = (img.astype(np.float32) - lo) * (255.0 / (hi - lo))
    return scaled.clip(0, 255).astype(np.uint8)


def equalize(img, _):
    cv2 = _cv2()
    out = img.copy()
    for c in range(img.shape[-1]):
        out[..., c] = cv2.equalizeHist(img[..., c])
    return out


def brightness(img, level):
    return (img.astype(np.float32) * level).clip(0, 255).astype(np.uint8)


def sharpness(img, level):
    cv2 = _cv2()
    blurred = cv2.GaussianBlur(img, (3, 3), 0)
    out = img.astype(np.float32) * (1 + level) - blurred.astype(np.float32) * level
    return out.clip(0, 255).astype(np.uint8)


def _warp(img, m):
    cv2 = _cv2()
    h, w = img.shape[:2]
    return cv2.warpAffine(img, m[:2], (w, h), borderValue=(128, 128, 128))


def shear_x(img, level):
    return _warp(img, np.array([[1, level, 0], [0, 1, 0]], np.float32))


def shear_y(img, level):
    return _warp(img, np.array([[1, 0, 0], [level, 1, 0]], np.float32))


def translate_x(img, level):
    return _warp(img, np.array([[1, 0, level * img.shape[1]], [0, 1, 0]], np.float32))


def translate_y(img, level):
    return _warp(img, np.array([[1, 0, 0], [0, 1, level * img.shape[0]]], np.float32))


def rotate(img, degrees):
    cv2 = _cv2()
    h, w = img.shape[:2]
    m = cv2.getRotationMatrix2D((w / 2, h / 2), degrees, 1.0)
    return _warp(img, np.vstack([m, [0, 0, 1]]).astype(np.float32))


def posterize(img, bits):
    shift = 8 - int(bits)
    return np.left_shift(np.right_shift(img, shift), shift)


def solarize(img, thresh):
    return np.where(img < thresh, img, 255 - img).astype(np.uint8)


def color(img, level):
    gray = img.mean(axis=-1, keepdims=True)
    out = gray + (img.astype(np.float32) - gray) * level
    return out.clip(0, 255).astype(np.uint8)


def contrast(img, level):
    mean = img.mean()
    out = mean + (img.astype(np.float32) - mean) * level
    return out.clip(0, 255).astype(np.uint8)


# name -> (fn, magnitude range at level 10)
OPS = {
    "Identity": (identity, (0, 0)),
    "AutoContrast": (autocontrast, (0, 0)),
    "Equalize": (equalize, (0, 0)),
    "Brightness": (brightness, (0.6, 1.4)),
    "Sharpness": (sharpness, (0.0, 1.0)),
    "ShearX": (shear_x, (-0.3, 0.3)),
    "ShearY": (shear_y, (-0.3, 0.3)),
    "TranslateX": (translate_x, (-0.2, 0.2)),
    "TranslateY": (translate_y, (-0.2, 0.2)),
    "Rotate": (rotate, (-30, 30)),
    "Posterize": (posterize, (4, 8)),
    "Solarize": (solarize, (64, 256)),
    "Color": (color, (0.6, 1.4)),
    "Contrast": (contrast, (0.6, 1.4)),
}


class RandomAugment:
    """Pick N random ops at magnitude M in [0, 10] per image."""

    def __init__(self, n: int = 2, m: int = 9,
                 augs: Optional[Sequence[str]] = None,
                 seed: Optional[int] = None):
        self.n = n
        self.m = m
        self.augs = list(augs) if augs else list(OPS)
        self.rng = np.random.default_rng(seed)

    def _level(self, name: str) -> float:
        lo, hi = OPS[name][1]
        return lo + (hi - lo) * (self.m / 10.0)

    def _pick(self) -> List[Tuple[str, float]]:
        names = [self.augs[i] for i in
                 self.rng.integers(0, len(self.augs), self.n)]
        return [(n, self._level(n)) for n in names]

    def __call__(self, img: np.ndarray) -> np.ndarray:
        for name, level in self._pick():
            img = OPS[name][0](img, level)
        return img


class VideoRandomAugment(RandomAugment):
    """Same op sequence applied to every frame of a clip (T, H, W, C)."""

    def __call__(self, clip: np.ndarray) -> np.ndarray:
        ops = self._pick()
        out = []
        for frame in clip:
            f = frame
            for name, level in ops:
                f = OPS[name][0](f, level)
            out.append(f)
        return np.stack(out)
