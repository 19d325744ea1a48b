"""Attention-map overlay visualization (reference: stllm/common/gradcam.py:7-24
— getAttMap; unused by the main ST-LLM path, provided for inventory parity).

Implemented with cv2 + scipy only (no matplotlib/skimage): bicubic upsample,
optional Gaussian blur, jet colormap, alpha-blended overlay.
"""

from __future__ import annotations

import numpy as np


def get_att_map(img: np.ndarray, att_map: np.ndarray, blur: bool = True,
                overlap: bool = True) -> np.ndarray:
    """img: (H, W, 3) float in [0,1]; att_map: (h, w) arbitrary scale.
    Returns the (H, W, 3) overlay in [0,1]."""
    import cv2
    from scipy.ndimage import gaussian_filter

    att = att_map.astype(np.float32)
    att -= att.min()
    if att.max() > 0:
        att /= att.max()
    h, w = img.shape[:2]
    att = cv2.resize(att, (w, h), interpolation=cv2.INTER_CUBIC)
    if blur:
        att = gaussian_filter(att, 0.02 * max(h, w))
        att -= att.min()
        if att.max() > 0:
            att /= att.max()
    heat = cv2.applyColorMap((att * 255).astype(np.uint8), cv2.COLORMAP_JET)
    heat = cv2.cvtColor(heat, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
    if overlap:
        a = (att ** 0.7)[..., None]
        return (1 - a) * img + a * heat
    return heat
