"""Transform geometry tests (parity targets: clip4cir/data_utils.py:20-119)."""

import numpy as np
import pytest
from PIL import Image

from spn4cir_tpu.data.transforms import (
    CLIP_MEAN,
    CLIP_STD,
    ImageTransform,
    center_crop,
    deterministic_fiq_caption,
    generate_randomized_fiq_caption,
    resize_shortest,
    square_pad,
    target_pad,
)


def _img(w, h, seed=0):
    r = np.random.RandomState(seed)
    return Image.fromarray(r.randint(0, 256, (h, w, 3), dtype=np.uint8))


def test_square_pad_geometry():
    out = square_pad(_img(100, 60))
    assert out.size == (100, 100)
    arr = np.asarray(out)
    # original pasted at vp = int((100-60)/2) = 20
    assert (arr[:20] == 0).all() and (arr[80:] == 0).all()
    assert not (arr[20:80] == 0).all()


def test_target_pad_below_ratio_is_identity():
    img = _img(120, 100)  # ratio 1.2 < 1.25
    assert target_pad(img, 1.25) is img


def test_target_pad_geometry():
    img = _img(200, 100)  # ratio 2.0 >= 1.25
    out = target_pad(img, 1.25)
    # scaled_max_wh = 200/1.25 = 160; hp = 0 (160-200 < 0), vp = int(30) = 30
    assert out.size == (200, 160)


def test_resize_shortest_truncation_semantics():
    # torchvision uses int() truncation for the long side
    out = resize_shortest(_img(123, 457), 224)
    assert out.size == (224, int(224 * 457 / 123))
    out = resize_shortest(_img(457, 123), 224)
    assert out.size == (int(224 * 457 / 123), 224)


def test_center_crop_square():
    out = center_crop(_img(300, 250), 224)
    assert out.size == (224, 224)


def test_full_pipeline_shapes_and_normalization():
    for kind in ("clip", "squarepad", "targetpad"):
        tf = ImageTransform(kind, 288)
        arr = tf(_img(640, 480))
        assert arr.shape == (288, 288, 3)
        assert arr.dtype == np.float32
    # a constant-0 (black) image must map exactly to -mean/std
    black = Image.fromarray(np.zeros((64, 64, 3), np.uint8))
    arr = ImageTransform("clip", 64)(black)
    expected = -np.asarray(CLIP_MEAN) / np.asarray(CLIP_STD)
    np.testing.assert_allclose(arr[0, 0], expected, rtol=1e-5)


def test_fiq_caption_branches():
    caps = ["is shorter.", " more blue?"]
    assert generate_randomized_fiq_caption(caps, type=0) == "is shorter and more blue"
    assert generate_randomized_fiq_caption(caps, type=1) == "more blue and is shorter"
    assert generate_randomized_fiq_caption(caps, type=2) == "is shorter"
    assert generate_randomized_fiq_caption(caps, type=3) == "more blue"
    assert deterministic_fiq_caption(caps) == "is shorter and more blue"


def test_fiq_caption_rng_isolation():
    import random

    caps = ["a", "b"]
    r1, r2 = random.Random(7), random.Random(7)
    assert generate_randomized_fiq_caption(caps, rng=r1) == generate_randomized_fiq_caption(caps, rng=r2)
