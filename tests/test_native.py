"""Native imgproc library: build, numpy parity, batch correctness."""

import numpy as np
import pytest

from multimodal_scene_text_recognition_tpu.utils.native import (
    crop_resize_gray_batch,
    have_native,
)

RNG = np.random.default_rng(7)


def make_inputs(n=5):
    shapes = [(480, 640), (100, 200), (33, 50), (64, 64), (240, 320)][:n]
    imgs = [RNG.integers(0, 256, s, dtype=np.uint8) for s in shapes]
    boxes = np.stack(
        [
            np.array(
                [RNG.uniform(0, s[1] / 2), RNG.uniform(0, s[0] / 2),
                 RNG.uniform(5, s[1] / 2), RNG.uniform(5, s[0] / 2)],
                np.float32,
            )
            for s in shapes
        ]
    )
    return imgs, boxes


def test_numpy_fallback_shape_and_range():
    imgs, boxes = make_inputs()
    out = crop_resize_gray_batch(imgs, boxes, force_numpy=True)
    assert out.shape == (5, 32, 100, 1)
    assert out.min() >= 0.0 and out.max() <= 1.0


@pytest.mark.skipif(not have_native(), reason="native lib unavailable")
def test_native_matches_numpy():
    imgs, boxes = make_inputs()
    a = crop_resize_gray_batch(imgs, boxes)
    b = crop_resize_gray_batch(imgs, boxes, force_numpy=True)
    # float32 accumulation order differs between the C++ and numpy paths;
    # 1e-4 is far below the 1/255 quantisation step
    np.testing.assert_allclose(a, b, atol=1e-4)


@pytest.mark.skipif(not have_native(), reason="native lib unavailable")
def test_native_single_thread_matches_multi():
    imgs, boxes = make_inputs()
    a = crop_resize_gray_batch(imgs, boxes, threads=1)
    b = crop_resize_gray_batch(imgs, boxes, threads=8)
    np.testing.assert_array_equal(a, b)


def test_constant_image_resizes_to_constant():
    img = np.full((50, 80), 128, np.uint8)
    out = crop_resize_gray_batch([img], np.array([[10, 10, 40, 20]], np.float32))
    np.testing.assert_allclose(out, 128 / 255.0, atol=1e-6)
