"""Image op parity vs OpenCV: Lanczos resize, grayscale, SBS split."""

import cv2
import numpy as np
import pytest

from video3d_tpu.ops.image import (
    resize2d,
    resize_width,
    rgb_to_gray,
    split_sbs,
    unsqueeze_width,
)


def _smooth_image(rng, h, w, c=None):
    shape = (h, w) if c is None else (h, w, c)
    img = rng.standard_normal(shape)
    img = cv2.GaussianBlur(img.astype(np.float32), (7, 7), 2.0)
    img = (img - img.min()) / (img.max() - img.min() + 1e-9) * 255
    return img.astype(np.uint8).reshape(shape)


def test_unsqueeze_matches_cv2_lanczos4(rng):
    img = _smooth_image(rng, 64, 48)
    ours = np.asarray(unsqueeze_width(img.astype(np.float32)))
    ref = cv2.resize(
        img.astype(np.float32), (96, 64), interpolation=cv2.INTER_LANCZOS4
    )
    # identical tap weights; differences only from clamp handling at borders
    interior = np.abs(ours[:, 8:-8] - ref[:, 8:-8])
    assert interior.max() < 0.75
    assert np.abs(ours - ref).mean() < 0.5


def test_downscale_matches_cv2_bilinear_center(rng):
    img = _smooth_image(rng, 64, 96).astype(np.float32)
    ours = np.asarray(resize2d(img, 32, 48, method="bilinear"))
    ref = cv2.resize(img, (48, 32), interpolation=cv2.INTER_LINEAR)
    assert np.abs(ours - ref).max() < 2.5  # cv2 downscale averages taps
    assert np.abs(ours - ref).mean() < 0.6


def test_upscale_2x_bilinear_matches_cv2(rng):
    img = _smooth_image(rng, 32, 48).astype(np.float32)
    ours = np.asarray(resize2d(img, 64, 96, method="bilinear"))
    ref = cv2.resize(img, (96, 64), interpolation=cv2.INTER_LINEAR)
    assert np.abs(ours - ref).max() < 0.01


def test_resize_batched_consistent(rng):
    batch = rng.standard_normal((3, 24, 32)).astype(np.float32)
    out = np.asarray(resize_width(batch, 64))
    single = np.asarray(resize_width(batch[1], 64))
    assert out.shape == (3, 24, 64)
    np.testing.assert_allclose(out[1], single, rtol=1e-5, atol=1e-5)


def test_rgb_to_gray_matches_cv2(rng):
    img = _smooth_image(rng, 32, 40, 3)
    ours = np.asarray(rgb_to_gray(img.astype(np.float32)))
    ref = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY).astype(np.float32)
    assert np.abs(ours - ref).max() <= 1.0  # cv2 rounds to uint8


def test_split_sbs_channel_last(rng):
    frames = rng.integers(0, 255, (2, 16, 20, 3), np.uint8)
    left, right = split_sbs(frames)
    assert left.shape == (2, 16, 10, 3)
    np.testing.assert_array_equal(np.asarray(left), frames[:, :, :10])
    np.testing.assert_array_equal(np.asarray(right), frames[:, :, 10:])


def test_split_sbs_grayscale(rng):
    frames = rng.standard_normal((2, 16, 20)).astype(np.float32)
    left, right = split_sbs(frames)
    assert left.shape == (2, 16, 10)
    np.testing.assert_array_equal(np.asarray(right), frames[:, :, 10:])


def test_split_sbs_odd_width_raises(rng):
    with pytest.raises(ValueError):
        split_sbs(np.zeros((16, 21), np.float32))
