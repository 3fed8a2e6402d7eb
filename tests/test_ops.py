"""Image-op kernels vs OpenCV oracles."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from tracking_tpu.ops import (
    absdiff_u8,
    bgr2gray_u8,
    box_filter,
    dilate,
    erode,
    fill_holes,
    gaussian_blur,
    median_blur,
    morph_close,
    threshold_binary,
    to_u8,
    to_unit_f32,
)


@pytest.fixture(scope="module")
def img(rng):
    return rng.integers(0, 256, size=(64, 80, 3), dtype=np.uint8)


@pytest.fixture(scope="module")
def gray(rng):
    return rng.integers(0, 256, size=(64, 80), dtype=np.uint8)


def test_bgr2gray_matches_cv2(img):
    ours = np.asarray(bgr2gray_u8(jnp.asarray(img)))
    ref = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    np.testing.assert_array_equal(ours, ref)


def test_absdiff_matches_cv2(rng, img):
    other = rng.integers(0, 256, size=img.shape, dtype=np.uint8)
    ours = np.asarray(absdiff_u8(jnp.asarray(img), jnp.asarray(other)))
    np.testing.assert_array_equal(ours, cv2.absdiff(img, other))


def test_threshold_matches_cv2(gray):
    ours = np.asarray(threshold_binary(jnp.asarray(gray), 15))
    _, ref = cv2.threshold(gray, 15, 255, cv2.THRESH_BINARY)
    np.testing.assert_array_equal(ours, ref)


def test_to_u8_round_half_even():
    x = jnp.array([0.5, 1.5, 2.5, -1.0, 300.0]) / 255.0
    out = np.asarray(to_u8(x))
    # cvRound: 0.5→0, 1.5→2, 2.5→2 (half to even); saturate at [0,255]
    np.testing.assert_array_equal(out, [0, 2, 2, 0, 255])


def test_unit_roundtrip(gray):
    out = np.asarray(to_u8(to_unit_f32(jnp.asarray(gray))))
    np.testing.assert_array_equal(out, gray)


def test_gaussian_blur_close_to_cv2(gray):
    ours = np.asarray(gaussian_blur(jnp.asarray(gray), 7, 1.5)).astype(np.int16)
    ref = cv2.GaussianBlur(gray, (7, 7), 1.5).astype(np.int16)
    assert np.abs(ours - ref).max() <= 1  # fixed-point vs float rounding


def test_gaussian_blur_color_shape(img):
    out = gaussian_blur(jnp.asarray(img), 7, 1.5)
    assert out.shape == img.shape and out.dtype == jnp.uint8


@pytest.mark.parametrize("k", [3, 5])
def test_median_blur_matches_cv2(gray, k):
    ours = np.asarray(median_blur(jnp.asarray(gray), k))
    ref = cv2.medianBlur(gray, k)
    # Interior must be exact; cv2's border handling for k=5 differs subtly.
    b = k // 2
    np.testing.assert_array_equal(ours[b:-b, b:-b], ref[b:-b, b:-b])


@pytest.mark.parametrize("k", [3, 5])
def test_erode_dilate_match_cv2(gray, k):
    se = np.ones((k, k), np.uint8)
    np.testing.assert_array_equal(
        np.asarray(erode(jnp.asarray(gray), k)), cv2.erode(gray, se)
    )
    np.testing.assert_array_equal(
        np.asarray(dilate(jnp.asarray(gray), k)), cv2.dilate(gray, se)
    )


def test_morph_close_matches_cv2(gray):
    mask = ((gray > 128).astype(np.uint8)) * 255
    se = np.ones((3, 3), np.uint8)
    ref = cv2.morphologyEx(mask, cv2.MORPH_CLOSE, se)
    ours = np.asarray(morph_close(jnp.asarray(mask), 3))
    np.testing.assert_array_equal(ours, ref)


def test_box_filter_mean():
    x = np.arange(25, dtype=np.uint8).reshape(5, 5)
    out = np.asarray(box_filter(jnp.asarray(x), 3))
    ref = cv2.blur(x.astype(np.float32), (3, 3), borderType=cv2.BORDER_REFLECT_101)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_fill_holes():
    mask = np.zeros((16, 16), np.uint8)
    mask[3:10, 3:10] = 255
    mask[5:8, 5:8] = 0  # enclosed hole
    mask[12:16, 12:16] = 255  # touches border: its inside isn't a hole
    out = np.asarray(fill_holes(jnp.asarray(mask)))
    expected = mask.copy()
    expected[5:8, 5:8] = 255
    np.testing.assert_array_equal(out, expected)
