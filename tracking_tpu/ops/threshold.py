"""Thresholding, matching ``cv::threshold(..., THRESH_BINARY)``: strictly-greater."""

from __future__ import annotations

import jax.numpy as jnp


def threshold_binary(img: jnp.ndarray, thresh, maxval: int = 255) -> jnp.ndarray:
    """dst = maxval if src > thresh else 0  (u8 output).

    Matches ``cv::threshold(src, dst, thresh, 255, THRESH_BINARY)`` used by
    nearly every wrapper in the reference (e.g. ``FrameDifferenceBGS.cpp:51``).
    ``thresh`` may be a scalar or a per-pixel array (adaptive-R algorithms).
    """
    return jnp.where(img > thresh, jnp.uint8(maxval), jnp.uint8(0))
