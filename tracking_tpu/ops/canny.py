"""Canny edge detector (cv::Canny semantics, L1 gradient).

Used by MultiCue's ghost-region verification (``SJN_MultiCueBGS.cpp:996-1006``)
and exposed for the PreProcessor's (unused-in-reference) ``applyCanny``
(``PreProcessor.cpp:106-126``).

Pipeline: 3×3 Sobel (BORDER_REPLICATE), L1 magnitude |gx|+|gy| (OpenCV's
default L2gradient=false), 4-sector non-maximum suppression along the
gradient direction, double-threshold hysteresis (weak edges survive iff
8-connected to a strong edge — computed with the same log-depth line-sweep
reachability as ops.morphology.fill_holes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _sobel(gray_f: jnp.ndarray):
    p = jnp.pad(gray_f, 1, mode="edge")
    h, w = gray_f.shape

    def sl(dy, dx):
        return p[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]

    gx = (
        (sl(-1, 1) + 2 * sl(0, 1) + sl(1, 1))
        - (sl(-1, -1) + 2 * sl(0, -1) + sl(1, -1))
    )
    gy = (
        (sl(1, -1) + 2 * sl(1, 0) + sl(1, 1))
        - (sl(-1, -1) + 2 * sl(-1, 0) + sl(-1, 1))
    )
    return gx, gy


def canny(gray_u8: jnp.ndarray, low: float = 100.0, high: float = 150.0) -> jnp.ndarray:
    """u8 [H, W] → 0/255 u8 edge map."""
    g = gray_u8.astype(jnp.float32)
    gx, gy = _sobel(g)
    mag = jnp.abs(gx) + jnp.abs(gy)

    # sector of the gradient direction (0°, 45°, 90°, 135°), cv-style using
    # tan(22.5°)≈0.4142 boundaries on |gy|/|gx|
    ax, ay = jnp.abs(gx), jnp.abs(gy)
    t22 = 0.4142135623730951
    t67 = 2.414213562373095
    diag_sign = (gx * gy) >= 0  # same-sign → 135°-ish axis (y=x)
    sector_h = ay <= t22 * ax  # horizontal gradient → compare left/right
    sector_v = ay >= t67 * ax  # vertical gradient → compare up/down

    def shift(a, dy, dx):
        p = jnp.pad(a, 1, constant_values=0)
        h, w = a.shape
        return p[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]

    n_h = jnp.maximum(shift(mag, 0, 1), shift(mag, 0, -1))
    n_v = jnp.maximum(shift(mag, 1, 0), shift(mag, -1, 0))
    n_d1 = jnp.maximum(shift(mag, 1, 1), shift(mag, -1, -1))  # along y=x
    n_d2 = jnp.maximum(shift(mag, 1, -1), shift(mag, -1, 1))
    nmax = jnp.where(
        sector_h, n_h, jnp.where(sector_v, n_v, jnp.where(diag_sign, n_d1, n_d2))
    )
    is_peak = mag >= nmax

    strong = is_peak & (mag > high)
    weak = is_peak & (mag > low)

    # hysteresis: weak pixels reachable from strong through weak (8-conn)
    from tracking_tpu.ops.morphology import _shift_reduce

    se8 = np.ones((3, 3), bool)

    def body(state):
        reach, _ = state
        grown = (_shift_reduce(reach, se8, jnp.logical_or, False) | reach) & weak
        return grown, jnp.any(grown != reach)

    reach, _ = lax.while_loop(
        lambda s: s[1], body, (strong & weak, jnp.array(True))
    )
    return jnp.where(reach, jnp.uint8(255), jnp.uint8(0))
