"""Color / dtype conversion primitives matching OpenCV's numeric behavior.

The reference leans on three OpenCV numeric idioms everywhere
(e.g. ``package_bgs/FrameDifferenceBGS.cpp:45-51``,
``AdaptiveBackgroundLearning.cpp:43-65``):

- ``cv::absdiff`` on u8,
- ``convertTo(CV_8U, 255.0)`` = saturating round-half-to-even,
- ``cv::cvtColor(BGR2GRAY)`` = Rec.601 luma in Q14 fixed point.

These are reproduced bit-exactly so golden-mask tests can gate at IoU≈1.0 for
the deterministic algorithms. All functions are shape-polymorphic pure jnp and
vmap/scan-safe.
"""

from __future__ import annotations

import jax.numpy as jnp

# OpenCV Rec.601 Q15 fixed-point luma coefficients (B, G, R order to match the
# reference's BGR frame layout). Verified bit-exact against cv2 5.0 by
# exhaustive probe (see tests/test_ops.py::test_bgr2gray_matches_cv2).
_B_Q15 = 3735
_G_Q15 = 19235
_R_Q15 = 9798
_HALF_Q15 = 1 << 14


def bgr2gray_u8(img: jnp.ndarray) -> jnp.ndarray:
    """BGR u8 [..., H, W, 3] → gray u8 [..., H, W], OpenCV-bit-exact.

    gray = (B*3735 + G*19235 + R*9798 + 2^14) >> 15  (Q15 Rec.601).
    Passing an already-gray [..., H, W] or [..., H, W, 1] array is a no-op.
    """
    if img.ndim >= 3 and img.shape[-1] == 3:
        b = img[..., 0].astype(jnp.int32)
        g = img[..., 1].astype(jnp.int32)
        r = img[..., 2].astype(jnp.int32)
        y = (b * _B_Q15 + g * _G_Q15 + r * _R_Q15 + _HALF_Q15) >> 15
        return y.astype(jnp.uint8)
    if img.ndim >= 3 and img.shape[-1] == 1:
        return img[..., 0]
    return img


def to_unit_f32(img_u8: jnp.ndarray) -> jnp.ndarray:
    """u8 → f32 in [0,1]; ``convertTo(CV_32F, 1./255.)``."""
    return img_u8.astype(jnp.float32) * (1.0 / 255.0)


def to_u8(img_f: jnp.ndarray, scale: float = 255.0) -> jnp.ndarray:
    """f32 → u8 with saturate_cast(cvRound(x*scale)) semantics.

    cvRound is round-half-to-even (x86 rint), which jnp.rint matches.
    """
    x = jnp.rint(img_f * scale)
    return jnp.clip(x, 0.0, 255.0).astype(jnp.uint8)


def absdiff_u8(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """``cv::absdiff`` for u8 operands (exact, no wraparound)."""
    d = a.astype(jnp.int16) - b.astype(jnp.int16)
    return jnp.abs(d).astype(jnp.uint8)
