"""Binary/grayscale morphology + hole filling.

Replaces the reference's ``cv::erode/dilate/morphologyEx/floodFill`` chain used
by SuBSENSE post-processing (``pl/BackgroundSubtractorSuBSENSE.cpp:624-639``)
and the blob-detection cleanup.

TPU design: erode/dilate are min/max over statically-unrolled shifted slices
(VPU-friendly, fuse into one pass). Hole filling — OpenCV does a sequential
``floodFill`` from the border — is reformulated as *border-connected background
propagation*: a fixed-point iteration of masked 3×3 dilations seeded at the
image border (``lax.while_loop`` with a global convergence check); pixels never
reached are holes and get filled.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _rect_se(ksize) -> np.ndarray:
    if isinstance(ksize, int):
        ksize = (ksize, ksize)
    return np.ones(ksize, dtype=bool)


def _shift_reduce(img: jnp.ndarray, se: np.ndarray, reducer, pad_value) -> jnp.ndarray:
    """reduce over SE-shaped neighborhood via shifted slices of a padded array."""
    kh, kw = se.shape
    rh, rw = kh // 2, kw // 2
    pad = [(0, 0)] * img.ndim
    h_ax, w_ax = img.ndim - 2, img.ndim - 1
    pad[h_ax] = (rh, rh)
    pad[w_ax] = (rw, rw)
    x = jnp.pad(img, pad, mode="constant", constant_values=pad_value)
    H, W = img.shape[h_ax], img.shape[w_ax]
    out = None
    for dy in range(kh):
        for dx in range(kw):
            if not se[dy, dx]:
                continue
            sl = [slice(None)] * img.ndim
            sl[h_ax] = slice(dy, dy + H)
            sl[w_ax] = slice(dx, dx + W)
            v = x[tuple(sl)]
            out = v if out is None else reducer(out, v)
    return out


def _separable_rect(img: jnp.ndarray, se: np.ndarray, reducer, pad_value):
    """Full-rect SEs factor into a row pass then a column pass (kh+kw shifts
    instead of kh·kw)."""
    kh, kw = se.shape
    row_se = np.ones((kh, 1), bool)
    col_se = np.ones((1, kw), bool)
    return _shift_reduce(
        _shift_reduce(img, row_se, reducer, pad_value), col_se, reducer, pad_value
    )


def erode(img: jnp.ndarray, ksize=3, se: np.ndarray | None = None) -> jnp.ndarray:
    """Grayscale/binary erosion; border value = max (OpenCV default: border
    pixels do not erode)."""
    se = _rect_se(ksize) if se is None else se
    pad_val = 255 if img.dtype == jnp.uint8 else jnp.inf
    if se.all() and min(se.shape) > 1:
        return _separable_rect(img, se, jnp.minimum, pad_val)
    return _shift_reduce(img, se, jnp.minimum, pad_val)


def dilate(img: jnp.ndarray, ksize=3, se: np.ndarray | None = None) -> jnp.ndarray:
    """Grayscale/binary dilation; border value = min."""
    se = _rect_se(ksize) if se is None else se
    pad_val = 0 if img.dtype == jnp.uint8 else -jnp.inf
    if se.all() and min(se.shape) > 1:
        return _separable_rect(img, se, jnp.maximum, pad_val)
    return _shift_reduce(img, se, jnp.maximum, pad_val)


def morph_open(img: jnp.ndarray, ksize=3, se: np.ndarray | None = None) -> jnp.ndarray:
    return dilate(erode(img, ksize, se), ksize, se)


def morph_close(img: jnp.ndarray, ksize=3, se: np.ndarray | None = None) -> jnp.ndarray:
    return erode(dilate(img, ksize, se), ksize, se)


def _masked_or_scan(reach: jnp.ndarray, bg: jnp.ndarray, axis: int, reverse: bool):
    """Directional reachability: y_j = bg_j & (reach_j | y_{j−1}) along `axis`.

    The recurrence is the affine-boolean transform T_j(x) = (x & p_j) | q_j
    with p = bg, q = reach & bg; transforms compose associatively
    ((p1,q1)∘(p2,q2) = (p1&p2, (q1&p2)|q2)), so the whole line propagates in
    one log-depth ``associative_scan`` instead of length-many shift steps.
    """
    def op(a, b):
        return a[0] & b[0], (a[1] & b[0]) | b[1]

    _, y = jax.lax.associative_scan(
        op, (bg, reach & bg), axis=axis, reverse=reverse
    )
    return y


@partial(jax.jit, static_argnames=("seed",))
def fill_holes(mask_u8: jnp.ndarray, seed: str = "border") -> jnp.ndarray:
    """Fill background regions unreachable from the seed (floodfill parity).

    mask_u8: binary u8 mask [H, W] (255 = foreground). Background pixels
    (0) not reachable from the seed through other background pixels
    (4-connectivity, as ``cv::floodFill`` default) become foreground.

    seed="border": all border background pixels (generic hole filling).
    seed="corner": only pixel (0, 0) — exact parity with SuBSENSE's
    ``cv::floodFill(mask, Point(0,0), 255)`` (``BackgroundSubtractorSuBSENSE
    .cpp:630``), where bg regions touching only other borders count as holes.

    Reachability is computed by alternating 4-directional line sweeps (each a
    log-depth associative scan over whole rows/columns) to a fixed point —
    the iteration count is the mask's "spiral depth" (1-2 for real masks),
    not its pixel diameter.
    """
    fg = mask_u8 > 0
    seeds = jnp.zeros(mask_u8.shape, dtype=bool)
    if seed == "corner":
        seeds = seeds.at[..., 0, 0].set(True)
    else:
        seeds = seeds.at[..., 0, :].set(True)
        seeds = seeds.at[..., -1, :].set(True)
        seeds = seeds.at[..., :, 0].set(True)
        seeds = seeds.at[..., :, -1].set(True)
    bg = ~fg
    reach0 = seeds & bg
    h_ax, w_ax = mask_u8.ndim - 2, mask_u8.ndim - 1

    reach = reach_fixpoint(bg, reach0)
    filled = fg | ~reach
    return jnp.where(filled, jnp.uint8(255), jnp.uint8(0))


def reach_fixpoint(bg: jnp.ndarray, reach0: jnp.ndarray) -> jnp.ndarray:
    """4-connected reachability fixpoint: grow ``reach0`` through ``bg``
    pixels until no change (the flood-fill core, shared by :func:`fill_holes`
    and the spatially-sharded fill in parallel/spatial.py)."""
    h_ax, w_ax = bg.ndim - 2, bg.ndim - 1

    # TPU fast path: sequential tile-raster propagation in a Pallas kernel
    # (ops/pallas_fill) — one forward+backward pass instead of dozens of
    # full-map line sweeps (measured 8.5 ms → ~1 ms at 720p). Exact: an
    # outer while_loop runs rounds to the same fixed point.
    if jax.default_backend() == "tpu" and bg.ndim == 2:
        from tracking_tpu.ops.pallas_fill import flood_reach_pallas

        return flood_reach_pallas(bg, reach0)

    def body(state):
        reach, _, i = state
        r = reach
        r = r | _masked_or_scan(r, bg, w_ax, False)
        r = r | _masked_or_scan(r, bg, w_ax, True)
        r = r | _masked_or_scan(r, bg, h_ax, False)
        r = r | _masked_or_scan(r, bg, h_ax, True)
        return r, jnp.any(r != reach), i + 1

    def cond(state):
        # cap at 32 sweeps: each sweep resolves one level of spiral nesting;
        # natural masks converge in 1-2 (pathological noise masks would
        # otherwise dominate the frame budget)
        return state[1] & (state[2] < 32)

    reach, _, _ = jax.lax.while_loop(
        cond, body, (reach0, jnp.array(True), jnp.zeros((), jnp.int32))
    )
    return reach
