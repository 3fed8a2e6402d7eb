"""Fuzzy utilities — tb/FuzzyUtils.cpp + tb/PixelUtils.cpp equivalents.

Implements the *effective* semantics of the reference (several of its branch
arms are dead code):

- :func:`fuzzy_lbp` — ``FuzzyUtils::LBP`` (``FuzzyUtils.cpp:23-164``). In the
  reference only the interior double loop and the (0,0)-corner branch ever
  execute (the local ``x``/``y`` are pinned to 0, so every other border branch
  is statically false); all other border pixels keep the caller's 0 fill.
  Interior: 8-neighbor ``>=``-center bits weighted
  [1,2,4,8,(0),16,32,64,128] in the reference's neighbor order, summed /255.
- :func:`similarity_ratio` — ``FuzzyUtils::RatioPixels``
  (``FuzzyUtils.cpp:262-289``): min(a,b)/max(a,b) with the exact branch
  structure (equal → 1, including 0/0).
- :func:`sugeno_integral` / :func:`choquet_integral` —
  ``FuzzyUtils.cpp:291-411``. The reference's ``Indice`` permutation array is
  never re-initialized between pixels, chaining permutations across the
  column-major pixel walk — a sequential bug with no parallel meaning; we
  implement the documented intent (indices reset per pixel, comment at
  ``FuzzyUtils.cpp:428-430``).
- :func:`color_convert_f32` — ``PixelUtils::ColorConversion``
  (``PixelUtils.cpp:41-67``): 1=RGB copy, 2=Ohta (on BGR data, so "R" is the
  blue channel — faithful), 3=HSV, 4=YCrCb (OpenCV float-path formulas).
"""

from __future__ import annotations

import jax.numpy as jnp

# Interior neighbor order of getNeighberhoodGrayPixel (PixelUtils.cpp:238-251):
# (col+1,row-1),(col+1,row),(col+1,row+1),(col,row-1),center,(col,row+1),
# (col-1,row-1),(col-1,row),(col-1,row+1) — weights CarreExp (FuzzyUtils.cpp:37-45).
_NEIGHBORS = [  # (drow, dcol, weight)
    (-1, 1, 1.0), (0, 1, 2.0), (1, 1, 4.0), (-1, 0, 8.0),
    (1, 0, 16.0), (-1, -1, 32.0), (0, -1, 64.0), (1, -1, 128.0),
]


def fuzzy_lbp(gray_f: jnp.ndarray) -> jnp.ndarray:
    """[H, W] f32 gray → [H, W] f32 LBP in [0, 1]. Borders 0 except (0,0)."""
    h, w = gray_f.shape
    acc = jnp.zeros_like(gray_f)
    for dr, dc, wt in _NEIGHBORS:
        nb = jnp.roll(gray_f, shift=(-dr, -dc), axis=(0, 1))
        acc = acc + wt * (nb >= gray_f).astype(jnp.float32)
    out = jnp.zeros_like(gray_f)
    out = out.at[1 : h - 1, 1 : w - 1].set(acc[1 : h - 1, 1 : w - 1] / 255.0)
    # Corner (0,0) (FuzzyUtils.cpp:50-57): 2·(I(1,0)≥I) + 4·(I(0,1)≥I) + 8·(I(1,1)≥I)
    c = (
        2.0 * (gray_f[1, 0] >= gray_f[0, 0])
        + 4.0 * (gray_f[0, 1] >= gray_f[0, 0])
        + 8.0 * (gray_f[1, 1] >= gray_f[0, 0])
    ) / 255.0
    return out.at[0, 0].set(c)


def similarity_ratio(cur: jnp.ndarray, bg: jnp.ndarray) -> jnp.ndarray:
    """Elementwise RatioPixels: cur<bg → cur/bg; cur>bg → bg/cur; equal → 1."""
    return jnp.where(cur == bg, 1.0, jnp.where(cur < bg, cur / bg, bg / cur))


def color_convert_f32(bgr_f: jnp.ndarray, color_space: int) -> jnp.ndarray:
    """[H, W, 3] f32 BGR in [0,1] → converted 3-channel image."""
    b, g, r = bgr_f[..., 0], bgr_f[..., 1], bgr_f[..., 2]
    if color_space == 1:  # RGB: copy
        return bgr_f
    if color_space == 2:  # Ohta computed on raw channel order (B,G,R)
        i1 = (b + g + r) / 3.0
        i2 = (b - r) / 2.0
        i3 = (2.0 * g - b - r) / 4.0
        return jnp.stack([i1, i2, i3], axis=-1)
    if color_space == 3:  # OpenCV BGR2HSV float: H∈[0,360), S,V∈[0,1]
        v = jnp.maximum(jnp.maximum(b, g), r)
        mn = jnp.minimum(jnp.minimum(b, g), r)
        diff = v - mn
        s = jnp.where(v > 0, diff / jnp.maximum(v, 1e-20), 0.0)
        safe = jnp.maximum(diff, 1e-20)
        hr = jnp.where(v == r, 60.0 * (g - b) / safe, 0.0)
        hg = jnp.where((v == g) & (v != r), 120.0 + 60.0 * (b - r) / safe, 0.0)
        hb = jnp.where((v == b) & (v != r) & (v != g), 240.0 + 60.0 * (r - g) / safe, 0.0)
        hh = jnp.where(diff == 0, 0.0, hr + hg + hb)
        hh = jnp.where(hh < 0, hh + 360.0, hh)
        return jnp.stack([hh, s, v], axis=-1)
    if color_space == 4:  # OpenCV BGR2YCrCb float: delta = 0.5
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cr = (r - y) * 0.713 + 0.5
        cb = (b - y) * 0.564 + 0.5
        return jnp.stack([y, cr, cb], axis=-1)
    raise ValueError(f"unknown color space {color_space}")


def _integral_terms(hi: jnp.ndarray, g: tuple):
    """Shared gather-free front half of both integrals.

    Sorts the 3 criteria descending with a stable compare-exchange network
    (strict-< swaps = the reference's bubble sort, FuzzyUtils.cpp:431-457)
    carrying the original indices as payload, then resolves the two
    index-dependent lookups as 3-way select chains. The previous
    argsort + take_along_axis + fancy-index formulation cost three
    per-pixel [H, W, 3] gathers ≈ 75 ms/frame at 720p on TPU (measured
    11.7 fps for the whole algorithm).

    Faithful quirk kept: ``Integral[k] = f(HI_sorted[Indice[k]], ·)``
    indexes the *sorted* array by the original-position values (not
    ``HI_sorted[k]``; FuzzyUtils.cpp:473-484)."""
    v = [hi[..., 0], hi[..., 1], hi[..., 2]]
    ix = [jnp.full(v[0].shape, k, jnp.int32) for k in range(3)]
    for i, j in ((0, 1), (1, 2), (0, 1)):
        swap = v[i] < v[j]
        v[i], v[j] = jnp.where(swap, v[j], v[i]), jnp.where(swap, v[i], v[j])
        ix[i], ix[j] = (
            jnp.where(swap, ix[j], ix[i]),
            jnp.where(swap, ix[i], ix[j]),
        )

    def sel_v(idx):  # HI_sorted[idx]
        return jnp.where(idx == 0, v[0], jnp.where(idx == 1, v[1], v[2]))

    def sel_g(idx):  # g[idx]
        return jnp.where(
            idx == 0,
            jnp.float32(g[0]),
            jnp.where(idx == 1, jnp.float32(g[1]), jnp.float32(g[2])),
        )

    hperm = [sel_v(ix[k]) for k in range(3)]
    g_idx = [sel_g(ix[k]) for k in range(3)]
    return hperm, g_idx


def sugeno_integral(hi: jnp.ndarray, g: tuple) -> jnp.ndarray:
    """[..., 3] criteria → [...] Sugeno integral (FuzzyUtils.cpp:291-344).

    The final ``max`` folds in an initial 0 (FuzzyUtils.cpp:473-484)."""
    hperm, g_idx = _integral_terms(hi, g)
    xixj = g_idx[1] + g_idx[2]
    i0 = jnp.minimum(hperm[0], 1.0)
    i1 = jnp.minimum(hperm[1], xixj)
    i2 = jnp.minimum(hperm[2], g_idx[2])
    return jnp.maximum(jnp.maximum(jnp.maximum(i0, i1), i2), 0.0)


def choquet_integral(hi: jnp.ndarray, g: tuple) -> jnp.ndarray:
    """[..., 3] criteria → [...] Choquet integral (FuzzyUtils.cpp:346-411)."""
    hperm, g_idx = _integral_terms(hi, g)
    xixj = g_idx[1] + g_idx[2]
    return (
        hperm[0] * (1.0 - xixj)
        + hperm[1] * (xixj - g_idx[2])
        + hperm[2] * g_idx[2]
    )
