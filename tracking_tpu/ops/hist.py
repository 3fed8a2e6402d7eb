"""Histogram equalization matching ``cv::equalizeHist``.

Used by the PreProcessor when ``equalizeHist`` is enabled
(``PreProcessor.cpp:65-66``). OpenCV semantics: build the 256-bin histogram,
find the first non-zero bin i0, scale = 255/(N − hist[i0]), lut[i] =
round(cumsum_{i0+1..i} · scale), lut[i0] = 0; apply the LUT.
"""

from __future__ import annotations

import jax.numpy as jnp


def equalize_hist(img: jnp.ndarray) -> jnp.ndarray:
    """Equalize a u8 image [..., H, W] (per-image over the last two dims)."""
    flat = img.reshape(img.shape[:-2] + (-1,)).astype(jnp.int32)
    n = flat.shape[-1]
    if img.ndim == 2:
        hist = jnp.zeros((256,), jnp.int32).at[flat].add(1)
    else:
        lead = 1
        for s in img.shape[:-2]:
            lead *= s
        flat2 = flat.reshape(lead, n)
        rows = jnp.repeat(jnp.arange(lead), n)
        hist = (
            jnp.zeros((lead, 256), jnp.int32)
            .at[rows, flat2.reshape(-1)]
            .add(1)
            .reshape(img.shape[:-2] + (256,))
        )

    cum = jnp.cumsum(hist, axis=-1)
    # first non-zero bin and its count
    nz = hist > 0
    i0 = jnp.argmax(nz, axis=-1)
    h0 = jnp.take_along_axis(hist, i0[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(n - h0, 1)
    scale = 255.0 / denom.astype(jnp.float32)
    cum0 = jnp.take_along_axis(cum, i0[..., None], axis=-1)  # cumsum up to i0
    lut_f = (cum - cum0).astype(jnp.float32) * scale[..., None]
    lut = jnp.clip(jnp.rint(lut_f), 0, 255).astype(jnp.uint8)
    # apply LUT
    if img.ndim == 2:
        return lut[flat].reshape(img.shape)
    lead = lut.shape[:-1]
    flatimg = img.reshape(-1, n).astype(jnp.int32)
    flatlut = lut.reshape(-1, 256)
    out = jnp.take_along_axis(flatlut, flatimg, axis=-1)
    return out.reshape(img.shape)
