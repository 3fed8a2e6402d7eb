"""VuMeter — ustc type 31 (Robinault & Vacavant per-pixel intensity histogram).

Reference: ``package_bgs/av/TBackgroundVuMeter.cpp:260-319`` + wrapper
``av/VuMeter.cpp:33-85``. Per gray pixel, a 256/binSize-bin histogram decays by
α each frame; the current intensity's bin gains (1−α); FG where that bin's
mass < threshold; the background image pixel is replaced by the current pixel
when the current bin outweighs the background pixel's bin. First 5 frames emit
empty masks; the wrapper optionally erodes + median-blurs (enableFilter).

Faithful quirk: the wrapper converts with ``CV_RGB2GRAY`` on BGR data
(``VuMeter.cpp:49``), i.e. R/B-swapped luma weights — reproduced.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from tracking_tpu.bgs.base import BGSAlgorithm, State, StepResult
from tracking_tpu.core.config import BGSConfig
from tracking_tpu.core.registry import register
from tracking_tpu.ops.filters import binary_median_blur
from tracking_tpu.ops.morphology import erode


def _swapped_gray(frame: jnp.ndarray) -> jnp.ndarray:
    """cvtColor(CV_RGB2GRAY) applied to BGR data: weights with R/B swapped."""
    if frame.ndim == 2:
        return frame
    b = frame[..., 0].astype(jnp.int32)
    g = frame[..., 1].astype(jnp.int32)
    r = frame[..., 2].astype(jnp.int32)
    # Q15 Rec.601 with the R coefficient applied to B and vice versa
    y = (b * 9798 + g * 19235 + r * 3735 + (1 << 14)) >> 15
    return y.astype(jnp.uint8)


@dataclasses.dataclass(frozen=True)
class VuMeterConfig(BGSConfig):
    enableFilter: bool = True
    binSize: int = 8
    alpha: float = 0.995
    threshold: float = 0.03
    showOutput: bool = True


@register("VuMeter", type_id=31, aliases=("vumeter",))
class VuMeter(BGSAlgorithm):
    Config = VuMeterConfig

    def init(self, h: int, w: int, c: int = 3) -> State:
        bins = 256 // self.config.binSize
        return {
            "t": jnp.zeros((), jnp.int32),
            "hist": jnp.zeros((bins, h, w), jnp.float32),
            "bg": jnp.zeros((h, w), jnp.uint8),
        }

    def step(self, state: State, frame: jnp.ndarray) -> StepResult:
        cfg = self.config
        bins = 256 // cfg.binSize
        gray = _swapped_gray(frame)
        t = state["t"]
        bg = self._first_frame_select(t, state["bg"], gray)

        hist = state["hist"] * cfg.alpha
        bin_idx = jnp.clip(gray.astype(jnp.int32) // cfg.binSize, 0, bins - 1)
        onehot = bin_idx[None] == jnp.arange(bins)[:, None, None]
        hist = hist + jnp.where(onehot, 1.0 - cfg.alpha, 0.0)

        # one-hot reductions over the (static) bin axis — take_along_axis is
        # a per-pixel gather, ~25 ms/frame each at 720p on TPU
        cur_mass = sum(
            jnp.where(bin_idx == b, hist[b], 0.0) for b in range(bins)
        )
        fg = jnp.where(cur_mass < cfg.threshold, jnp.uint8(255), jnp.uint8(0))

        bg_bin = jnp.clip(bg.astype(jnp.int32) // cfg.binSize, 0, bins - 1)
        bg_mass = sum(
            jnp.where(bg_bin == b, hist[b], 0.0) for b in range(bins)
        )
        new_bg = jnp.where(bg_mass < cur_mass, gray, bg)

        # first 5 frames: mask forced empty (m_nCount < 5, :314-315)
        fg = jnp.where(t + 1 < 5, jnp.zeros_like(fg), fg)
        if cfg.enableFilter:
            fg = binary_median_blur(erode(fg, 3), 5)

        return {"t": t + 1, "hist": hist, "bg": new_bg}, fg, new_bg
