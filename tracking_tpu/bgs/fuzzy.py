"""Fuzzy-integral fusion BGS — ustc types 21/22 (SURVEY §2.4).

FuzzySugenoIntegral (``tb/FuzzySugenoIntegral.cpp:30-176``) and
FuzzyChoquetIntegral (``tb/FuzzyChoquetIntegral.cpp``, same structure) fuse a
texture-similarity criterion (fuzzy LBP ratio) with two color-similarity
criteria through a fuzzy integral, on float images in [0,1]:

1. frames 0..framesToLearn: adaptive learning ``bg = αL·I + (1−αL)·bg``
   (first frame copies), empty mask (no output written in the reference).
2. afterwards: LBP(gray I) vs LBP(gray bg) → ratio similarity H;
   per-channel color ratio similarity Δ in the chosen color space;
   HI = [H, Δ0, Δ1] (option 2; the Sugeno code uses this layout for option 1
   too — only the measure g changes, a faithful quirk; Choquet option 1 uses
   [Δ0, Δ1, Δ2]); fuzzy integral → FG where integral ≤ threshold
   (``THRESH_BINARY_INV`` at 0.67) after optional 3×3 median smoothing.
3. adaptive-*selective* update (``FuzzyUtils.cpp:486-525``): per pixel
   ``β = 1 − I + min·(I−max)/(min−max)`` from the frame-wide integral
   min/max, ``bg = β·bg + (1−β)·(αU·I + (1−αU)·bg)``  (min==max guarded to
   β = 1−I; the reference divides by zero there).

Measures g: option 1 → (0.4, 0.3, 0.3); option 2 → (0.6, 0.3, 0.1)
(``FuzzySugenoIntegral.cpp:110-121``).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from tracking_tpu.bgs.base import BGSAlgorithm, State, StepResult
from tracking_tpu.core.config import BGSConfig
from tracking_tpu.core.registry import register
from tracking_tpu.ops.filters import median_blur
from tracking_tpu.ops.fuzzy import (
    choquet_integral,
    color_convert_f32,
    fuzzy_lbp,
    similarity_ratio,
    sugeno_integral,
)


def _gray_f32(bgr_f: jnp.ndarray) -> jnp.ndarray:
    """cv::cvtColor BGR2GRAY on float data (FuzzySugenoIntegral.cpp:79-82)."""
    return (
        0.114 * bgr_f[..., 0] + 0.587 * bgr_f[..., 1] + 0.299 * bgr_f[..., 2]
    )


@dataclasses.dataclass(frozen=True)
class FuzzyIntegralConfig(BGSConfig):
    showOutput: bool = True
    framesToLearn: int = 10
    alphaLearn: float = 0.1
    alphaUpdate: float = 0.01
    colorSpace: int = 1  # 1 RGB, 2 Ohta, 3 HSV, 4 YCrCb
    option: int = 2  # 1: 3 colors; 2: 2 colors + texture
    smooth: bool = True
    threshold: float = 0.67


class _FuzzyIntegralBase(BGSAlgorithm):
    Config = FuzzyIntegralConfig
    SUGENO: bool = True

    def init(self, h: int, w: int, c: int = 3) -> State:
        return {
            "t": jnp.zeros((), jnp.int32),
            "bg": jnp.zeros((h, w, 3), jnp.float32),
        }

    def _integral(self, f: jnp.ndarray, bg: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        h_tex = similarity_ratio(fuzzy_lbp(_gray_f32(f)), fuzzy_lbp(_gray_f32(bg)))
        delta = similarity_ratio(
            color_convert_f32(f, cfg.colorSpace),
            color_convert_f32(bg, cfg.colorSpace),
        )
        if self.SUGENO:
            g = (0.4, 0.3, 0.3) if cfg.option == 1 else (0.6, 0.3, 0.1)
            hi = jnp.stack([h_tex, delta[..., 0], delta[..., 1]], axis=-1)
            return sugeno_integral(hi, g)
        if cfg.option == 1:
            return choquet_integral(delta, (0.4, 0.3, 0.3))
        hi = jnp.stack([h_tex, delta[..., 0], delta[..., 1]], axis=-1)
        return choquet_integral(hi, (0.6, 0.3, 0.1))

    def step(self, state: State, frame: jnp.ndarray) -> StepResult:
        cfg = self.config
        t = state["t"]
        f3 = frame if frame.ndim == 3 else jnp.repeat(frame[..., None], 3, -1)
        f = f3.astype(jnp.float32) / 255.0
        bg = state["bg"]

        # learning-phase background (first frame copies)
        bg_learn = jnp.where(t == 0, f, cfg.alphaLearn * f + (1 - cfg.alphaLearn) * bg)

        integral = self._integral(f, bg)
        if cfg.smooth:
            integral = median_blur(integral, 3)
        fg = jnp.where(integral > cfg.threshold, jnp.uint8(0), jnp.uint8(255))

        # adaptive-selective update from frame-wide integral min/max
        mn, mx = jnp.min(integral), jnp.max(integral)
        beta_lin = jnp.where(
            mn == mx, 0.0, mn * (integral - mx) / jnp.where(mn == mx, 1.0, mn - mx)
        )
        beta = 1.0 - integral + beta_lin
        blended = cfg.alphaUpdate * f + (1 - cfg.alphaUpdate) * bg
        bg_detect = beta[..., None] * bg + (1.0 - beta[..., None]) * blended

        learning = t <= cfg.framesToLearn
        new_bg = jnp.where(learning, bg_learn, bg_detect)
        fg = jnp.where(learning, jnp.zeros_like(fg), fg)

        bg_u8 = jnp.clip(new_bg * 255.0, 0, 255).astype(jnp.uint8)
        if frame.ndim == 2:
            bg_u8 = bg_u8[..., 0]
        return {"t": t + 1, "bg": new_bg}, fg, bg_u8


@register("FuzzySugenoIntegral", type_id=21, aliases=("fuzzy-sugeno",))
class FuzzySugenoIntegral(_FuzzyIntegralBase):
    SUGENO = True


@register("FuzzyChoquetIntegral", type_id=22, aliases=("fuzzy-choquet",))
class FuzzyChoquetIntegral(_FuzzyIntegralBase):
    SUGENO = False
