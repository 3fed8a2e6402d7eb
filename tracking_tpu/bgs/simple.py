"""The root-package "simple temporal" BGS family.

TPU-native re-designs of the six self-contained wrappers in the reference's
``package_bgs/`` root (SURVEY §2.2). Each is a per-pixel recurrence with O(1)
state per pixel, expressed as elementwise VPU ops — XLA fuses each ``step``
into a couple of HBM passes; no Pallas needed at this arithmetic intensity.

Effective parameter defaults are the reference's ``loadConfig`` defaults (the
reference calls ``loadConfig()`` before first use, so ctor values are shadowed
— e.g. ``AdaptiveSelectiveBackgroundLearning.cpp:120-131`` makes the effective
threshold 25, not the ctor's 15).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from tracking_tpu.bgs.base import BGSAlgorithm, State, StepResult
from tracking_tpu.core.config import BGSConfig
from tracking_tpu.core.registry import register
from tracking_tpu.ops.color import absdiff_u8, bgr2gray_u8, to_u8, to_unit_f32
from tracking_tpu.ops.filters import binary_median_blur
from tracking_tpu.ops.threshold import threshold_binary


def _mask_from_diff(diff_u8: jnp.ndarray, enable_threshold: bool, threshold: int) -> jnp.ndarray:
    """absdiff image → gray → optional binary threshold (the shared tail of
    every simple wrapper, e.g. ``FrameDifferenceBGS.cpp:45-51``)."""
    g = bgr2gray_u8(diff_u8)
    if enable_threshold:
        g = threshold_binary(g, threshold)
    return g


# ---------------------------------------------------------------------------
# FrameDifferenceBGS — ustc type 0  (FrameDifferenceBGS.cpp:29-61)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class FrameDifferenceConfig(BGSConfig):
    enableThreshold: bool = True
    threshold: int = 15
    showOutput: bool = True


@register("FrameDifferenceBGS", type_id=0, aliases=("framediff",))
class FrameDifference(BGSAlgorithm):
    """fg_t = |frame_t − frame_{t−1}| > threshold. First frame emits no mask."""

    Config = FrameDifferenceConfig

    def init(self, h: int, w: int, c: int = 3) -> State:
        return {
            "t": jnp.zeros((), jnp.int32),
            "prev": jnp.zeros((h, w, c) if c > 1 else (h, w), jnp.uint8),
        }

    def step(self, state: State, frame: jnp.ndarray) -> StepResult:
        cfg = self.config
        t, prev = state["t"], state["prev"]
        diff = absdiff_u8(prev, frame)
        fg = _mask_from_diff(diff, cfg.enableThreshold, cfg.threshold)
        fg = jnp.where(t == 0, jnp.zeros_like(fg), fg)
        new_state = {"t": t + 1, "prev": frame}
        return new_state, fg, prev


# ---------------------------------------------------------------------------
# StaticFrameDifferenceBGS — ustc type 1  (StaticFrameDifferenceBGS.cpp:29-57)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class StaticFrameDifferenceConfig(BGSConfig):
    enableThreshold: bool = True
    threshold: int = 15
    showOutput: bool = True


@register("StaticFrameDifferenceBGS", type_id=1, aliases=("staticdiff",))
class StaticFrameDifference(BGSAlgorithm):
    """fg_t = |frame_t − frame_0| > threshold (background = first frame)."""

    Config = StaticFrameDifferenceConfig

    def init(self, h: int, w: int, c: int = 3) -> State:
        return {
            "t": jnp.zeros((), jnp.int32),
            "bg": jnp.zeros((h, w, c) if c > 1 else (h, w), jnp.uint8),
        }

    def step(self, state: State, frame: jnp.ndarray) -> StepResult:
        cfg = self.config
        t = state["t"]
        bg = self._first_frame_select(t, state["bg"], frame)
        diff = absdiff_u8(frame, bg)
        fg = _mask_from_diff(diff, cfg.enableThreshold, cfg.threshold)
        return {"t": t + 1, "bg": bg}, fg, bg


# ---------------------------------------------------------------------------
# WeightedMovingMeanBGS — ustc type 2  (WeightedMovingMeanBGS.cpp:29-96)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class WeightedMovingMeanConfig(BGSConfig):
    enableWeight: bool = True
    enableThreshold: bool = True
    threshold: int = 15
    showOutput: bool = True
    showBackground: bool = False


@register("WeightedMovingMeanBGS", type_id=2, aliases=("wmovmean",))
class WeightedMovingMean(BGSAlgorithm):
    """bg = 0.5·I_t + 0.3·I_{t−1} + 0.2·I_{t−2} (unit-scale f32, rounded to u8);
    fg = |I_t − bg| > threshold. First two frames emit no mask."""

    Config = WeightedMovingMeanConfig

    def init(self, h: int, w: int, c: int = 3) -> State:
        shape = (h, w, c) if c > 1 else (h, w)
        return {
            "t": jnp.zeros((), jnp.int32),
            "prev1": jnp.zeros(shape, jnp.uint8),
            "prev2": jnp.zeros(shape, jnp.uint8),
        }

    def step(self, state: State, frame: jnp.ndarray) -> StepResult:
        cfg = self.config
        t, p1, p2 = state["t"], state["prev1"], state["prev2"]
        f = to_unit_f32(frame)
        f1 = to_unit_f32(p1)
        f2 = to_unit_f32(p2)
        if cfg.enableWeight:
            bg_f = f * 0.5 + f1 * 0.3 + f2 * 0.2
        else:
            bg_f = (f + f1 + f2) / 3.0
        bg = to_u8(bg_f)
        diff = absdiff_u8(frame, bg)
        fg = _mask_from_diff(diff, cfg.enableThreshold, cfg.threshold)
        fg = jnp.where(t < 2, jnp.zeros_like(fg), fg)
        return {"t": t + 1, "prev1": frame, "prev2": p1}, fg, bg


# ---------------------------------------------------------------------------
# WeightedMovingVarianceBGS — ustc type 3  (WeightedMovingVarianceBGS.cpp:30-117)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class WeightedMovingVarianceConfig(BGSConfig):
    enableWeight: bool = True
    enableThreshold: bool = True
    threshold: int = 15
    showOutput: bool = True


@register("WeightedMovingVarianceBGS", type_id=3, aliases=("wmovvar",))
class WeightedMovingVariance(BGSAlgorithm):
    """fg = round(255·sqrt(Σ wᵢ(Iᵢ − μ_w)²)) > threshold over a 3-frame window.

    Note: the reference's unweighted branch uses weights 0.3/0.3/0.3 (sum 0.9),
    not 1/3 — reproduced as-is (``WeightedMovingVarianceBGS.cpp:86-91``).
    The warm-up behavior also differs from WeightedMovingMean: masks start at
    frame 2 just the same.
    """

    Config = WeightedMovingVarianceConfig

    def init(self, h: int, w: int, c: int = 3) -> State:
        shape = (h, w, c) if c > 1 else (h, w)
        return {
            "t": jnp.zeros((), jnp.int32),
            "prev1": jnp.zeros(shape, jnp.uint8),
            "prev2": jnp.zeros(shape, jnp.uint8),
        }

    def step(self, state: State, frame: jnp.ndarray) -> StepResult:
        cfg = self.config
        t, p1, p2 = state["t"], state["prev1"], state["prev2"]
        f = to_unit_f32(frame)
        f1 = to_unit_f32(p1)
        f2 = to_unit_f32(p2)
        w0, w1, w2 = (0.5, 0.3, 0.2) if cfg.enableWeight else (0.3, 0.3, 0.3)
        mean = f * w0 + f1 * w1 + f2 * w2
        var = (
            w0 * jnp.square(jnp.abs(f - mean))
            + w1 * jnp.square(jnp.abs(f1 - mean))
            + w2 * jnp.square(jnp.abs(f2 - mean))
        )
        std_u8 = to_u8(jnp.sqrt(var))
        fg = _mask_from_diff(std_u8, cfg.enableThreshold, cfg.threshold)
        fg = jnp.where(t < 2, jnp.zeros_like(fg), fg)
        return {"t": t + 1, "prev1": frame, "prev2": p1}, fg, to_u8(mean)


# ---------------------------------------------------------------------------
# AdaptiveBackgroundLearning — ustc type 6  (AdaptiveBackgroundLearning.cpp:30-83)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class AdaptiveBackgroundLearningConfig(BGSConfig):
    alpha: float = 0.05
    limit: int = -1
    enableThreshold: bool = True
    threshold: int = 15
    showForeground: bool = True
    showBackground: bool = True


@register("AdaptiveBackgroundLearning", type_id=6, aliases=("adaptive",))
class AdaptiveBackgroundLearning(BGSAlgorithm):
    """Running-average background: bg ← α·I + (1−α)·bg (u8-roundtripped each
    frame); fg = |I − bg_before_update| > threshold.

    Faithful quirk: with ``limit > 0`` the reference's counter never increments
    (``AdaptiveBackgroundLearning.cpp:52-62`` guards the increment with the
    same never-true condition), so the background freezes at frame 0; only
    ``limit == -1`` learns. Reproduced exactly.
    """

    Config = AdaptiveBackgroundLearningConfig

    def init(self, h: int, w: int, c: int = 3) -> State:
        shape = (h, w, c) if c > 1 else (h, w)
        return {
            "t": jnp.zeros((), jnp.int32),
            "bg": jnp.zeros(shape, jnp.uint8),
        }

    def step(self, state: State, frame: jnp.ndarray) -> StepResult:
        cfg = self.config
        t = state["t"]
        bg = self._first_frame_select(t, state["bg"], frame)
        f = to_unit_f32(frame)
        bg_f = to_unit_f32(bg)
        diff_f = jnp.abs(f - bg_f)
        if cfg.limit == -1:
            new_bg = to_u8(cfg.alpha * f + (1.0 - cfg.alpha) * bg_f)
        else:
            new_bg = bg  # frozen (reference dead-counter behavior)
        fg = _mask_from_diff(to_u8(diff_f), cfg.enableThreshold, cfg.threshold)
        return {"t": t + 1, "bg": new_bg}, fg, new_bg


# ---------------------------------------------------------------------------
# AdaptiveSelectiveBackgroundLearning — ustc type 7
# (AdaptiveSelectiveBackgroundLearning.cpp:31-105; loadConfig defaults :120-131)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class AdaptiveSelectiveConfig(BGSConfig):
    learningFrames: int = 90
    alphaLearn: float = 0.05
    alphaDetection: float = 0.05
    threshold: int = 25
    showOutput: bool = True


@register("AdaptiveSelectiveBackgroundLearning", type_id=7, aliases=("adaptive-selective",))
class AdaptiveSelectiveBackgroundLearning(BGSAlgorithm):
    """Gray-input running average with a learning phase, then *selective*
    updates only where the (median-filtered) mask says background."""

    Config = AdaptiveSelectiveConfig

    def init(self, h: int, w: int, c: int = 3) -> State:
        del c  # operates on grayscale internally
        return {
            "t": jnp.zeros((), jnp.int32),
            "counter": jnp.zeros((), jnp.int32),
            "bg": jnp.zeros((h, w), jnp.uint8),
        }

    def step(self, state: State, frame: jnp.ndarray) -> StepResult:
        cfg = self.config
        t, counter = state["t"], state["counter"]
        gray = bgr2gray_u8(frame)
        bg = self._first_frame_select(t, state["bg"], gray)
        f = to_unit_f32(gray)
        bg_f = to_unit_f32(bg)
        fg = threshold_binary(to_u8(jnp.abs(f - bg_f)), cfg.threshold)
        fg = binary_median_blur(fg, 3)

        in_learning = (cfg.learningFrames > 0) & (counter <= cfg.learningFrames)
        learn_bg = cfg.alphaLearn * f + (1.0 - cfg.alphaLearn) * bg_f
        detect_bg = jnp.where(
            fg == 0, cfg.alphaDetection * f + (1.0 - cfg.alphaDetection) * bg_f, bg_f
        )
        new_bg = to_u8(jnp.where(in_learning, learn_bg, detect_bg))
        new_counter = counter + jnp.where(in_learning, 1, 0)
        return {"t": t + 1, "counter": new_counter, "bg": new_bg}, fg, new_bg
