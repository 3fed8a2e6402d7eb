"""dp-package BGS family (Donovan Parks' mini-framework, SURVEY §2.3).

The reference pattern (``dp/DPAdaptiveMedianBGS.cpp:29-80``) is:
first frame → ``Initalize`` + ``InitModel(frame0)``; every frame →
``Subtract(t, frame, low, high)``, ``low.Clear()``, ``Update(t, frame, low)``;
the emitted mask is the **high**-threshold mask. Because the low mask is
cleared before ``Update``, every dp Update is effectively unconditional —
reproduced here (the "selective update" machinery is dead code in the
reference path).

All three models here are pure per-pixel recurrences → fused VPU elementwise
chains; no Pallas needed.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from tracking_tpu.bgs.base import BGSAlgorithm, State, StepResult
from tracking_tpu.core.config import BGSConfig
from tracking_tpu.core.registry import register


def _ensure_3ch(frame: jnp.ndarray) -> jnp.ndarray:
    """dp models are defined over 3-channel data; lift gray to a channel axis."""
    return frame if frame.ndim == 3 else frame[..., None]


# ---------------------------------------------------------------------------
# DPAdaptiveMedianBGS — ustc type 9 (McFarlane & Schofield ±1 median estimate)
# core: dp/AdaptiveMedianBGS.cpp:63-111; wrapper defaults DPAdaptiveMedianBGS.cpp:19
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DPAdaptiveMedianConfig(BGSConfig):
    threshold: int = 40
    samplingRate: int = 7
    learningFrames: int = 30
    showOutput: bool = True


@register("DPAdaptiveMedianBGS", type_id=9, aliases=("adaptive-median",))
class DPAdaptiveMedian(BGSAlgorithm):
    """Per-pixel ±1 running median; FG where any... rather where NOT all channel
    diffs ≤ 2·threshold (the wrapper emits the high mask = 2×threshold)."""

    Config = DPAdaptiveMedianConfig

    def init(self, h: int, w: int, c: int = 3) -> State:
        return {
            "t": jnp.zeros((), jnp.int32),
            "median": jnp.zeros((h, w, max(c, 1)), jnp.uint8),
        }

    def step(self, state: State, frame: jnp.ndarray) -> StepResult:
        cfg = self.config
        t = state["t"]
        f = _ensure_3ch(frame)
        median = self._first_frame_select(t, state["median"], f)

        # Subtract (pre-update model), high mask = 2*threshold: BACKGROUND iff
        # every channel diff ≤ thr (AdaptiveMedianBGS.cpp:92-111).
        diff = jnp.abs(median.astype(jnp.int16) - f.astype(jnp.int16))
        high_bg = jnp.all(diff <= 2 * cfg.threshold, axis=-1)
        fg = jnp.where(high_bg, jnp.uint8(0), jnp.uint8(255))

        # Update every samplingRate-th frame: median += sign(frame − median)
        # (AdaptiveMedianBGS.cpp:63-90; unconditional, see module docstring).
        do_update = (t % cfg.samplingRate) == 1
        stepped = jnp.clip(
            median.astype(jnp.int16) + jnp.sign(f.astype(jnp.int16) - median.astype(jnp.int16)),
            0,
            255,
        ).astype(jnp.uint8)
        new_median = jnp.where(do_update, stepped, median)

        bg = new_median if frame.ndim == 3 else new_median[..., 0]
        return {"t": t + 1, "median": new_median}, fg, bg


# ---------------------------------------------------------------------------
# DPMeanBGS — ustc type 12 (running mean, squared-L2 threshold)
# core: dp/MeanBGS.cpp:32-127; wrapper defaults DPMeanBGS.cpp:19
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DPMeanConfig(BGSConfig):
    threshold: int = 2700
    alpha: float = 1e-6
    learningFrames: int = 30
    showOutput: bool = True


@register("DPMeanBGS", type_id=12, aliases=("dp-mean",))
class DPMean(BGSAlgorithm):
    """FG where Σ_ch (I−μ)² > 2·threshold; μ ← α·μ + (1−α)·I.

    Note the reference weights the *old* mean by α (α=1e-6 ⇒ the model tracks
    the current frame almost exactly — faithful quirk, ``MeanBGS.cpp:68``).
    """

    Config = DPMeanConfig

    def init(self, h: int, w: int, c: int = 3) -> State:
        return {
            "t": jnp.zeros((), jnp.int32),
            "mean": jnp.zeros((h, w, max(c, 1)), jnp.float32),
        }

    def step(self, state: State, frame: jnp.ndarray) -> StepResult:
        cfg = self.config
        t = state["t"]
        f = _ensure_3ch(frame).astype(jnp.float32)
        mean = jnp.where(t == 0, f, state["mean"])

        dist = jnp.sum(jnp.square(f - mean), axis=-1)
        fg = jnp.where(dist > 2.0 * cfg.threshold, jnp.uint8(255), jnp.uint8(0))

        new_mean = cfg.alpha * mean + (1.0 - cfg.alpha) * f
        bg_u8 = jnp.clip(new_mean + 0.5, 0, 255).astype(jnp.uint8)
        bg = bg_u8 if frame.ndim == 3 else bg_u8[..., 0]
        return {"t": t + 1, "mean": new_mean}, fg, bg


# ---------------------------------------------------------------------------
# DPWrenGABGS — ustc type 13 (Wren "Pfinder" single Gaussian per pixel)
# core: dp/WrenGA.cpp:47-172; wrapper defaults DPWrenGABGS.cpp:19
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DPWrenGAConfig(BGSConfig):
    threshold: float = 12.25
    alpha: float = 0.005
    learningFrames: int = 30
    showOutput: bool = True


@register("DPWrenGABGS", type_id=13, aliases=("wren-ga",))
class DPWrenGA(BGSAlgorithm):
    """Single Gaussian/pixel with scalar variance: FG where
    ‖I−μ‖² > 2·thr·σ²; μ ← μ − α(μ−I); σ² ← σ² + α(‖I−μ‖²−σ²) clamped [4, 180]."""

    Config = DPWrenGAConfig

    INIT_VARIANCE = 36.0  # WrenGA.cpp:51

    def init(self, h: int, w: int, c: int = 3) -> State:
        return {
            "t": jnp.zeros((), jnp.int32),
            "mu": jnp.zeros((h, w, max(c, 1)), jnp.float32),
            "var": jnp.full((h, w), self.INIT_VARIANCE, jnp.float32),
        }

    def step(self, state: State, frame: jnp.ndarray) -> StepResult:
        cfg = self.config
        t = state["t"]
        f = _ensure_3ch(frame).astype(jnp.float32)
        mu = jnp.where(t == 0, f, state["mu"])
        var = state["var"]

        # Subtract with the pre-update model (WrenGA.cpp:120-147).
        delta = mu - f
        dist = jnp.sum(jnp.square(delta), axis=-1)
        fg = jnp.where(dist > 2.0 * cfg.threshold * var, jnp.uint8(255), jnp.uint8(0))

        # Unconditional update (cleared mask; WrenGA.cpp:86-118).
        new_mu = mu - cfg.alpha * delta
        sigmanew = var + cfg.alpha * (dist - var)
        new_var = jnp.clip(sigmanew, 4.0, 5.0 * self.INIT_VARIANCE)

        bg_u8 = jnp.clip(new_mu + 0.5, 0, 255).astype(jnp.uint8)
        bg = bg_u8 if frame.ndim == 3 else bg_u8[..., 0]
        return {"t": t + 1, "mu": new_mu, "var": new_var}, fg, bg
