"""USTC experimental BGS: shrinkBGS (SURVEY §2.9) + the MyBGS template.

shrinkBGS (``ustc_src/shrinkBGS/shrinkbgs.{h,cpp}``): a ViBe/PBAS-style
30-sample color model with a per-pixel "shrink box":

- consensus (``getRawForegroundMask`` ``shrinkbgs.cpp:99-162``): a sample is
  good when every channel lies within the per-channel box L1Threshold =
  (10, 5, 5) *and* the total L1 distance ≤ the per-pixel distance threshold
  (init 15); < 2 good samples ⇒ FG; BG pixels pull their threshold toward
  the best distance with a *global* learning rate adapted ±0.01 in [0, 0.1]
  from the raw-vs-median-filtered noise rate (``updateDistanceThreshold``).
- pure mask = 5×5 median of raw (``getPureForegroundMask``).
- update (``updateBackground`` ``:397-455``): stable-BG pixels (raw = pure
  = 0) always write a random sample slot (learningRateNum = 1) and spread to
  a random 3×3 neighbor with prob 1/5; pixels where raw xor pure differs
  re-test with relaxed thresholds (+learnStep 5) before self-update.
- bootstrap (``updateForegroundAsBackground``): for the first 30 frames,
  pure-BG pixels also insert with prob 1/2.
- every 30th frame (``updateBound``): per-channel sample min/max become the
  box bounds (feeds only the display-only "weighted" path — the weighted
  mask/threshold chain ``:595-686`` never touches the emitted mask, and its
  weight read ``Vec3f w = img.at<float>(i,j)`` mis-strides a 3-channel
  image; not implemented).
- first frame: model seeded from gaussian-weighted nearby positions
  (``refreshModel(1.0)``), output mask empty.

The stochastic neighbor-spread scatter uses the same gather reformulation as
SuBSENSE/LOBSTER (see lbsp_family's module docstring).

MyBGS (``package_bgs/my/MyBGS.cpp``): the "write your own" scaffold —
abs-diff to the previous frame, gray, threshold 15.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tracking_tpu.bgs.base import BGSAlgorithm, State, StepResult
from tracking_tpu.bgs.lbsp_family import (
    _NB3,
    _pick_neighbor,
    _refresh_samples,
)
from tracking_tpu.core.config import BGSConfig
from tracking_tpu.core.registry import register
from tracking_tpu.ops.color import bgr2gray_u8
from tracking_tpu.ops.filters import binary_median_blur

_RMAX = 1 << 30
L1_THRESHOLD = np.array([10, 5, 5], np.int32)  # shrinkbgs.cpp:12-14
LEARN_STEP = 5  # img_backgroundLearnStep fill (init(), :237)


@register("MyBGS", aliases=("mybgs",))
class MyBGS(BGSAlgorithm):
    """Frame-difference template (not registered in FrameProcessor either)."""

    def init(self, h: int, w: int, c: int = 3) -> State:
        c = max(c, 1)
        return {
            "t": jnp.zeros((), jnp.int32),
            "prev": jnp.zeros((h, w, c) if c > 1 else (h, w), jnp.uint8),
        }

    def step(self, state: State, frame: jnp.ndarray) -> StepResult:
        prev = jnp.where(state["t"] == 0, frame, state["prev"])
        diff = jnp.abs(frame.astype(jnp.int16) - prev.astype(jnp.int16))
        gray = bgr2gray_u8(diff.astype(jnp.uint8)) if frame.ndim == 3 else diff
        fg = jnp.where(gray > 15, jnp.uint8(255), jnp.uint8(0))
        return {"t": state["t"] + 1, "prev": frame}, fg, prev


@dataclasses.dataclass(frozen=True)
class ShrinkBGSConfig(BGSConfig):
    # exposed XML params are enableThreshold/threshold/showOutput (unused by
    # the algorithm, shrinkbgs.h:92-95); internals are compile-time consts.
    enableThreshold: bool = True
    threshold: int = 15
    showOutput: bool = True
    SampleNum: int = 30
    requiredBGSamples: int = 2
    foregroundAcceptNum: int = 2


@register("shrinkBGS", aliases=("shrink",))
class ShrinkBGS(BGSAlgorithm):
    Config = ShrinkBGSConfig

    def init(self, h: int, w: int, c: int = 3) -> State:
        N = self.config.SampleNum
        return {
            "t": jnp.zeros((), jnp.int32),
            "key": jax.random.PRNGKey(7),
            "samples": tuple(jnp.zeros((N, h, w), jnp.uint8) for _ in range(3)),
            "dist_thr": jnp.full((h, w), 15.0, jnp.float32),
            "lr": jnp.asarray(0.05, jnp.float32),
        }

    def warm_start(self, state: State, frame: jnp.ndarray) -> State:
        """refreshModel(1.0, force): every slot from a gaussian-weighted
        nearby position (shrinkbgs.cpp:193-230)."""
        cfg = self.config
        f3 = frame if frame.ndim == 3 else jnp.repeat(frame[..., None], 3, -1)
        h, w = f3.shape[:2]
        planes = tuple(f3[..., c] for c in range(3))
        key, sub = jax.random.split(state["key"])
        samples, _ = _refresh_samples(
            sub, cfg.SampleNum, cfg.SampleNum, 0, planes, (),
            jnp.ones((h, w), bool), state["samples"], (),
        )
        return dict(state, key=key, samples=samples)

    def step(self, state: State, frame: jnp.ndarray) -> StepResult:
        cfg = self.config
        N = cfg.SampleNum
        f3 = frame if frame.ndim == 3 else jnp.repeat(frame[..., None], 3, -1)
        h, w = f3.shape[:2]
        planes = tuple(f3[..., c] for c in range(3))
        t = state["t"]
        keys = jax.random.split(state["key"], 8)
        samples = state["samples"]

        # -- consensus (getRawForegroundMask) ---------------------------------
        dist_thr = state["dist_thr"]
        thr_i = dist_thr.astype(jnp.int32)  # (size_t) cast truncates

        def consensus_body(carry, s_cols):
            count, dmin = carry
            box_ok = jnp.ones((h, w), bool)
            tot = jnp.zeros((h, w), jnp.int32)
            for c in range(3):
                d = jnp.abs(
                    planes[c].astype(jnp.int32) - s_cols[c].astype(jnp.int32)
                )
                box_ok &= d <= int(L1_THRESHOLD[c])
                tot = tot + d
            good = box_ok & (tot <= thr_i)
            live = good & (count < cfg.requiredBGSamples)
            dmin = jnp.where(live, jnp.minimum(dmin, tot.astype(jnp.float32)), dmin)
            return (count + live.astype(jnp.int32), dmin), None

        (count, dmin), _ = jax.lax.scan(
            consensus_body, (jnp.zeros((h, w), jnp.int32), dist_thr), samples
        )
        is_fg = count < cfg.requiredBGSamples
        raw = jnp.where(is_fg, jnp.uint8(255), jnp.uint8(0))
        raw = jnp.where(t == 0, jnp.zeros_like(raw), raw)
        lr = state["lr"]
        dist_thr = jnp.where(
            ~is_fg & (t > 0), dist_thr * (1 - lr) + lr * dmin, dist_thr
        )

        pure = binary_median_blur(raw, 5)

        # -- updates (skipped entirely on frame 0) -----------------------------
        stable_bg = (raw == 0) & (pure == 0) & (t > 0)
        xor_bg = ((raw == 0) != (pure == 0)) & (t > 0)

        # relaxed re-test for xor pixels (learnStepCheck, :358-393)
        thr_relaxed = thr_i + 3 * LEARN_STEP

        def relaxed_body(count, s_cols):
            box_ok = jnp.ones((h, w), bool)
            tot = jnp.zeros((h, w), jnp.int32)
            for c in range(3):
                d = jnp.abs(
                    planes[c].astype(jnp.int32) - s_cols[c].astype(jnp.int32)
                )
                box_ok &= d <= int(L1_THRESHOLD[c]) + LEARN_STEP
                tot = tot + d
            good = box_ok & (tot <= thr_relaxed)
            return count + (good & (count < cfg.requiredBGSamples)).astype(jnp.int32), None

        relaxed_count, _ = jax.lax.scan(
            relaxed_body, jnp.zeros((h, w), jnp.int32), samples
        )
        xor_ok = xor_bg & (relaxed_count >= cfg.requiredBGSamples)

        # self-update: learningRateNum == 1 ⇒ always, for stable_bg | xor_ok
        upd_self = stable_bg | xor_ok
        slot_self = jax.random.randint(keys[2], (h, w), 0, N)

        # bootstrap accept during the first SampleNum frames
        boot = (pure == 0) & (t > 0) & (t < cfg.SampleNum) & (
            jax.random.randint(keys[3], (h, w), 0, _RMAX) % cfg.foregroundAcceptNum == 0
        )
        upd_self = upd_self | boot
        m1 = upd_self[None] & (slot_self[None] == jnp.arange(N)[:, None, None])
        samples = tuple(
            jnp.where(m1, planes[c][None], samples[c]) for c in range(3)
        )

        # neighbor spread (gather form), prob 1/5 from stable-BG sources
        n_rand = jax.random.randint(keys[4], (h, w), 0, _RMAX)
        src_fire = stable_bg & (n_rand % 5 == 0)
        o_idx = jax.random.randint(keys[5], (h, w), 0, len(_NB3))
        picked = _pick_neighbor(o_idx, _NB3, (src_fire,) + planes)
        q_ok = picked[0]
        slot_nb = jax.random.randint(keys[6], (h, w), 0, N)
        mn = q_ok[None] & (slot_nb[None] == jnp.arange(N)[:, None, None])
        samples = tuple(
            jnp.where(mn, picked[1 + c][None], samples[c]) for c in range(3)
        )

        # global learning-rate adaptation (updateDistanceThreshold, :483-506)
        noise = jnp.sum((raw > 0) & (pure == 0))
        bg_area = jnp.maximum(jnp.sum(pure == 0), 1)
        rate = noise.astype(jnp.float32) / bg_area.astype(jnp.float32)
        lr = jnp.where(
            rate < 0.05,
            jnp.minimum(lr + 0.01, 0.1),
            jnp.where(rate > 0.1, jnp.maximum(lr - 0.01, 0.0), lr),
        )
        lr = jnp.where(t == 0, state["lr"], lr)

        bg = jnp.stack(
            [jnp.mean(samples[c].astype(jnp.float32), 0) for c in range(3)], -1
        ).astype(jnp.uint8)
        if frame.ndim == 2:
            bg = bg[..., 0]
        return (
            {"t": t + 1, "key": keys[0], "samples": samples,
             "dist_thr": dist_thr, "lr": lr},
            raw,
            bg,
        )
