"""DPPratiMediodBGS — ustc type 14 (Prati/Cucchiara temporal mediod).

Reference: ``dp/PratiMediodBGS.cpp:51-271``, wrapper defaults
``dp/DPPratiMediodBGS.cpp`` (threshold 30, samplingRate 5, historySize 16,
weight 5). Every samplingRate-th frame the pixel enters a ring buffer of
HistorySize samples; each buffered sample carries the sum of L∞ distances to
all others, and the mediod (min-sum sample) is the background. Masks: L∞
distance to the mediod vs low/high thresholds, combined with 8-connected
hysteresis (low-FG promoted next to high-FG; border forced background).

Faithful quirks kept: the replacement step adds the new frame's distance to
the *departing* sample before overwriting it, and the tracked mediod is not
re-examined after that overwrite (:100-106, :131-168).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from tracking_tpu.bgs.base import BGSAlgorithm, State, StepResult
from tracking_tpu.core.config import BGSConfig
from tracking_tpu.core.registry import register
from tracking_tpu.ops.morphology import dilate


def _channels(frame):
    if frame.ndim == 2:
        return (frame,)
    return tuple(frame[..., c] for c in range(frame.shape[-1]))


@dataclasses.dataclass(frozen=True)
class PratiMediodConfig(BGSConfig):
    threshold: int = 30
    samplingRate: int = 5
    historySize: int = 16
    weight: int = 5
    showOutput: bool = True


@register("DPPratiMediodBGS", type_id=14, aliases=("prati-mediod",))
class DPPratiMediod(BGSAlgorithm):
    Config = PratiMediodConfig

    def init(self, h: int, w: int, c: int = 3) -> State:
        c = max(c, 1)
        S = self.config.historySize
        return {
            "t": jnp.zeros((), jnp.int32),
            "count": jnp.zeros((), jnp.int32),  # buffered samples
            "pos": jnp.zeros((), jnp.int32),  # ring position
            "buf": tuple(jnp.zeros((S, h, w), jnp.uint8) for _ in range(c)),
            "dist": jnp.zeros((S, h, w), jnp.int32),
            "median": tuple(jnp.zeros((h, w), jnp.uint8) for _ in range(c)),
            "median_dist": jnp.full((h, w), np.iinfo(np.int32).max, jnp.int32),
        }

    def _linf(self, a_channels, b_channels):
        d = None
        for a, b in zip(a_channels, b_channels):
            di = jnp.abs(a.astype(jnp.int32) - b.astype(jnp.int32))
            d = di if d is None else jnp.maximum(d, di)
        return d

    def step(self, state: State, frame: jnp.ndarray) -> StepResult:
        cfg = self.config
        S = cfg.historySize
        src = _channels(frame)
        c = len(src)
        t = state["t"]
        h, w = src[0].shape

        # ---- Subtract (masks from the last-updated mediod; :248-271) -------
        dist_to_med = self._linf(src, state["median"])
        low_fg = dist_to_med > cfg.threshold
        high_fg = dist_to_med > 2 * cfg.threshold
        high_mask = jnp.where(high_fg, jnp.uint8(255), jnp.uint8(0))
        near_high = dilate(high_mask, 3) > 0
        combined = high_fg | (low_fg & near_high)
        border = jnp.zeros((h, w), bool)
        border = border.at[0, :].set(True).at[-1, :].set(True)
        border = border.at[:, 0].set(True).at[:, -1].set(True)
        combined = combined & ~border
        fg = jnp.where(combined & (t >= S), jnp.uint8(255), jnp.uint8(0))

        # ---- Update the ring buffer on sampled frames (:69-129) ------------
        do_sample = (t % cfg.samplingRate) == 0
        count, pos = state["count"], state["pos"]
        buf, dist = state["buf"], state["dist"]
        sidx = jnp.arange(S)[:, None, None]
        filling = count < S

        # distance from each buffered sample to the new frame
        d_new = jnp.stack(
            [
                self._linf(tuple(b[s] for b in buf), src)
                for s in range(S)
            ],
            axis=0,
        )  # [S, H, W] (entries for s ≥ count are garbage; masked below)

        in_buf = sidx < count
        # -- filling path: append at slot `count`
        fill_dist = jnp.where(in_buf, dist + jnp.where(in_buf, d_new, 0), dist)
        new_sum_fill = jnp.sum(jnp.where(in_buf, d_new, 0), axis=0)
        fill_slot = sidx == count
        fill_dist = jnp.where(fill_slot, new_sum_fill[None], fill_dist)
        fill_buf = tuple(
            jnp.where(fill_slot, src[i][None], buf[i]) for i in range(c)
        )

        # -- replacement path: oldPos = pos
        old = tuple(
            jnp.take_along_axis(buf[i], jnp.full((1, h, w), 0, jnp.int32) + pos, axis=0)[0]
            for i in range(c)
        )
        d_old = jnp.stack(
            [self._linf(tuple(b[s] for b in buf), old) for s in range(S)], axis=0
        )
        rep_dist = dist - d_old  # subtract departing sample's contribution
        rep_dist = rep_dist + d_new  # UpdateMediod adds the new point
        new_sum_rep = jnp.sum(d_new, axis=0)
        # mediod among the updated sums (before the oldPos overwrite)
        med_idx = jnp.argmin(rep_dist, axis=0)
        med_min = jnp.min(rep_dist, axis=0)
        rep_slot = sidx == pos
        rep_dist = jnp.where(rep_slot, new_sum_rep[None], rep_dist)
        rep_buf = tuple(jnp.where(rep_slot, src[i][None], buf[i]) for i in range(c))

        # mediod tracking for the filling path
        fill_masked = jnp.where(in_buf, fill_dist, np.iinfo(np.int32).max)
        fmed_idx = jnp.argmin(fill_masked, axis=0)
        fmed_min = jnp.min(fill_masked, axis=0)

        def pick(bufs, med_i):
            return tuple(
                jnp.take_along_axis(bufs[i], med_i[None], axis=0)[0] for i in range(c)
            )

        # select per path, then apply only on sampled frames
        new_count = jnp.where(filling, count + 1, count)
        new_pos = jnp.where(filling, 0, (pos + 1) % S)
        sel_dist = jnp.where(filling, fill_dist, rep_dist)
        sel_buf = tuple(jnp.where(filling, fill_buf[i], rep_buf[i]) for i in range(c))
        sel_med_min = jnp.where(filling, fmed_min, med_min)
        sel_med_i = jnp.where(filling, fmed_idx, med_idx)
        med_px = pick(sel_buf, sel_med_i)
        # new point may beat the mediod (:163-168)
        sel_new_sum = jnp.where(filling, new_sum_fill, new_sum_rep)
        new_wins = sel_new_sum < sel_med_min
        med_px = tuple(jnp.where(new_wins, src[i], med_px[i]) for i in range(c))
        sel_med_min = jnp.where(new_wins, sel_new_sum, sel_med_min)

        out = {
            "t": t + 1,
            "count": jnp.where(do_sample, new_count, count),
            "pos": jnp.where(do_sample, new_pos, pos),
            "buf": tuple(
                jnp.where(do_sample, sel_buf[i], buf[i]) for i in range(c)
            ),
            "dist": jnp.where(do_sample, sel_dist, dist),
            "median": tuple(
                jnp.where(do_sample, med_px[i], state["median"][i]) for i in range(c)
            ),
            "median_dist": jnp.where(do_sample, sel_med_min, state["median_dist"]),
        }
        bg = (
            out["median"][0]
            if frame.ndim == 2
            else jnp.stack(out["median"], axis=-1)
        )
        return out, fg, bg
