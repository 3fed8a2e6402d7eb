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

import jax
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
        # Perf notes (720p survey: 10.6 → see PERF.md): the whole S-sample
        # update is gated behind a scalar ``lax.cond`` so the S×C distance
        # recomputation runs only on every samplingRate-th frame, and the
        # per-pixel argmin-then-gather mediod extraction is replaced by an
        # unrolled lexicographic min-reduce over the S axis (dist packed with
        # the slot id for the reference's first-slot tie-break) followed by
        # S one-hot selects — no [H, W] gathers anywhere.
        do_sample = (t % cfg.samplingRate) == 0
        count, pos = state["count"], state["pos"]
        buf, dist = state["buf"], state["dist"]
        sidx = jnp.arange(S)[:, None, None]
        # distance sums are ≤ (S−1)·255 < 2^12, so 2^20 is a safe "masked"
        # sentinel that still packs with the slot id inside int32
        imax = 1 << 20

        def mediod_select(dists_masked, bufs):
            """argmin over S + value pick, gather-free. dists_masked [S, H, W]
            (masked slots = 2^20); returns (min_dist, per-channel px)."""
            key = None
            for s in range(S):
                # dist ≤ S·255 < 2^13; pack slot id for first-index tie-break
                k = dists_masked[s] * S + s
                key = k if key is None else jnp.minimum(key, k)
            slot = key % S
            min_d = key // S
            px = tuple(jnp.zeros((h, w), jnp.uint8) for _ in range(c))
            for s in range(S):
                sel = slot == s
                px = tuple(jnp.where(sel, bufs[i][s], px[i]) for i in range(c))
            return min_d, px

        def sampled_update(op):
            count, pos, buf, dist = op
            filling = count < S
            # distance from each buffered sample to the new frame
            d_new = jnp.stack(
                [self._linf(tuple(b[s] for b in buf), src) for s in range(S)],
                axis=0,
            )  # [S, H, W] (entries for s ≥ count are garbage; masked below)

            in_buf = sidx < count
            # -- filling path: append at slot `count`
            fill_dist = dist + jnp.where(in_buf, d_new, 0)
            new_sum_fill = jnp.sum(jnp.where(in_buf, d_new, 0), axis=0)
            fill_slot = sidx == count
            fill_dist = jnp.where(fill_slot, new_sum_fill[None], fill_dist)
            fill_buf = tuple(
                jnp.where(fill_slot, src[i][None], buf[i]) for i in range(c)
            )

            # -- replacement path: oldPos = pos (dynamic slice, not gather)
            old = tuple(
                jax.lax.dynamic_slice_in_dim(buf[i], pos, 1, axis=0)[0]
                for i in range(c)
            )
            d_old = jnp.stack(
                [self._linf(tuple(b[s] for b in buf), old) for s in range(S)],
                axis=0,
            )
            rep_dist = dist - d_old  # subtract departing sample's contribution
            rep_dist = rep_dist + d_new  # UpdateMediod adds the new point
            new_sum_rep = jnp.sum(d_new, axis=0)
            rep_slot = sidx == pos
            rep_dist_post = jnp.where(rep_slot, new_sum_rep[None], rep_dist)
            rep_buf = tuple(
                jnp.where(rep_slot, src[i][None], buf[i]) for i in range(c)
            )

            # select per path, then the mediod over the selected sums
            new_count = jnp.where(filling, count + 1, count)
            new_pos = jnp.where(filling, 0, (pos + 1) % S)
            sel_dist = jnp.where(filling, fill_dist, rep_dist_post)
            sel_buf = tuple(
                jnp.where(filling, fill_buf[i], rep_buf[i]) for i in range(c)
            )
            # mediod among the updated sums — filling: only slots < new count;
            # replacement: pre-overwrite sums (the tracked mediod is not
            # re-examined after the oldPos overwrite, :131-168)
            fill_masked = jnp.where(sidx < count + 1, fill_dist, imax)
            rep_masked = rep_dist
            med_masked = jnp.where(filling, fill_masked, rep_masked)
            sel_med_min, med_px = mediod_select(med_masked, sel_buf)
            # new point may beat the mediod (:163-168)
            sel_new_sum = jnp.where(filling, new_sum_fill, new_sum_rep)
            new_wins = sel_new_sum < sel_med_min
            med_px = tuple(
                jnp.where(new_wins, src[i], med_px[i]) for i in range(c)
            )
            sel_med_min = jnp.where(new_wins, sel_new_sum, sel_med_min)
            return (new_count, new_pos, sel_buf, sel_dist, med_px, sel_med_min)

        def no_update(op):
            count, pos, buf, dist = op
            return (count, pos, buf, dist, state["median"], state["median_dist"])

        new_count, new_pos, new_buf, new_dist, new_med, new_med_dist = jax.lax.cond(
            do_sample, sampled_update, no_update, (count, pos, buf, dist)
        )
        out = {
            "t": t + 1,
            "count": new_count,
            "pos": new_pos,
            "buf": new_buf,
            "dist": new_dist,
            "median": new_med,
            "median_dist": new_med_dist,
        }
        bg = (
            out["median"][0]
            if frame.ndim == 2
            else jnp.stack(out["median"], axis=-1)
        )
        return out, fg, bg
