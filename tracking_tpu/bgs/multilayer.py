"""MultiLayerBGS — ustc type 23 (Jian Yao & Jean-Marc Odobez 2007, jmo/).

Reference: ``package_bgs/jmo/CMultiLayerBGS.cpp`` (core, 2150 LoC) +
``jmo/LocalBinaryPattern.cpp`` (feature) + wrapper ``jmo/MultiLayerBGS.cpp``.

Per pixel, ≤5 modes, each holding an LBP pattern (6 points, radius 2, on
gray), an RGB mean with running min/max, a weight/max-weight pair, and a
background-layer number. Per frame (``BackgroundSubtractionProcess``,
``CMultiLayerBGS.cpp:375-800``):

1. LBP: pattern[k] = (gray − shift_k(gray) + robust_offset(3) > 0); shifted
   images are zero-filled outside the overlap (``CalShiftedImage``,
   ``LocalBinaryPattern.cpp:214-260``), offsets round(2·cos/−2·sin(kπ/3)).
2. per mode: texture dist = fraction of pattern elements with
   |cur − bg| > 1 − 0.1 (``CalPatternBgDist``); color dist = 1 if any channel
   leaves [min(minI, 0.6·bg−5), max(maxI, 1.2·bg+5)] else
   1 − exp(−100·angle²) with angle = max(sin∠(bg,cur) − noise-angle, 0),
   noise-angle = max(offset/‖bg‖ taken as its sine, 10°)
   (``CalColorBgDist/CalColorRangeDist/CalVectorsNoisedAngle``).
   Joint = 0.5·texture + 0.5·color; best (first minimal) mode wins.
3. best < 0.2 → matched: blend color/pattern (rate 0.05 = 0.5/s × 0.1 s),
   min/max update, weight ↑ by lr·(1+5·max_weight), others decay by
   (1 − lr/(1+5·max_weight)); background-layer bookkeeping
   (``CMultiLayerBGS.cpp:687-723``). No match → all decay; append a new mode
   (or overwrite the tail when full). Modes are kept weight-sorted
   (descending); bg_num = smallest prefix holding > 60 % of total weight.
   The reported distance is raised to ≥ 0.5 when the best mode is outside
   the bg_num prefix with unreliable max_weight (``:557-560``).
4. RemoveBackgroundLayers (``:1485-1610``) drops layered modes whose weight
   decayed below 1e-4 and renumbers layers consecutively; runs per pixel
   before matching, and a multi-mode variant fires on layer displacement.
5. The distance map is Gaussian-smoothed (9×9, σ=3) and thresholded at 0.2.

Defaults = wrapper's ``loadDefaultParams`` block
(``MultiLayerBGS.cpp:111-160``); LEARN mode (the pipeline forces it,
``FrameProcessor.cpp:264``): lr = weight_lr = 0.5/s, init weight 0.05,
frame_duration 0.1 s. DETECT mode = 0.01/s rates, init 0.001, optional
``disableLearning``.

Faithful deviations: the reference's QuickSort is unstable — we use stable
descending argsort (ties only arise between equal-weight fresh modes);
the mode list's physical-slot indirection (``lbp_idxes``) is replaced by
physically ordered mode arrays (observationally identical).

TPU mapping: one vmapped per-pixel function over [M=5] mode axes — compact
shifts, sorts, and scans are branch-free index arithmetic, as in the GMM
family.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tracking_tpu.bgs.base import BGSAlgorithm, State, StepResult
from tracking_tpu.core.config import BGSConfig
from tracking_tpu.core.registry import register
from tracking_tpu.ops.color import bgr2gray_u8
from tracking_tpu.ops.filters import gaussian_blur

PI = 3.141592653589793

# 6-point radius-2 LBP offsets: (dx, dy) = (round(2cosθ), round(−2sinθ))
_ML_OFFSETS = [(2, 0), (1, -2), (-1, -2), (-2, 0), (-1, 2), (1, 2)]
L = len(_ML_OFFSETS)


def _shift_zero(img: jnp.ndarray, dx: int, dy: int) -> jnp.ndarray:
    """dst(y, x) = img(y + dy, x + dx), zero outside (CalShiftedImage)."""
    h, w = img.shape
    out = jnp.zeros_like(img)
    ys0, ys1 = max(dy, 0), min(h + dy, h)
    xs0, xs1 = max(dx, 0), min(w + dx, w)
    yd0, xd0 = max(-dy, 0), max(-dx, 0)
    src = img[ys0:ys1, xs0:xs1]
    return out.at[yd0 : yd0 + src.shape[0], xd0 : xd0 + src.shape[1]].set(src)


@dataclasses.dataclass(frozen=True)
class MultiLayerConfig(BGSConfig):
    # wrapper defaults (loadDefaultParams path, MultiLayerBGS.cpp:111-160)
    max_mode_num: int = 5
    weight_updating_constant: float = 5.0
    texture_weight: float = 0.5
    bg_mode_percent: float = 0.6
    pattern_neig_half_size: int = 4
    pattern_neig_gaus_sigma: float = 3.0
    bg_prob_threshold: float = 0.2
    bg_prob_updating_threshold: float = 0.2
    robust_LBP_constant: float = 3.0
    min_noised_angle: float = 10.0 / 180.0 * PI
    shadow_rate: float = 0.6
    highlight_rate: float = 1.2
    frame_duration: float = 0.1
    mode_learn_rate_per_second: float = 0.5
    weight_learn_rate_per_second: float = 0.5
    init_mode_weight: float = 0.05
    disableLearning: bool = False
    showOutput: bool = True
    # constants (BGS.h / ctor)
    reliable_bg_mode_weight: float = 0.9
    min_bg_layer_weight: float = 1e-4
    min_lbp_binary_prob: float = 0.1


@register("MultiLayerBGS", type_id=23, aliases=("multilayer",))
class MultiLayerBGS(BGSAlgorithm):
    Config = MultiLayerConfig

    def init(self, h: int, w: int, c: int = 3) -> State:
        M = self.config.max_mode_num
        c = max(c, 1)
        z = lambda *s: jnp.zeros(s, jnp.float32)
        return {
            "t": jnp.zeros((), jnp.int32),
            "n": jnp.zeros((h, w), jnp.int32),
            "bg_num": jnp.zeros((h, w), jnp.int32),
            "weight": z(M, h, w),
            "max_weight": z(M, h, w),
            "bg_int": z(M, c, h, w),
            "min_int": z(M, c, h, w),
            "max_int": z(M, c, h, w),
            "bg_pattern": z(M, L, h, w),
            "bg_layer": jnp.zeros((M, h, w), jnp.int32),
            "layer_time": jnp.full((M, h, w), -1, jnp.int32),
            "first_time": jnp.full((M, h, w), -1, jnp.int32),
            "last_time": jnp.full((M, h, w), -1, jnp.int32),
            "freq": jnp.full((M, h, w), -1, jnp.int32),
        }

    # -- per-pixel update over the [M] mode axis -----------------------------
    def _pixel(self, cur_int, cur_pat, n, bg_num, w, mw, bi, mini, maxi, bp,
               layer, ltime, ftime, ltime2, freq, frame_idx):
        cfg = self.config
        M = cfg.max_mode_num
        C = cur_int.shape[0]
        lr = cfg.mode_learn_rate_per_second * cfg.frame_duration
        wlr = cfg.weight_learn_rate_per_second * cfg.frame_duration
        wuc = cfg.weight_updating_constant
        slots = jnp.arange(M)

        def pack():
            return (w, mw, bi, mini, maxi, bp, layer, ltime, ftime, ltime2, freq)

        # ---- RemoveBackgroundLayers, single-removal variant -----------------
        def remove_modes(arrs, rem_mask, n):
            """Compact out rem_mask modes, decrement higher layer numbers,
            re-sort by weight, recompute bg_num, renumber layers 1..k."""
            w, mw, bi, mini, maxi, bp, layer, ltime, ftime, lt2, fq = arrs
            n_rem = jnp.sum(rem_mask & (slots < n))
            keep = ~rem_mask & (slots < n)
            # stable compaction: target position = #kept before me
            pos = jnp.cumsum(keep) - 1
            order = jnp.argsort(jnp.where(keep, pos, M + slots), stable=True)

            def g(a):
                return a[order]

            # layer decrement: for each removed layered mode, higher layers -1
            removed_layers = jnp.where(rem_mask & (layer > 0), layer, 0)
            dec = jnp.sum(
                (layer[:, None] > removed_layers[None, :])
                & (removed_layers[None, :] > 0),
                axis=1,
            )
            layer = jnp.where(keep, jnp.maximum(layer - dec, 0), layer)
            arrs = tuple(g(a) for a in (w, mw, bi, mini, maxi, bp, layer, ltime, ftime, lt2, fq))
            n2 = n - n_rem
            w2 = arrs[0]
            # weight re-sort + bg_num (only when something was removed)
            sort_key = jnp.where(slots < n2, -w2, jnp.inf)
            order2 = jnp.argsort(sort_key, stable=True)
            arrs = tuple(a[order2] for a in arrs)
            w2 = arrs[0]
            tot = jnp.sum(jnp.where(slots < n2, w2, 0.0))
            cumw = jnp.cumsum(jnp.where(slots < n2, w2, 0.0))
            over = cumw > cfg.bg_mode_percent * tot
            bg2 = jnp.where(jnp.any(over), jnp.argmax(over) + 1, 0)
            # renumber bg layers consecutively by ascending layer number
            layer2 = arrs[6]
            has_layer = (layer2 > 0) & (slots < n2)
            lkey = jnp.where(has_layer, layer2, jnp.iinfo(jnp.int32).max)
            rank = jnp.argsort(jnp.argsort(lkey, stable=True), stable=True)
            layer2 = jnp.where(has_layer, rank + 1, layer2)
            arrs = arrs[:6] + (layer2,) + arrs[7:]
            changed = n_rem > 0
            return arrs, jnp.where(changed, n2, n), jnp.where(changed, bg2, bg_num)

        if not cfg.disableLearning:
            rem = (layer > 0) & (w < cfg.min_bg_layer_weight) & (slots < n)
            # reference removes only the FIRST such mode per call
            first_rem = rem & (slots == jnp.argmax(rem))
            (w, mw, bi, mini, maxi, bp, layer, ltime, ftime, ltime2, freq), n, bg_num = (
                remove_modes(pack(), first_rem & jnp.any(rem), n)
            )

        active = slots < n

        # ---- distances ------------------------------------------------------
        tex_d = jnp.mean(
            (jnp.abs(cur_pat[None] - bp) > (1.0 - cfg.min_lbp_binary_prob)).astype(
                jnp.float32
            ),
            axis=1,
        )
        cf = cur_int.astype(jnp.float32)
        lo = jnp.minimum(mini, bi * cfg.shadow_rate - 5.0)
        hi = jnp.maximum(maxi, bi * cfg.highlight_rate + 5.0)
        out_range = jnp.any((cf[None] > hi) | (cf[None] < lo), axis=1)
        dot = jnp.sum(bi * cf[None], axis=1)
        n1 = jnp.sum(bi * bi, axis=1)
        n2c = jnp.sum(cf * cf)
        sin2 = jnp.maximum(1.0 - dot * dot / jnp.maximum(n1 * n2c, 1e-20), 0.0)
        org_angle = jnp.where(n1 * n2c == 0, 0.0, jnp.sqrt(sin2))
        norm_bg = jnp.sqrt(n1)
        offset = max(cfg.robust_LBP_constant, 5.0)
        sin_noise = offset / jnp.maximum(norm_bg, 1e-20)
        min_sine = np.sin(cfg.min_noised_angle)
        noised = jnp.where(
            norm_bg == 0,
            PI,
            jnp.where(
                sin_noise < min_sine,
                cfg.min_noised_angle,
                jnp.where(sin_noise >= 1.0, PI, sin_noise),
            ),
        )
        angle = jnp.maximum(org_angle - noised, 0.0)
        col_d = jnp.where(out_range, 1.0, 1.0 - jnp.exp(-100.0 * angle * angle))
        joint = cfg.texture_weight * tex_d + (1.0 - cfg.texture_weight) * col_d
        joint = jnp.where(active, joint, jnp.inf)

        best = jnp.argmin(joint)  # first minimum (strict < in the reference)
        best_d = joint[best]
        updating = best_d < cfg.bg_prob_updating_threshold
        penal = (best >= bg_num) & (mw[best] < cfg.reliable_bg_mode_weight)
        out_dist = jnp.where(
            penal, jnp.maximum(best_d, cfg.bg_prob_threshold * 2.5), best_d
        )

        # ---- empty list: seed mode 0 ----------------------------------------
        def seed(arrs):
            # empty-list seed (CMultiLayerBGS.cpp:475-505): sets first/last
            # time + freq; layer_time keeps its init value
            w, mw, bi2, mini2, maxi2, bp2, layer2, layt, ft, lt, fq = arrs
            at0 = slots == 0
            w = jnp.where(at0, cfg.init_mode_weight, w)
            mw = jnp.where(at0, cfg.init_mode_weight, mw)
            bi2 = jnp.where(at0[:, None], cf[None], bi2)
            mini2 = jnp.where(at0[:, None], cf[None], mini2)
            maxi2 = jnp.where(at0[:, None], cf[None], maxi2)
            bp2 = jnp.where(at0[:, None], cur_pat[None], bp2)
            layer2 = jnp.where(at0, 0, layer2)
            ft = jnp.where(at0, frame_idx, ft)
            lt = jnp.where(at0, frame_idx, lt)
            fq = jnp.where(at0, 1, fq)
            return (w, mw, bi2, mini2, maxi2, bp2, layer2, layt, ft, lt, fq)

        # ---- no match: decay all, add/replace --------------------------------
        def no_match(arrs):
            w, mw, bi2, mini2, maxi2, bp2, layer2, layt, ft, lt, fq = arrs
            decay = 1.0 - wlr / (1.0 + wuc * mw)
            w = jnp.where(active, w * decay, w)
            slot = jnp.minimum(n, M - 1)  # append, or overwrite tail when full
            at = slots == slot
            w = jnp.where(at, cfg.init_mode_weight, w)
            mw = jnp.where(at, cfg.init_mode_weight, mw)
            bi2 = jnp.where(at[:, None], cf[None], bi2)
            mini2 = jnp.where(at[:, None], cf[None], mini2)
            maxi2 = jnp.where(at[:, None], cf[None], maxi2)
            bp2 = jnp.where(at[:, None], cur_pat[None], bp2)
            layer2 = jnp.where(at, 0, layer2)
            layt = jnp.where(at, -1, layt)
            ft = jnp.where(at, frame_idx, ft)
            lt = jnp.where(at, frame_idx, lt)
            fq = jnp.where(at, 1, fq)
            return (w, mw, bi2, mini2, maxi2, bp2, layer2, layt, ft, lt, fq)

        # ---- match: update best, layer logic, decay others --------------------
        def match(arrs):
            w, mw, bi2, mini2, maxi2, bp2, layer2, layt, ft, lt, fq = arrs
            at = slots == best
            ft = jnp.where(at, jnp.maximum(jnp.minimum(ft, frame_idx), 0), ft)
            lt = jnp.where(at, frame_idx, lt)
            fq = jnp.where(at, fq + 1, fq)
            bi2 = jnp.where(at[:, None], (1 - lr) * bi2 + lr * cf[None], bi2)
            mini2 = jnp.where(at[:, None], jnp.minimum(mini2, cf[None]), mini2)
            maxi2 = jnp.where(at[:, None], jnp.maximum(maxi2, cf[None]), maxi2)
            bp2 = jnp.where(at[:, None], (1 - lr) * bp2 + lr * cur_pat[None], bp2)
            inc = wlr * (1.0 + wuc * mw)
            w = jnp.where(at, (1.0 - inc) * w + inc, w)
            mw = jnp.where(at, jnp.maximum(w, mw), mw)

            # layer bookkeeping (CMultiLayerBGS.cpp:687-723)
            b_layer = layer2[best]
            b_w, b_mw = w[best], mw[best]
            displaced = (
                (b_layer > 0)
                & (b_w > b_mw * 0.2)
                & (layer2 > b_layer)
                & (w < mw * 0.9)
                & active
            )
            promote = (b_layer == 0) & (b_mw > cfg.reliable_bg_mode_weight)
            max_layer = jnp.max(jnp.where(active, layer2, 0))
            layer2 = jnp.where(at & promote, max_layer + 1, layer2)
            layt = jnp.where(at & promote, frame_idx, layt)

            decay = 1.0 - wlr / (1.0 + wuc * mw)
            w = jnp.where(active & ~at, w * decay, w)
            return (w, mw, bi2, mini2, maxi2, bp2, layer2, layt, ft, lt, fq), displaced

        is_empty = n == 0
        do_match = (~is_empty) & updating & (not cfg.disableLearning)
        do_nomatch = (~is_empty) & (~updating) & (not cfg.disableLearning)

        arrs = pack()
        m_arrs, displaced = match(arrs)
        nm_arrs = no_match(arrs)
        s_arrs = seed(arrs)
        sel3 = lambda m, nm, s, base: jnp.where(
            do_match, m, jnp.where(do_nomatch, nm, jnp.where(is_empty, s, base))
        )
        arrs = tuple(
            sel3(m, nm, s, b) for m, nm, s, b in zip(m_arrs, nm_arrs, s_arrs, arrs)
        )
        n = jnp.where(
            is_empty, 1, jnp.where(do_nomatch, jnp.minimum(n + 1, M), n)
        )
        bg_num = jnp.where(is_empty, 1, bg_num)

        # displaced-layer removal (match path)
        (w, mw, bi, mini, maxi, bp, layer, ltime, ftime, ltime2, freq) = arrs
        if not cfg.disableLearning:
            rem_mask = displaced & do_match
            (w, mw, bi, mini, maxi, bp, layer, ltime, ftime, ltime2, freq), n, bg_num = remove_modes(
                (w, mw, bi, mini, maxi, bp, layer, ltime, ftime, ltime2, freq),
                rem_mask, n,
            )

            # final weight sort + bg_num (BackgroundSubtractionProcess:727-748)
            resort = (n > 1) & ~is_empty
            sort_key = jnp.where(slots < n, -w, jnp.inf)
            order = jnp.argsort(sort_key, stable=True)
            arrs2 = tuple(
                a[order]
                for a in (w, mw, bi, mini, maxi, bp, layer, ltime, ftime, ltime2, freq)
            )
            w2 = arrs2[0]
            tot = jnp.sum(jnp.where(slots < n, w2, 0.0))
            cumw = jnp.cumsum(jnp.where(slots < n, w2, 0.0))
            over = cumw > cfg.bg_mode_percent * tot
            bg2 = jnp.where(jnp.any(over), jnp.argmax(over) + 1, bg_num)
            pick = lambda a2, a: jnp.where(resort, a2, a)
            (w, mw, bi, mini, maxi, bp, layer, ltime, ftime, ltime2, freq) = tuple(
                pick(a2, a)
                for a2, a in zip(
                    arrs2,
                    (w, mw, bi, mini, maxi, bp, layer, ltime, ftime, ltime2, freq),
                )
            )
            bg_num = jnp.where(resort, bg2, bg_num)

        out_dist = jnp.where(is_empty, 0.0, out_dist)
        return (
            n, bg_num, w, mw, bi, mini, maxi, bp, layer, ltime, ftime, ltime2,
            freq, out_dist,
        )

    def step(self, state: State, frame: jnp.ndarray) -> StepResult:
        cfg = self.config
        f3 = frame if frame.ndim == 3 else jnp.repeat(frame[..., None], 3, -1)
        h, w_ = f3.shape[:2]
        t = state["t"]
        frame_idx = t + 1  # SetNewImage pre-increments m_nCurImgFrameIdx

        gray = bgr2gray_u8(f3).astype(jnp.float32)
        pattern = jnp.stack(
            [
                (gray - _shift_zero(gray, dx, dy) + cfg.robust_LBP_constant > 0).astype(
                    jnp.float32
                )
                for dx, dy in _ML_OFFSETS
            ],
            axis=0,
        )  # [L, H, W]

        first_frame = state["n"][0, 0] == 0  # bFirstFrame (PLBP[0].num == 0)

        # arrays are [M(, C), H, W]; transpose to [H, W, ...] so two nested
        # vmaps over the leading axes hand the per-pixel fn [M]-shaped views.
        cur_int = jnp.moveaxis(f3, -1, 0)  # [C, H, W]

        def arr(x):
            return jnp.moveaxis(x, (-2, -1), (0, 1))

        res = jax.vmap(jax.vmap(self._pixel, in_axes=(0,) * 15 + (None,)),
                       in_axes=(0,) * 15 + (None,))(
            jnp.transpose(cur_int, (1, 2, 0)),
            jnp.transpose(pattern, (1, 2, 0)),
            state["n"], state["bg_num"],
            arr(state["weight"]), arr(state["max_weight"]),
            arr(state["bg_int"]), arr(state["min_int"]),
            arr(state["max_int"]), arr(state["bg_pattern"]),
            arr(state["bg_layer"]), arr(state["layer_time"]),
            arr(state["first_time"]), arr(state["last_time"]),
            arr(state["freq"]), frame_idx,
        )
        (n, bg_num, w, mw, bi, mini, maxi, bp, layer, ltime, ftime, ltime2,
         freq, dist) = res

        back = lambda x: jnp.moveaxis(x, (0, 1), (-2, -1))
        new_state = {
            "t": frame_idx,
            "n": n, "bg_num": bg_num,
            "weight": back(w), "max_weight": back(mw),
            "bg_int": back(bi), "min_int": back(mini), "max_int": back(maxi),
            "bg_pattern": back(bp), "bg_layer": back(layer),
            "layer_time": back(ltime), "first_time": back(ftime),
            "last_time": back(ltime2), "freq": back(freq),
        }

        ksize = 2 * cfg.pattern_neig_half_size + 1
        dist_s = gaussian_blur(dist, ksize, cfg.pattern_neig_gaus_sigma)
        fg = jnp.where(
            dist_s > cfg.bg_prob_threshold, jnp.uint8(255), jnp.uint8(0)
        )
        fg = jnp.where(first_frame, jnp.zeros_like(fg), fg)

        bg = jnp.clip(jnp.rint(new_state["bg_int"][0]), 0, 255).astype(jnp.uint8)
        bg = jnp.moveaxis(bg, 0, -1)
        if frame.ndim == 2:
            bg = bg[..., 0]
        return new_state, fg, bg
