"""IMBS — ustc type 33 (Bloisi & Iocchi Independent Multimodal BGS, db/).

Reference: ``package_bgs/db/imbs.{hpp,cpp}`` + wrapper
``IndependentMultimodalBGS.cpp`` (fps=10; full-ctor defaults
``imbs.hpp:43-55``: fgThreshold=15, associationThreshold=5,
samplingPeriod=500 ms, minBinHeight=2, numSamples=30, α=0.65, β=1.15,
τ_s=60, τ_h=40, minArea=30, persistencePeriod=10000 ms,
morphologicalFiltering=False).

Pipeline per frame (``imbs.cpp:164-202``): timestamp += 1000/fps; if a model
exists: getFg → hsvSuppression → filterFg; then updateBg (every
samplingPeriod ms a bg sample feeds per-pixel bin clustering; every
numSamples-th sample the bins are promoted to the model).

Faithful quirks kept:
- bin association scans only indices ``s < sample_number`` — sample #1 that
  matches nothing is silently dropped (``imbs.cpp:331-361``), and an
  empty-bin's *stale value* can "match" and be re-averaged into a fresh bin;
- the model keeps its running-max bin at slot 0 by displacing the previous
  front into the current slot (``imbs.cpp:392-417``);
- getFg: a non-fg model match sets BG but keeps scanning (no break); an isFg
  match breaks immediately → PERSISTENCE label only if no earlier non-fg
  match (``imbs.cpp:452-509``);
- labels: SHADOW=80, PERSISTENCE=180, FOREGROUND=255 (``imbs.cpp:125-127``);
- sudden-change (>50 % FG) halves the sampling period and rebuilds with
  numSamples/3 samples, restored ×3/×2 once the rebuild lands
  (``imbs.cpp:434-441,709-724``).

Deliberate divergences: the "Creating initial background..." text the
reference paints into the mask before the first model (``imbs.cpp:135-146``)
is emitted as an empty mask; areaThresholding uses connected-component pixel
counts instead of ``findContours``+polygon moments (``imbs.cpp:511-536``) —
same decision for solid blobs, and hole-boundaries are not re-filled.

TPU mapping: bins/model live as [S|M, H, W(,3)] planes; association and
getFg are mask algebra over the slot axis (first-match via argmax over
prefix-valid masks); the 30-step promotion walk is a per-pixel ``fori_loop``
under ``vmap`` executed inside a ``lax.cond`` that fires once per
numSamples·samplingPeriod.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tracking_tpu.bgs.base import BGSAlgorithm, State, StepResult
from tracking_tpu.core.config import BGSConfig
from tracking_tpu.core.registry import register
from tracking_tpu.ops.cc import label_components
from tracking_tpu.ops.morphology import morph_close, morph_open

SHADOW_LABEL = 80
PERSISTENCE_LABEL = 180
FOREGROUND_LABEL = 255


def _rgb_to_hsv_full(bgr_u8: jnp.ndarray) -> jnp.ndarray:
    """IMBS's own full-range HSV (H,S,V ∈ 0..255; ``imbs.cpp:540-666``)."""
    b = bgr_u8[..., 0].astype(jnp.float32) / 255.0
    g = bgr_u8[..., 1].astype(jnp.float32) / 255.0
    r = bgr_u8[..., 2].astype(jnp.float32) / 255.0
    mx = jnp.maximum(jnp.maximum(b, g), r)
    mn = jnp.minimum(jnp.minimum(b, g), r)
    d = mx - mn
    safe = jnp.where(d == 0, 1.0, 6.0 * d)
    # tie-breaking order of the reference's integer comparisons: B<G<R chains
    bi = bgr_u8[..., 0].astype(jnp.int32)
    gi = bgr_u8[..., 1].astype(jnp.int32)
    ri = bgr_u8[..., 2].astype(jnp.int32)
    mxi = jnp.maximum(jnp.maximum(bi, gi), ri)
    is_r = mxi == ri
    is_g = (mxi == gi) & ~is_r
    h = jnp.where(
        is_r,
        (g - b) / safe,
        jnp.where(is_g, 2.0 / 6.0 + (b - r) / safe, 4.0 / 6.0 + (r - g) / safe),
    )
    h = jnp.where(h < 0, h + 1.0, h)
    h = jnp.where(h >= 1.0, h - 1.0, h)
    s = jnp.where(mxi == 0, 0.0, d / jnp.where(mx == 0, 1.0, mx))
    h = jnp.where(mxi == 0, 0.0, h)
    to_u8 = lambda x: jnp.clip((0.5 + x * 255.0).astype(jnp.int32), 0, 255).astype(jnp.uint8)
    return jnp.stack([to_u8(h), to_u8(s), to_u8(mx)], axis=-1)


def _cheby(a_u8: jnp.ndarray, b_u8: jnp.ndarray) -> jnp.ndarray:
    """Chebyshev (max-channel) distance over the trailing channel axis."""
    return jnp.max(
        jnp.abs(a_u8.astype(jnp.int32) - b_u8.astype(jnp.int32)), axis=-1
    )


@dataclasses.dataclass(frozen=True)
class IMBSConfig(BGSConfig):
    fps: float = 10.0
    fgThreshold: int = 15
    associationThreshold: int = 5
    samplingPeriod: float = 500.0
    minBinHeight: int = 2
    numSamples: int = 30
    alpha: float = 0.65
    beta: float = 1.15
    tau_s: float = 60.0
    tau_h: float = 40.0
    minArea: float = 30.0
    persistencePeriod: float = 10000.0
    morphologicalFiltering: bool = False
    showOutput: bool = True


@register("IndependentMultimodalBGS", type_id=33, aliases=("imbs",))
class IMBS(BGSAlgorithm):
    Config = IMBSConfig

    @property
    def _max_bins(self) -> int:
        return self.config.numSamples // self.config.minBinHeight

    def init(self, h: int, w: int, c: int = 3) -> State:
        S, M = self.config.numSamples, self._max_bins
        return {
            "t": jnp.zeros((), jnp.int32),
            "bins_val": jnp.zeros((S, h, w, 3), jnp.uint8),
            "bins_h": jnp.zeros((S, h, w), jnp.int32),
            "bins_fg": jnp.zeros((S, h, w), jnp.bool_),
            "model_val": jnp.zeros((M, h, w, 3), jnp.uint8),
            "model_hsv": jnp.zeros((M, h, w, 3), jnp.uint8),
            "model_valid": jnp.zeros((M, h, w), jnp.bool_),
            "model_fg": jnp.zeros((M, h, w), jnp.bool_),
            "model_cnt": jnp.zeros((M, h, w), jnp.int32),
            "persistence": jnp.zeros((h, w), jnp.float32),
            "model_ready": jnp.zeros((), jnp.bool_),
            "timestamp": jnp.zeros((), jnp.float32),
            "prev_bg_frame_time": jnp.zeros((), jnp.float32),
            "bg_frame_counter": jnp.zeros((), jnp.int32),
            "num_samples_cur": jnp.asarray(self.config.numSamples, jnp.int32),
            "sampling_period_cur": jnp.asarray(self.config.samplingPeriod, jnp.float32),
            "bg_reset": jnp.zeros((), jnp.bool_),
            "sudden_change": jnp.zeros((), jnp.bool_),
            "bg_sample": jnp.zeros((h, w, 3), jnp.uint8),
        }

    # -- getFg (imbs.cpp:452-509) -------------------------------------------
    def _get_fg(self, st, frame):
        cfg = self.config
        M = self._max_bins
        valid_prefix = jnp.cumprod(st["model_valid"], axis=0).astype(bool)
        d = _cheby(st["model_val"], frame[None])  # [M, H, W]
        within = (d < cfg.fgThreshold) & valid_prefix
        fg_match = within & st["model_fg"]
        exists_a = jnp.any(fg_match, axis=0)
        a = jnp.argmax(fg_match, axis=0)  # first isFg match (break point)
        slots = jnp.arange(M)[:, None, None]
        before_a = jnp.where(exists_a[None], slots < a[None], True)
        nonfg_match = jnp.any(within & ~st["model_fg"] & before_a, axis=0)
        nonempty = valid_prefix[0]
        is_fg = nonempty & ~nonfg_match
        label = jnp.where(
            is_fg,
            jnp.where(exists_a, jnp.uint8(PERSISTENCE_LABEL), jnp.uint8(FOREGROUND_LABEL)),
            jnp.uint8(0),
        )
        # persistence bookkeeping
        dt = 1000.0 / cfg.fps
        pers = st["persistence"]
        pers = jnp.where(nonfg_match | (label == FOREGROUND_LABEL), 0.0, pers)
        pers = jnp.where(label == PERSISTENCE_LABEL, pers + dt, pers)
        clear = pers > cfg.persistencePeriod
        model_fg = jnp.where(clear[None] & valid_prefix, False, st["model_fg"])
        return label, pers, model_fg

    # -- hsvSuppression (imbs.cpp:243-293) ------------------------------------
    def _hsv_suppress(self, st, frame, label):
        cfg = self.config
        hsv_i = _rgb_to_hsv_full(frame)
        valid_prefix = jnp.cumprod(st["model_valid"], axis=0).astype(bool)
        eligible = valid_prefix & ~st["model_fg"]
        h_i = hsv_i[..., 0].astype(jnp.int32)[None]
        s_i = hsv_i[..., 1].astype(jnp.int32)[None]
        v_i = hsv_i[..., 2].astype(jnp.float32)[None]
        h_b = st["model_hsv"][..., 0].astype(jnp.int32)
        s_b = st["model_hsv"][..., 1].astype(jnp.int32)
        v_b = st["model_hsv"][..., 2].astype(jnp.float32)
        h_abs = jnp.abs(h_i - h_b)
        h_diff = jnp.minimum(h_abs, 255 - h_abs)
        s_diff = jnp.abs(s_i - s_b)
        v_ratio = v_i / jnp.where(v_b == 0, 1e-6, v_b)
        shadow = jnp.any(
            eligible
            & (h_diff <= cfg.tau_h)
            & (s_diff <= cfg.tau_s)
            & (v_ratio >= cfg.alpha)
            & (v_ratio < cfg.beta),
            axis=0,
        )
        return jnp.where((label > 0) & shadow, jnp.uint8(SHADOW_LABEL), label)

    # -- filterFg (imbs.cpp:672-707) ------------------------------------------
    def _filter_fg(self, label, h, w):
        cfg = self.config
        hard = jnp.where(label == FOREGROUND_LABEL, jnp.uint8(255), jnp.uint8(0))
        sudden = jnp.sum(hard > 0) > (0.5 * h * w)
        if cfg.morphologicalFiltering:
            hard = morph_close(morph_open(hard, 3), 3)
        # area thresholding by component pixel count
        lab = label_components(hard, connectivity=8)
        n = h * w
        flat = lab.reshape(-1)
        idx = jnp.where(flat >= 0, flat, n)
        areas = jnp.zeros(n + 1, jnp.int32).at[idx].add(1)
        px_area = areas[idx].reshape(h, w)
        keep = (
            (lab >= 0)
            & (px_area >= cfg.minArea)
            & (px_area < 0.6 * n)
        )
        out = jnp.where(keep, jnp.uint8(255), jnp.uint8(0))
        out = jnp.where(label == PERSISTENCE_LABEL, jnp.uint8(PERSISTENCE_LABEL), out)
        out = jnp.where(label == SHADOW_LABEL, jnp.uint8(SHADOW_LABEL), out)
        return out, sudden

    # -- createBg: bin association (imbs.cpp:295-361) -------------------------
    def _associate(self, st, k, sample, fgmask):
        cfg = self.config
        S = cfg.numSamples
        slots = jnp.arange(S)[:, None, None]
        is_fg_px = (fgmask == FOREGROUND_LABEL)[None]

        def first_sample(_):
            # slot 0 seeded; heights[1:] zeroed; stale values/isFg kept
            # for s>0 (imbs.cpp:311-327)
            bv = jnp.where(slots[..., None] == 0, sample[None], st["bins_val"])
            bh = jnp.where(slots == 0, 1, jnp.zeros_like(st["bins_h"]))
            bf = jnp.where(slots == 0, is_fg_px, st["bins_fg"])
            return bv, bh, bf

        def later_sample(_):
            d = _cheby(st["bins_val"], sample[None])
            in_range = slots < k
            match = (d <= cfg.associationThreshold) & in_range
            empty = (st["bins_h"] == 0) & in_range
            cand = match | empty
            has = jnp.any(cand, axis=0)
            first = jnp.argmax(cand, axis=0)
            sel = (slots == first[None]) & has[None]
            is_match = jnp.any(sel & match, axis=0)[None]  # selected slot was a match
            h_old = st["bins_h"]
            # match: integer re-average + height+1; empty-create: value, h=1
            den = h_old + 1
            avg = (
                (st["bins_val"].astype(jnp.int32) * h_old[..., None] + sample[None].astype(jnp.int32))
                // den[..., None]
            ).astype(jnp.uint8)
            new_val = jnp.where(sel[..., None], jnp.where(is_match[..., None], avg, sample[None]), st["bins_val"])
            new_h = jnp.where(sel, h_old + 1, h_old)
            # isFg: match branch only sets True (keeps stale otherwise);
            # create branch sets both ways (imbs.cpp:343-357)
            new_fg = jnp.where(
                sel,
                jnp.where(is_match, st["bins_fg"] | is_fg_px, is_fg_px),
                st["bins_fg"],
            )
            return new_val, new_h, new_fg

        return jax.lax.cond(k == 0, first_sample, later_sample, None)

    # -- createBg: promotion (imbs.cpp:363-431) --------------------------------
    def _promote(self, st, fgmask):
        cfg = self.config
        S, M = cfg.numSamples, self._max_bins

        def pixel(bins_val, bins_h, bins_fg, m_val, m_valid, m_fg, m_cnt, persist_px):
            # carries: model arrays [M(,3)], index, max_h, stopped
            def body(s, carry):
                m_val, m_valid, m_fg, m_cnt, bins_fg, idx, max_h, stopped = carry
                h_s = bins_h[s]
                stop_now = (~stopped) & (h_s == 0)
                # end-marker write valid[idx] = False
                mslot = jnp.arange(M)
                m_valid = jnp.where(stop_now & (mslot == idx), False, m_valid)
                stopped2 = stopped | stop_now | ((~stopped) & (idx >= M))
                accept = (~stopped2) & (h_s >= cfg.minBinHeight)

                # persistence fix: clear matching model isFg + this bin's isFg
                vp = jnp.cumprod(m_valid, axis=0).astype(bool)
                d = jnp.max(
                    jnp.abs(m_val.astype(jnp.int32) - bins_val[s].astype(jnp.int32)),
                    axis=-1,
                )
                pfix = accept & persist_px
                hit = vp & (d < cfg.fgThreshold) & pfix
                m_fg = jnp.where(hit, False, m_fg)
                bin_fg_s = bins_fg[s] & ~(pfix & jnp.any(hit))
                bins_fg = bins_fg.at[s].set(bin_fg_s)

                is_new_max = accept & (h_s > max_h)
                # displaced front goes to slot idx; new max to slot 0
                front_val, front_fg, front_cnt = m_val[0], m_fg[0], m_cnt[0]
                at_idx = mslot == idx
                m_val = jnp.where(
                    (at_idx & accept)[:, None],
                    jnp.where(is_new_max, front_val, bins_val[s])[None],
                    m_val,
                )
                m_fg = jnp.where(at_idx & accept, jnp.where(is_new_max, front_fg, bin_fg_s), m_fg)
                m_cnt = jnp.where(at_idx & accept, jnp.where(is_new_max, front_cnt, h_s), m_cnt)
                m_valid = jnp.where(at_idx & accept, True, m_valid)
                m_val = jnp.where(
                    ((mslot == 0) & is_new_max)[:, None], bins_val[s][None], m_val
                )
                m_fg = jnp.where((mslot == 0) & is_new_max, bin_fg_s, m_fg)
                m_cnt = jnp.where((mslot == 0) & is_new_max, h_s, m_cnt)
                m_valid = jnp.where((mslot == 0) & is_new_max, True, m_valid)

                idx = jnp.where(accept, idx + 1, idx)
                max_h = jnp.where(is_new_max, h_s, max_h)
                return (m_val, m_valid, m_fg, m_cnt, bins_fg, idx, max_h, stopped2)

            init = (
                m_val, m_valid, m_fg, m_cnt, bins_fg,
                jnp.zeros((), jnp.int32), jnp.full((), -1, jnp.int32),
                jnp.zeros((), jnp.bool_),
            )
            m_val, m_valid, m_fg, m_cnt, bins_fg, idx, _, stopped = jax.lax.fori_loop(
                0, S, body, init
            )
            # NOTE: when the walk exhausts all S bins without hitting an empty
            # one, the reference writes no end marker — stale valid entries
            # beyond idx stay visible (imbs.cpp:365-372). Faithful: no cleanup.
            return m_val, m_valid, m_fg, m_cnt, bins_fg

        persist_px = fgmask == PERSISTENCE_LABEL
        axes = (1, 1, 1, 1, 1, 1, 1, 0)
        out_axes = (1, 1, 1, 1, 1)
        m_val, m_valid, m_fg, m_cnt, bins_fg = jax.vmap(
            jax.vmap(pixel, in_axes=axes, out_axes=out_axes),
            in_axes=axes,
            out_axes=out_axes,
        )(
            st["bins_val"], st["bins_h"], st["bins_fg"],
            st["model_val"], st["model_valid"], st["model_fg"], st["model_cnt"],
            persist_px,
        )
        return m_val, m_valid, m_fg, m_cnt, bins_fg

    # -- step -------------------------------------------------------------------
    def step(self, state: State, frame: jnp.ndarray) -> StepResult:
        cfg = self.config
        f3 = frame if frame.ndim == 3 else jnp.repeat(frame[..., None], 3, -1)
        h, w = f3.shape[:2]
        st = dict(state)
        st["timestamp"] = st["timestamp"] + 1000.0 / cfg.fps

        # changeBg (imbs.cpp:190-192, 709-724)
        do_change = st["sudden_change"] & ~st["bg_reset"]
        st["num_samples_cur"] = jnp.where(
            do_change, st["num_samples_cur"] // 3, st["num_samples_cur"]
        )
        st["sampling_period_cur"] = jnp.where(
            do_change, st["sampling_period_cur"] / 2.0, st["sampling_period_cur"]
        )
        st["bg_frame_counter"] = jnp.where(do_change, 0, st["bg_frame_counter"])
        st["bg_reset"] = st["bg_reset"] | do_change

        # detection path once a model exists
        def detect(_):
            label, pers, model_fg = self._get_fg(st, f3)
            label = self._hsv_suppress(dict(st, model_fg=model_fg), f3, label)
            label, sudden = self._filter_fg(label, h, w)
            return label, pers, model_fg, sudden

        def no_detect(_):
            return (
                jnp.zeros((h, w), jnp.uint8),
                st["persistence"],
                st["model_fg"],
                jnp.zeros((), jnp.bool_),
            )

        label, pers, model_fg, sudden_new = jax.lax.cond(
            st["model_ready"], detect, no_detect, None
        )
        st["persistence"] = pers
        st["model_fg"] = model_fg
        st["sudden_change"] = st["sudden_change"] | sudden_new

        # updateBg (imbs.cpp:209-234). The final bin-merge + promotion fires
        # ungated on the frame *after* sample numSamples−2, reusing the stale
        # bgSample buffer (``frame.copyTo(bgSample)`` only happens on the
        # gated path) — so the last sample duplicates the previous one.
        cnt = jnp.where(
            st["bg_reset"],
            jnp.minimum(st["bg_frame_counter"], st["num_samples_cur"] - 1),
            st["bg_frame_counter"],
        )
        pbt = jnp.minimum(st["prev_bg_frame_time"], st["timestamp"])
        is_last = cnt == st["num_samples_cur"] - 1
        take_sample = is_last | (
            (st["timestamp"] - pbt) >= st["sampling_period_cur"]
        )

        def on_sample(st):
            st = dict(st)
            st["bg_sample"] = jnp.where(is_last, st["bg_sample"], f3)
            st["prev_bg_frame_time"] = jnp.where(is_last, pbt, st["timestamp"])
            bv, bh, bf = self._associate(st, cnt, st["bg_sample"], label)
            st["bins_val"], st["bins_h"], st["bins_fg"] = bv, bh, bf

            def promote(st):
                st = dict(st)
                m_val, m_valid, m_fg, m_cnt, bins_fg = self._promote(st, label)
                st["bins_fg"] = bins_fg
                st["model_val"] = m_val
                st["model_valid"] = m_valid
                st["model_fg"] = m_fg
                st["model_cnt"] = m_cnt
                st["model_hsv"] = jax.vmap(_rgb_to_hsv_full)(m_val)
                st["persistence"] = jnp.zeros_like(st["persistence"])
                st["bg_reset"] = jnp.zeros((), jnp.bool_)
                st["num_samples_cur"] = jnp.where(
                    st["sudden_change"],
                    jnp.minimum(st["num_samples_cur"] * 3, cfg.numSamples),
                    st["num_samples_cur"],
                )
                st["sampling_period_cur"] = jnp.where(
                    st["sudden_change"],
                    st["sampling_period_cur"] * 2.0,
                    st["sampling_period_cur"],
                )
                st["sudden_change"] = jnp.zeros((), jnp.bool_)
                st["model_ready"] = jnp.ones((), jnp.bool_)
                st["bg_frame_counter"] = jnp.zeros((), jnp.int32)
                return st

            def advance(st):
                st = dict(st)
                st["bg_frame_counter"] = cnt + 1
                return st

            return jax.lax.cond(is_last, promote, advance, st)

        def no_sample(st):
            st = dict(st)
            st["bg_frame_counter"] = cnt
            st["prev_bg_frame_time"] = pbt
            return st

        st = jax.lax.cond(take_sample, on_sample, no_sample, st)
        st["t"] = state["t"] + 1

        bg = jnp.where(
            st["model_valid"][0][..., None], st["model_val"][0], jnp.uint8(0)
        )
        if frame.ndim == 2:
            bg = bg[..., 0]
        return st, label, bg
