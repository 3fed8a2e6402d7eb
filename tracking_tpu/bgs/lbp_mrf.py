"""LbpMrf — ustc type 30 (Kertész texture-based detection, ck/).

Reference: wrapper ``package_bgs/ck/LbpMrf.cpp`` (mode md_LBPHistograms) over
``ck/MotionDetection.cpp`` + ``ck/MEImage.cpp`` (+ Boykov–Kolmogorov maxflow
in ``ck/maxflow.cpp``). Constants: 3 histograms/pixel, 5×5 area with a
13-pixel cvCircle mask, 8 bins, match threshold 0.75, background threshold
0.95, learning rates 0.01 (+ (100−life)/100 warm-up boost), min-cut weight 8
(``MotionDetection.cpp:55-60``).

Per frame (``DetectMotionsHU`` ``:504-602``):
1. the BGR input is treated as RGB (MEImage convention — channels swapped,
   faithful) and converted to CIELuv; its u-layer resized to 32×24 detects
   scene cuts (>80 % of pixels changed by >12 ⇒ model reset);
2. gray = CV_RGB2GRAY *of the Luv image* (L,u,v weighted as R,G,B —
   faithful quirk), then the "special" LBP (8 averaged-group comparisons
   on a 5×5 patch, ``MEImage.cpp:783-813``), codes ≫6;
3. per model pixel (grid (W−4)×(H−4), models on alternate columns — and the
   last model column double-updated on rows with y%2 == gridW%2, a faithful
   structural quirk of ``UpdateModelHU``'s sliding loops ``:604-806``):
   masked 5×5 histogram; intersections vs 3 stored histograms; all < 0.75 ⇒
   replace the min-weight histogram (w=0.01, renormalize, non-bg); else blend
   the best match and EMA the weights, re-selecting background histograms by
   the reference's single-bubble-pass + tail-cumulative-0.95 rule
   (``UpdateHUPixelData`` ``:806-950``; exact quirk semantics — including
   the short-memcpy partial init that makes frames 1-2 nearly all-FG, the
   highest-index intersection tie-break and the 0→2→1 min-weight visit
   order — in the ``_update_models`` docstring; isolated by
   ``tools/lbpmrf_twin.py``, round 5);
   BackgroundRate = best intersection among background histograms;
4. mask (``GetMotionsMaskHU`` ``:1256-1366``): a 2-label MRF with unary
   (FG=1 vs BG=(short)(8·(1−rate)) — the reference truncates the sink
   weight to an integer) and unit Potts pairwise on the 4-neighbor grid
   (no edges for x==0/y==0 nodes — faithful); the reference solves it by
   BK max-flow. Solved EXACTLY since round 4 by the BK-parity integer
   min-cut in ops/mincut.py (parallel push–relabel + the canonical
   not-source-reachable labeling; the rounds-1..3 ICM relaxation survives
   as ``mrf_solver="icm"``); model pixels paint a
   checkerboard (row y+3 / col x+2 offsets — faithful off-center), gaps
   filled by ≥2-of-4 neighbor vote, corner-seeded hole filling, 3×3 erode.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tracking_tpu.bgs.base import BGSAlgorithm, State, StepResult
from tracking_tpu.core.config import BGSConfig
from tracking_tpu.core.registry import register
from tracking_tpu.ops.morphology import erode, fill_holes

AREA = 5
BINS = 8
NH = 3  # histograms per pixel
PR_THRES = 0.75
BG_THRES = 0.95
LRATE = 0.01
MINCUT_W = 8.0
SHIFT = 6  # log2(256/8)+1

# cvCircle((2,2), r=2, filled) on 5×5 — 13-pixel mask
_MASK = np.array(
    [
        [0, 0, 1, 0, 0],
        [0, 1, 1, 1, 0],
        [1, 1, 1, 1, 1],
        [0, 1, 1, 1, 0],
        [0, 0, 1, 0, 0],
    ],
    np.bool_,
)
SAMPLE_PX = int(_MASK.sum())


def _rgb2luv_u8(img: jnp.ndarray) -> jnp.ndarray:
    """OpenCV CV_RGB2Luv on u8 (channel 0 treated as R — the reference feeds
    BGR data through MEImage's RGB pipeline, so the swap is faithful).

    The 8U path applies sRGB inverse companding before XYZ (OpenCV's
    RGB2Luv_b bakes gamma into its interpolation LUT; verified against
    cv2 on gray ramps — L(128) = 136, not the linear-RGB 194). Omitting
    the gamma shifted gray by up to 23 levels and flipped ~20 % of LBP
    codes — the dominant front-end term of the round-4 golden residue."""
    r = img[..., 0].astype(jnp.float32) / 255.0
    g = img[..., 1].astype(jnp.float32) / 255.0
    b = img[..., 2].astype(jnp.float32) / 255.0
    gam = lambda c: jnp.where(
        c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4
    )
    r, g, b = gam(r), gam(g), gam(b)
    x = 0.412453 * r + 0.357580 * g + 0.180423 * b
    y = 0.212671 * r + 0.715160 * g + 0.072169 * b
    z = 0.019334 * r + 0.119193 * g + 0.950227 * b
    thr = 0.008856
    l = jnp.where(y > thr, 116.0 * jnp.cbrt(y) - 16.0, 903.3 * y)
    d = x + 15.0 * y + 3.0 * z
    d = jnp.where(d == 0, 1e-6, d)
    u_p = 4.0 * x / d
    v_p = 9.0 * y / d
    un, vn = 0.19793943, 0.46831096
    u = 13.0 * l * (u_p - un)
    v = 13.0 * l * (v_p - vn)
    l8 = jnp.clip(jnp.rint(l * 255.0 / 100.0), 0, 255)
    u8_ = jnp.clip(jnp.rint((u + 134.0) * 255.0 / 354.0), 0, 255)
    v8 = jnp.clip(jnp.rint((v + 140.0) * 255.0 / 262.0), 0, 255)
    return jnp.stack([l8, u8_, v8], -1).astype(jnp.uint8)


def _lbp_special(gray: jnp.ndarray) -> jnp.ndarray:
    """MEImage lbp_Special (MEImage.cpp:783-813): integer averaged-group
    comparisons on a 5×5 patch; 2-px border stays 0."""
    h, w = gray.shape
    g = gray.astype(jnp.int32)
    p = jnp.pad(g, 2)

    def s(dy, dx):
        return p[2 + dy : 2 + dy + h, 2 + dx : 2 + dx + w]

    center = (s(0, 1) + s(0, -1) + s(-1, 0) + s(1, 0)) // 4
    groups = [
        ((s(-2, -2) + s(-2, -1) + s(-1, -2) + s(-1, -1)) // 4, 1),
        ((s(-1, 0) + s(-2, 0)) // 2, 2),
        ((s(-2, 2) + s(-2, 1) + s(-1, 2) + s(-1, 1)) // 4, 4),
        ((s(0, -1) + s(0, -2)) // 2, 8),
        ((s(0, 1) + s(0, 2)) // 2, 16),
        ((s(2, -2) + s(2, -1) + s(1, -2) + s(1, -1)) // 4, 32),
        ((s(1, 0) + s(-2, 0)) // 2, 64),  # faithful: mixes +1 and −2 rows
        ((s(2, 2) + s(2, 1) + s(1, 2) + s(1, 1)) // 4, 128),
    ]
    code = jnp.zeros((h, w), jnp.int32)
    for val, bit in groups:
        code = code + jnp.where(center <= val, bit, 0)
    interior = np.zeros((h, w), bool)
    interior[2 : h - 2, 2 : w - 2] = True
    return jnp.where(jnp.asarray(interior), code, 0)


@dataclasses.dataclass(frozen=True)
class LbpMrfConfig(BGSConfig):
    showOutput: bool = True
    # "exact" = BK-parity integer min-cut (round 4); "icm" = the historical
    # red/black relaxation deviation
    mrf_solver: str = "exact"
    icm_sweeps: int = 8


@register("LbpMrf", type_id=30, aliases=("lbp-mrf",))
class LbpMrf(BGSAlgorithm):
    Config = LbpMrfConfig

    def init(self, h: int, w: int, c: int = 3) -> State:
        gh, gw = h - AREA + 1, w - AREA + 1
        gwm = gw // 2
        return {
            "t": jnp.zeros((), jnp.int32),
            "hist": jnp.zeros((NH, BINS, gh, gwm), jnp.float32),
            "weights": jnp.full((NH, gh, gwm), 1.0 / NH, jnp.float32),
            "bg_flag": jnp.ones((NH, gh, gwm), jnp.bool_),
            "life": jnp.zeros((gh, gwm), jnp.int32),
            "prev_blue": jnp.zeros((24, 32), jnp.float32),
            "inited": jnp.zeros((gh, gwm), jnp.bool_),
        }

    def _window_hist(self, codes, gh, gw):
        """[8, gh, gw] masked 5×5 histograms for every window position."""
        onehot = (codes[None] == jnp.arange(BINS)[:, None, None]).astype(jnp.float32)
        acc = jnp.zeros((BINS, gh, gw), jnp.float32)
        for dy in range(AREA):
            for dx in range(AREA):
                if _MASK[dy, dx]:
                    acc = acc + onehot[:, dy : dy + gh, dx : dx + gw]
        return acc

    def _update_models(self, st, hist_now, reset, fresh=None, full_fresh=None):
        """UpdateHUPixelData (``MotionDetection.cpp:806-960``) vectorized
        over the model grid — including the reference's exact tie-break and
        warm-up quirks (all load-bearing on this clip; isolated by the f64
        twin experiment, tools/lbpmrf_twin.py / LBPMRF_TWIN.json):

        - best match: iteration ``i = NH-1 … 0`` with a STRICT compare, so
          intersection ties keep the HIGHEST index (early frames tie
          exactly — identical histograms give integer/13 intersections);
        - replace target: min-weight search visits index 0 first, then
          NH-1 … 1 (strict), so weight ties prefer 0, then the highest;
        - background selection (``:908-950``): ONE adjacent-swap pass
          ``i = NH-1 … 1`` (swap on ``<=``) — NOT a full sort (for NH = 3
          it only guarantees the global min lands at position 0) — then
          positions are added tail-first while the cumulative weight stays
          ≤ BG_THRES (the C++ breaks AFTER the crossing add, so the
          crossing position itself is included); everything below the
          break is false. In the settled weights≈[1, ε, ε′] state this
          keeps TWO background histograms (the dominant one plus whichever
          small one the swap pass left on top) where a true sorted-prefix
          rule keeps one — a stale-but-matching histogram can then hold
          bg_rate high;
        - fresh/init (``UpdateModelHU :648-698,734-792``): the bulk-grid
          branch's ``memcpy(…, CurrentHistogram2, sizeof(CurrentHistogram2))``
          copies ``sizeof(float*)`` = 2 floats — bins 2+ keep their prior
          contents (fresh-heap ZEROS on first allocation — what the
          compiled oracle empirically produces — or the pre-reset model
          values on a scene-cut re-init). Only the last-column pre-visit
          (``y%2 == gw%2`` rows) uses the full-size memcpy — passed in as
          ``full_fresh``. With 8-bin histograms holding 2-bit codes
          (everything lives in bins 0-3), the zero tails gut the first
          intersections and the reference emits ~95 %-FG masks on frames
          1-2; not replicating this was the bulk of the round-4 golden
          residue (agreement 0.9736).
        """
        h = st["hist"]
        w = st["weights"]
        bgf = st["bg_flag"]
        life = st["life"] + 1

        inter = jnp.sum(jnp.minimum(hist_now[None], h), axis=1) / SAMPLE_PX  # [NH,...]
        bg_rate = jnp.max(jnp.where(bgf, inter, -1.0), axis=0)
        bg_rate = jnp.maximum(bg_rate, 0.0)
        # ties keep the highest index (strict < improvement, i = NH-1 … 0)
        best = (NH - 1) - jnp.argmax(inter[::-1], axis=0)
        best_oh = jnp.arange(NH)[:, None, None] == best[None]
        replace = jnp.all(inter < PR_THRES, axis=0)

        # replace path: overwrite min-weight histogram, w=0.01, renormalize.
        # Visit order 0, then NH-1 … 1 with strict improvement (:848-857).
        min_i = jnp.zeros_like(best)
        min_w = w[0]
        for i in range(NH - 1, 0, -1):
            better = w[i] < min_w
            min_i = jnp.where(better, i, min_i)
            min_w = jnp.minimum(min_w, w[i])
        min_oh = jnp.arange(NH)[:, None, None] == min_i[None]
        w_rep = jnp.where(min_oh, 0.01, w)
        w_rep = w_rep / jnp.sum(w_rep, axis=0, keepdims=True)
        h_rep = jnp.where(min_oh[:, None], hist_now[None], h)
        bgf_rep = jnp.where(min_oh, False, bgf)

        # update path
        lr = LRATE + jnp.where(life < 100, (100 - life).astype(jnp.float32) / 100.0, 0.0)
        h_upd = jnp.where(
            best_oh[:, None], (1.0 - lr)[None, None] * h + lr[None, None] * hist_now[None], h
        )
        w_upd = lr[None] * best_oh.astype(jnp.float32) + (1.0 - lr)[None] * w
        # background selection: the reference's single bubble pass + tail
        # cumulative (module-docstring quirk above). Positions carry
        # (weight, original index) through the swap network.
        pos_w = [w_upd[i] for i in range(NH)]
        pos_i = [jnp.full_like(best, i) for i in range(NH)]
        for i in range(NH - 1, 0, -1):
            swap = pos_w[i] <= pos_w[i - 1]
            pos_w[i], pos_w[i - 1] = (
                jnp.where(swap, pos_w[i - 1], pos_w[i]),
                jnp.where(swap, pos_w[i], pos_w[i - 1]),
            )
            pos_i[i], pos_i[i - 1] = (
                jnp.where(swap, pos_i[i - 1], pos_i[i]),
                jnp.where(swap, pos_i[i], pos_i[i - 1]),
            )
        added = []
        cum = jnp.zeros_like(w_upd[0])
        for k in range(NH - 1, -1, -1):  # tail-first, f32 adds in C++ order
            added.append((k, cum <= BG_THRES))
            cum = cum + pos_w[k]
        bgf_upd = []
        for i in range(NH):
            flag = jnp.zeros_like(bgf[0])
            for k, a in added:
                flag = jnp.where(pos_i[k] == i, a, flag)
            bgf_upd.append(flag)
        bgf_upd = jnp.stack(bgf_upd)

        hist2 = jnp.where(replace[None, None], h_rep, h_upd)
        w2 = jnp.where(replace[None], w_rep, w_upd)
        bgf2 = jnp.where(replace[None], bgf_rep, bgf_upd)

        # fresh path (first init / scene-cut re-init): bins 0-1 from the
        # current histogram, bins 2+ keep prior contents (the short-memcpy
        # quirk; zeros on first init since the state starts zeroed) — except
        # the full-size last-column pre-visit (full_fresh).
        if fresh is None:
            fresh = reset | ~st["inited"]
        else:
            fresh = fresh | reset
        if full_fresh is not None:
            h_fresh = jnp.broadcast_to(full_fresh[None], h.shape)
        else:
            h_fresh = jnp.concatenate(
                [jnp.broadcast_to(hist_now[None, :2], (NH, 2) + h.shape[2:]), h[:, 2:]],
                axis=1,
            )
        hist2 = jnp.where(fresh[None, None], h_fresh, hist2)
        w2 = jnp.where(fresh[None], 1.0 / NH, w2)
        bgf2 = jnp.where(fresh[None], True, bgf2)
        life = jnp.where(fresh, 0, life)
        bg_rate = jnp.where(fresh, 1.0, bg_rate)
        return dict(
            st, hist=hist2, weights=w2, bg_flag=bgf2, life=life,
            inited=jnp.ones_like(st["inited"]),
        ), bg_rate

    def _mrf_cut(self, bg_rate):
        """The reference's 2-label MRF mask (``GetMotionsMaskHU``
        ``:1279-1321``), solved EXACTLY by default.

        The reference builds ``set_tweights(v, 1, (short)(8·(1−rate)))`` —
        the sink weight is TRUNCATED to an integer — plus unit 4-neighbor
        edges (only for nodes with x>0 & y>0), runs BK max-flow, and labels
        ``what_segment == SINK`` as FG. ``mrf_solver="exact"`` (default)
        reproduces that bit-for-bit: integer capacities, BK's terminal-edge
        cancellation (``graph.cpp:72``), exact parallel push–relabel, and
        the canonical not-source-reachable cut (ops/mincut.py; validated
        vs scipy maximum_flow). ``mrf_solver="icm"`` keeps the round-1..3
        red/black ICM relaxation of the (untruncated) energy — the
        documented historical deviation, retained for A/B."""
        cfg = self.config
        gh, gw = bg_rate.shape

        if cfg.mrf_solver == "exact":
            from tracking_tpu.ops.mincut import grid_mincut_sink_mask

            # (short int)(8f * (1 − rate)): f32 product truncated toward 0
            t_cap = jnp.trunc(
                jnp.float32(MINCUT_W) * (1.0 - bg_rate)
            ).astype(jnp.int32)
            tr_cap = 1 - t_cap  # BK's tr_cap = cap_source − cap_sink
            has = np.zeros((gh, gw), bool)
            has[1:, 1:] = True
            has = jnp.asarray(has)
            return grid_mincut_sink_mask(tr_cap, has, has)

        u_fg = jnp.ones((gh, gw), jnp.float32)
        u_bg = MINCUT_W * (1.0 - bg_rate)
        lab = (u_fg < u_bg).astype(jnp.float32)  # FG where unary-cheaper

        # edge masks: node (x,y) connects to (x−1,y) and (x,y−1) iff x>0 and y>0
        has = np.zeros((gh, gw), bool)
        has[1:, 1:] = True
        has = jnp.asarray(has)

        yy, xx = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
        red = jnp.asarray((yy + xx) % 2 == 0)

        def nb_sum(l):
            p = jnp.pad(l, 1)
            up, down = p[:-2, 1:-1], p[2:, 1:-1]
            left, right = p[1:-1, :-2], p[1:-1, 2:]
            # edge (x,y)-(x,y−1) exists iff has[y,x]; (x,y)-(x−1,y) iff has
            up_w = has.astype(jnp.float32)
            down_w = jnp.pad(has, ((0, 1), (0, 0)))[1:].astype(jnp.float32)
            left_w = has.astype(jnp.float32)
            right_w = jnp.pad(has, ((0, 0), (0, 1)))[:, 1:].astype(jnp.float32)
            s1 = up * up_w + down * down_w + left * left_w + right * right_w
            cnt = up_w + down_w + left_w + right_w
            return s1, cnt

        def half(lab, color):
            s1, cnt = nb_sum(lab)
            e_fg = u_fg + (cnt - s1)  # disagreements if I'm FG
            e_bg = u_bg + s1
            new = (e_fg < e_bg).astype(jnp.float32)
            return jnp.where(color, new, lab)

        for _ in range(self.config.icm_sweeps):
            lab = half(lab, red)
            lab = half(lab, ~red)
        return lab > 0.5

    def step(self, state: State, frame: jnp.ndarray) -> StepResult:
        f3 = frame if frame.ndim == 3 else jnp.repeat(frame[..., None], 3, -1)
        h, w = f3.shape[:2]
        gh, gw = h - AREA + 1, w - AREA + 1
        gwm = gw // 2
        t = state["t"]

        luv = _rgb2luv_u8(f3)
        blue = jax.image.resize(luv[..., 1].astype(jnp.float32), (24, 32), "bilinear")
        diff_pct = 100.0 * jnp.mean(jnp.abs(blue - state["prev_blue"]) > 12)
        reset_all = (diff_pct > 80.0) & (t > 0)

        gray = jnp.clip(
            jnp.rint(
                0.299 * luv[..., 0].astype(jnp.float32)
                + 0.587 * luv[..., 1].astype(jnp.float32)
                + 0.114 * luv[..., 2].astype(jnp.float32)
            ),
            0, 255,
        )
        codes = _lbp_special(gray.astype(jnp.uint8)) >> SHIFT

        hist_all = self._window_hist(codes, gh, gw)  # [8, gh, gw]

        # faithful quirk: the last model column gets a pre-update with the
        # window at x = gw−1 on rows where y%2 == gw%2 (UpdateModelHU :628-718)
        extra_rows = (jnp.arange(gh) % 2) == (gw % 2)
        extra_mask = jnp.zeros((gh, gwm), bool).at[:, gwm - 1].set(True) & extra_rows[:, None]
        hist_extra = jnp.broadcast_to(hist_all[:, :, gw - 1 : gw], (BINS, gh, gwm))
        # fresh = first frame or scene cut, frozen BEFORE the pre-visit so
        # BOTH visits take their init paths on those frames (the reference's
        # MDDataState == ps_Initialized holds for the whole UpdateModelHU
        # pass): the last-column pre-visit re-inits FULLY from its own
        # window (full-size memcpy), the main visit then re-inits bins 0-1
        # from the hist_now window on top (short memcpy) — yielding the
        # reference's hybrid first histograms on the double-visited column.
        reset_grid = jnp.broadcast_to(reset_all, (gh, gwm))
        fresh0 = reset_grid | ~state["inited"]
        zero_reset = jnp.zeros((gh, gwm), bool)
        st2, _ = self._update_models(
            state, hist_extra, zero_reset, fresh=fresh0, full_fresh=hist_extra
        )
        st = {
            k: (
                jnp.where(
                    extra_mask.reshape((1,) * (st2[k].ndim - 2) + extra_mask.shape),
                    st2[k], state[k],
                )
                if hasattr(st2[k], "shape") and st2[k].shape[-2:] == (gh, gwm)
                else state[k]
            )
            for k in st2
        }

        hist_now = hist_all[:, :, 0 : 2 * gwm : 2]  # windows at even x
        st, bg_rate = self._update_models(st, hist_now, zero_reset, fresh=fresh0)

        fg_model = self._mrf_cut(bg_rate)  # [gh, gwm]

        # assemble the mask (GetMotionsMaskHU :1256-1366)
        xs = np.arange(gw)
        ys = np.arange(gh)
        direct = (ys[:, None] % 2) == ((xs[None, :] + 1) % 2)
        xm = np.minimum(xs // 2, gwm - 1)
        fg_cols = fg_model[:, jnp.asarray(xm)]  # [gh, gw]
        left_ok = xs > 1
        right_ok = xs < (w - AREA - 1)
        xl = np.maximum(xs // 2 - 1, 0)
        xr = np.minimum(xs // 2 + 1, gwm - 1)
        votes = (
            (fg_model[:, jnp.asarray(xl)] & jnp.asarray(left_ok)[None]).astype(jnp.int32)
            + (fg_model[:, jnp.asarray(xr)] & jnp.asarray(right_ok)[None]).astype(jnp.int32)
            + jnp.pad(fg_model, ((1, 0), (0, 0)))[:gh][:, jnp.asarray(xm)].astype(jnp.int32)
            + jnp.pad(fg_model, ((0, 1), (0, 0)))[1:][:, jnp.asarray(xm)].astype(jnp.int32)
        )
        grid_fg = jnp.where(jnp.asarray(direct), fg_cols, votes > 1)

        mask = jnp.zeros((h, w), jnp.uint8)
        # model row y → mask row y+3, col x+2 (faithful off-center placement)
        ph = min(gh, h - 3)
        mask = mask.at[3 : 3 + ph, 2 : 2 + gw].set(
            jnp.where(grid_fg[:ph], jnp.uint8(255), jnp.uint8(0))
        )
        mask = jnp.where(state["t"] == 0, jnp.zeros_like(mask), mask)

        mask = fill_holes(mask, seed="corner")
        mask = erode(mask, 3)

        st["t"] = t + 1
        st["prev_blue"] = blue
        bg = jnp.zeros(frame.shape, jnp.uint8)
        return st, mask, bg
