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
import os

import jax
import jax.numpy as jnp
import numpy as np

from tracking_tpu.bgs.base import BGSAlgorithm, State, StepResult
from tracking_tpu.core.config import BGSConfig
from tracking_tpu.bgs.gmm import _sort_desc_maps
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
    # wrapper status machine (MultiLayerBGS.cpp:44-216): LEARN uses the
    # rates above; DETECT switches to the detect_* rates and optionally
    # freezes the model (disableLearning applies only in DETECT, :100-107).
    # detectAfter > 0 flips LEARN -> DETECT at that frame (:201-218).
    # bg_model_preload: orbax checkpoint to load at start (BGS->Load,
    # :94-98); saveModel: save the model there at finish when in LEARN
    # (:44-48, default path models/MultiLayerBGSModel).
    status: str = "MLBGS_LEARN"
    detectAfter: int = 0
    detect_mode_learn_rate_per_second: float = 0.01
    detect_weight_learn_rate_per_second: float = 0.01
    detect_init_mode_weight: float = 0.001
    bg_model_preload: str = ""
    saveModel: bool = False
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
    # -- mode-major frame update (no per-pixel vmap) -------------------------
    # The original formulation vmapped a per-pixel function over H×W with
    # per-pixel argsorts over the M=5 mode axis — million-pixel gathers that
    # crash the TPU worker (same failure mode as the pre-rewrite GMM family;
    # see PERF.md). This version works on whole [H, W] maps with the mode
    # axis as Python lists (static M unroll): best-mode reads are select
    # chains, compactions are O(M²) masked selects, and the weight sort is
    # the gmm.py odd-even transposition network. Observational equivalences
    # used (validated by the sequential-oracle tests):
    # - mode lists are weight-sorted at frame entry (the previous frame
    #   sorted them), so the re-sort after the single-mode removal is the
    #   identity and is skipped;
    # - background-layer numbers stay consecutive 1..k (promotion appends
    #   max+1; simultaneous removal decrements each survivor by the number
    #   of removed layers below it), so rank-renumbering is the identity;
    # - the final weight sort runs unconditionally (when learning): whenever
    #   the reference skips it (n ≤ 1) sorting is the identity anyway, and
    #   the strict-compare network preserves tie order (stability).

    def step(self, state: State, frame: jnp.ndarray) -> StepResult:
        cfg = self.config
        M = cfg.max_mode_num
        f3 = frame if frame.ndim == 3 else jnp.repeat(frame[..., None], 3, -1)
        h, w_ = f3.shape[:2]
        C = f3.shape[2]
        t = state["t"]
        frame_idx = t + 1  # SetNewImage pre-increments m_nCurImgFrameIdx
        detect = cfg.status.upper().endswith("DETECT")
        lr_l = cfg.mode_learn_rate_per_second * cfg.frame_duration
        wlr_l = cfg.weight_learn_rate_per_second * cfg.frame_duration
        lr_d = cfg.detect_mode_learn_rate_per_second * cfg.frame_duration
        wlr_d = cfg.detect_weight_learn_rate_per_second * cfg.frame_duration
        if cfg.detectAfter > 0 and not detect:
            # LEARN -> DETECT at frame detectAfter (MultiLayerBGS.cpp:201-218)
            # — a traced rate switch; freezing the model mid-run would need
            # a static branch, so disableLearning requires status=DETECT
            if cfg.disableLearning:
                raise ValueError(
                    "disableLearning applies in DETECT mode; combined with "
                    "detectAfter set status='MLBGS_DETECT' for the detect "
                    "phase instead (chunk-granularity restart)"
                )
            det_now = frame_idx > cfg.detectAfter
            # The reference HARD-CODES the detect-phase parameters when the
            # flip is triggered by detectAfter (MultiLayerBGS.cpp:206-209:
            # 0.01 / 0.01 / 0.001, ignoring any configured detect_* values);
            # match that exactly — user detect_* overrides apply only when
            # status is set to MLBGS_DETECT directly.
            lr_da = 0.01 * cfg.frame_duration
            wlr_da = 0.01 * cfg.frame_duration
            lr = jnp.where(det_now, lr_da, lr_l)
            wlr = jnp.where(det_now, wlr_da, wlr_l)
            imw = jnp.where(det_now, 0.001, cfg.init_mode_weight)
        else:
            lr = lr_d if detect else lr_l
            wlr = wlr_d if detect else wlr_l
            imw = cfg.detect_init_mode_weight if detect else cfg.init_mode_weight
        wuc = cfg.weight_updating_constant
        # the wrapper only honors disableLearning in DETECT (:100-107)
        learn = not (detect and cfg.disableLearning)

        gray = bgr2gray_u8(f3).astype(jnp.float32)
        cur_pat = jnp.stack(
            [
                (gray - _shift_zero(gray, dx, dy) + cfg.robust_LBP_constant > 0).astype(
                    jnp.float32
                )
                for dx, dy in _ML_OFFSETS
            ],
            axis=0,
        )  # [L, H, W]
        cf = jnp.moveaxis(f3, -1, 0).astype(jnp.float32)  # [C, H, W]
        first_frame = state["n"][0, 0] == 0  # bFirstFrame (PLBP[0].num == 0)

        # Fused Pallas path on TPU: the whole per-pixel update (removal,
        # distances, three-branch blend, compaction, sort, bg_num) runs
        # VMEM-resident per tile — state is read and written ONCE per frame
        # instead of re-materializing between XLA fusions (~7 ms → see
        # PERF.md round-5). TRACKING_TPU_MULTILAYER=xla restores the XLA
        # formulation; =interp forces the interpret-mode kernel (CPU parity
        # tests). Both paths share _ml_update verbatim.
        ml_env = os.environ.get("TRACKING_TPU_MULTILAYER", "pallas")
        if (
            jax.default_backend() == "tpu" and ml_env != "xla"
        ) or ml_env == "interp":
            from tracking_tpu.ops.pallas_multilayer import multilayer_step_pallas

            maps, out_dist = multilayer_step_pallas(
                _ml_update,
                cfg,
                state,
                cf,
                cur_pat,
                lr,
                wlr,
                imw,
                frame_idx,
                learn,
                interpret=ml_env == "interp",
            )
            new_state = {"t": frame_idx, **maps}
        else:
            n = state["n"]
            bg_num = state["bg_num"]
            # mode axis as Python lists ("w" [H,W] f32, vec entries
            # [C,H,W]/[L,H,W])
            A = {
                short: [state[leaf][m] for m in range(M)]
                for leaf, short in _LEAF_SPEC
            }
            A, n, bg_num, out_dist = _ml_update(
                cfg, A, n, bg_num, cf, cur_pat, lr, wlr, imw, frame_idx, learn
            )
            new_state = {"t": frame_idx, "n": n, "bg_num": bg_num}
            for leaf, short in _LEAF_SPEC:
                new_state[leaf] = jnp.stack(A[short])

        ksize = 2 * cfg.pattern_neig_half_size + 1
        dist_s = gaussian_blur(out_dist, ksize, cfg.pattern_neig_gaus_sigma)
        fg = jnp.where(
            dist_s > cfg.bg_prob_threshold, jnp.uint8(255), jnp.uint8(0)
        )
        fg = jnp.where(first_frame, jnp.zeros_like(fg), fg)

        bg = jnp.clip(jnp.rint(new_state["bg_int"][0]), 0, 255).astype(jnp.uint8)
        bg = jnp.moveaxis(bg, 0, -1)
        if frame.ndim == 2:
            bg = bg[..., 0]
        return new_state, fg, bg


# per-mode state leaves and their short names in the update's A dict; VEC
# names carry a leading feature axis ([C] or [L]) under the mode axis
_LEAF_SPEC = (
    ("weight", "w"),
    ("max_weight", "mw"),
    ("bg_int", "bi"),
    ("min_int", "mini"),
    ("max_int", "maxi"),
    ("bg_pattern", "bp"),
    ("bg_layer", "layer"),
    ("layer_time", "layt"),
    ("first_time", "ft"),
    ("last_time", "lt"),
    ("freq", "fq"),
)
VEC = ("bi", "mini", "maxi", "bp")  # have a leading feature axis


def _ml_update(cfg, A, n, bg_num, cf, cur_pat, lr, wlr, imw, frame_idx, learn):
    """The whole per-pixel frame update on [H, W]-shaped maps (or tiles).

    Shared VERBATIM by the XLA path (full maps) and the Pallas kernel
    (VMEM-resident [TH, TW] tiles, ops/pallas_multilayer.py) — every op is
    pointwise over pixels, so tiling is exact. Returns (A, n, bg_num,
    out_dist)."""
    M = cfg.max_mode_num
    h, w_ = n.shape
    wuc = cfg.weight_updating_constant

    def bc(cond, name):
        return cond[None] if name in VEC else cond

    def sel(idx, maps):
        """maps[idx[p]] per pixel — M-way select chain, no gather."""
        out = maps[0]
        for m in range(1, M):
            out = jnp.where(idx == m, maps[m], out)
        return out

    def bg_num_of(ws, n_act):
        """Smallest prefix of the (sorted) active weights holding
        > bg_mode_percent of the total (CMultiLayerBGS.cpp:727-748)."""
        aw = [jnp.where(n_act > m, ws[m], 0.0) for m in range(M)]
        tot = sum(aw)
        cum = jnp.zeros_like(tot)
        bg2 = jnp.zeros(tot.shape, jnp.int32)
        found = jnp.zeros(tot.shape, bool)
        for m in range(M):
            cum = cum + aw[m]
            over = cum > cfg.bg_mode_percent * tot
            bg2 = jnp.where(~found & over, m + 1, bg2)
            found = found | over
        return bg2

    # ---- RemoveBackgroundLayers, single-removal variant (per frame) ----
    changed1 = jnp.zeros((h, w_), bool)
    if learn:
        rem = [
            (A["layer"][m] > 0)
            & (A["w"][m] < cfg.min_bg_layer_weight)
            & (n > m)
            for m in range(M)
        ]
        r = jnp.full((h, w_), M, jnp.int32)
        for m in reversed(range(M)):
            r = jnp.where(rem[m], m, r)
        changed1 = r < M
        rl = sel(jnp.minimum(r, M - 1), A["layer"])  # layer of the removed
        # compact: shift slots ≥ r down by one (sorted order is preserved
        # — single removal from a sorted list — so no re-sort here)
        for k in A:
            old = A[k]
            A[k] = [
                jnp.where(
                    bc(changed1 & (r <= m), k), old[min(m + 1, M - 1)], old[m]
                )
                if m < M - 1
                else old[m]
                for m in range(M)
            ]
        dec_on = changed1 & (rl > 0)
        A["layer"] = [
            jnp.where(dec_on & (A["layer"][m] > rl), A["layer"][m] - 1, A["layer"][m])
            for m in range(M)
        ]
        n = n - changed1.astype(jnp.int32)
        bg_num = jnp.where(changed1, bg_num_of(A["w"], n), bg_num)

    active = [n > m for m in range(M)]
    is_empty = n == 0

    # ---- distances ------------------------------------------------------
    lbp_thr = 1.0 - cfg.min_lbp_binary_prob
    offset = max(cfg.robust_LBP_constant, 5.0)
    min_sine = np.sin(cfg.min_noised_angle)
    n2c = jnp.sum(cf * cf, axis=0)
    INF = jnp.float32(np.inf)
    best_d = jnp.full((h, w_), INF)
    best = jnp.zeros((h, w_), jnp.int32)
    for m in range(M):
        tex_d = jnp.mean(
            (jnp.abs(cur_pat - A["bp"][m]) > lbp_thr).astype(jnp.float32), axis=0
        )
        bi = A["bi"][m]
        lo = jnp.minimum(A["mini"][m], bi * cfg.shadow_rate - 5.0)
        hi = jnp.maximum(A["maxi"][m], bi * cfg.highlight_rate + 5.0)
        out_range = jnp.any((cf > hi) | (cf < lo), axis=0)
        dot = jnp.sum(bi * cf, axis=0)
        n1 = jnp.sum(bi * bi, axis=0)
        sin2 = jnp.maximum(1.0 - dot * dot / jnp.maximum(n1 * n2c, 1e-20), 0.0)
        org_angle = jnp.where(n1 * n2c == 0, 0.0, jnp.sqrt(sin2))
        norm_bg = jnp.sqrt(n1)
        sin_noise = offset / jnp.maximum(norm_bg, 1e-20)
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
        joint = jnp.where(active[m], joint, INF)
        better = joint < best_d  # strict < = first minimum, as reference
        best = jnp.where(better, m, best)
        best_d = jnp.minimum(best_d, joint)

    updating = best_d < cfg.bg_prob_updating_threshold
    penal = (best >= bg_num) & (sel(best, A["mw"]) < cfg.reliable_bg_mode_weight)
    out_dist = jnp.where(
        penal, jnp.maximum(best_d, cfg.bg_prob_threshold * 2.5), best_d
    )

    do_match = (~is_empty) & updating & learn
    do_nomatch = (~is_empty) & (~updating) & learn

    # ---- the three per-pixel branches, blended per mode ------------------
    # seed (empty list, CMultiLayerBGS.cpp:475-505)
    S = {k: list(v) for k, v in A.items()}
    at0 = [m == 0 for m in range(M)]
    for m in range(M):
        if m == 0:
            S["w"][m] = jnp.full((h, w_), 1.0) * imw
            S["mw"][m] = jnp.full((h, w_), 1.0) * imw
            S["bi"][m] = cf
            S["mini"][m] = cf
            S["maxi"][m] = cf
            S["bp"][m] = cur_pat
            S["layer"][m] = jnp.zeros((h, w_), jnp.int32)
            S["ft"][m] = jnp.full((h, w_), frame_idx, jnp.int32)
            S["lt"][m] = jnp.full((h, w_), frame_idx, jnp.int32)
            S["fq"][m] = jnp.ones((h, w_), jnp.int32)

    # no match: decay all active, append (or overwrite the tail when full)
    NM = {k: list(v) for k, v in A.items()}
    slot_app = jnp.minimum(n, M - 1)
    for m in range(M):
        decay = 1.0 - wlr / (1.0 + wuc * NM["mw"][m])
        wdec = jnp.where(active[m], NM["w"][m] * decay, NM["w"][m])
        at = slot_app == m
        NM["w"][m] = jnp.where(at, imw, wdec)
        NM["mw"][m] = jnp.where(at, imw, NM["mw"][m])
        NM["bi"][m] = jnp.where(at[None], cf, NM["bi"][m])
        NM["mini"][m] = jnp.where(at[None], cf, NM["mini"][m])
        NM["maxi"][m] = jnp.where(at[None], cf, NM["maxi"][m])
        NM["bp"][m] = jnp.where(at[None], cur_pat, NM["bp"][m])
        NM["layer"][m] = jnp.where(at, 0, NM["layer"][m])
        NM["layt"][m] = jnp.where(at, -1, NM["layt"][m])
        NM["ft"][m] = jnp.where(at, frame_idx, NM["ft"][m])
        NM["lt"][m] = jnp.where(at, frame_idx, NM["lt"][m])
        NM["fq"][m] = jnp.where(at, 1, NM["fq"][m])

    # match: update best, layer bookkeeping, decay others (:687-723)
    MT = {k: list(v) for k, v in A.items()}
    for m in range(M):
        at = best == m
        MT["ft"][m] = jnp.where(
            at, jnp.maximum(jnp.minimum(MT["ft"][m], frame_idx), 0), MT["ft"][m]
        )
        MT["lt"][m] = jnp.where(at, frame_idx, MT["lt"][m])
        MT["fq"][m] = jnp.where(at, MT["fq"][m] + 1, MT["fq"][m])
        MT["bi"][m] = jnp.where(at[None], (1 - lr) * MT["bi"][m] + lr * cf, MT["bi"][m])
        MT["mini"][m] = jnp.where(at[None], jnp.minimum(MT["mini"][m], cf), MT["mini"][m])
        MT["maxi"][m] = jnp.where(at[None], jnp.maximum(MT["maxi"][m], cf), MT["maxi"][m])
        MT["bp"][m] = jnp.where(
            at[None], (1 - lr) * MT["bp"][m] + lr * cur_pat, MT["bp"][m]
        )
        inc = wlr * (1.0 + wuc * MT["mw"][m])
        MT["w"][m] = jnp.where(at, (1.0 - inc) * MT["w"][m] + inc, MT["w"][m])
        MT["mw"][m] = jnp.where(at, jnp.maximum(MT["w"][m], MT["mw"][m]), MT["mw"][m])

    b_layer = sel(best, MT["layer"])
    b_w = sel(best, MT["w"])
    b_mw = sel(best, MT["mw"])
    displaced = [
        (b_layer > 0)
        & (b_w > b_mw * 0.2)
        & (MT["layer"][m] > b_layer)
        & (MT["w"][m] < MT["mw"][m] * 0.9)
        & active[m]
        for m in range(M)
    ]
    promote = (b_layer == 0) & (b_mw > cfg.reliable_bg_mode_weight)
    max_layer = jnp.zeros((h, w_), jnp.int32)
    for m in range(M):
        max_layer = jnp.maximum(
            max_layer, jnp.where(active[m], MT["layer"][m], 0)
        )
    for m in range(M):
        at = best == m
        MT["layer"][m] = jnp.where(at & promote, max_layer + 1, MT["layer"][m])
        MT["layt"][m] = jnp.where(at & promote, frame_idx, MT["layt"][m])
        decay = 1.0 - wlr / (1.0 + wuc * MT["mw"][m])
        MT["w"][m] = jnp.where(
            active[m] & ~at, MT["w"][m] * decay, MT["w"][m]
        )

    for k in A:
        A[k] = [
            jnp.where(
                bc(do_match, k),
                MT[k][m],
                jnp.where(
                    bc(do_nomatch, k),
                    NM[k][m],
                    jnp.where(bc(is_empty, k), S[k][m], A[k][m]),
                ),
            )
            for m in range(M)
        ]
    n = jnp.where(is_empty, 1, jnp.where(do_nomatch, jnp.minimum(n + 1, M), n))
    bg_num = jnp.where(is_empty, 1, bg_num)

    # ---- displaced-layer removal (multi-mode, match path) ---------------
    changed4 = jnp.zeros((h, w_), bool)
    if learn:
        rem4 = [displaced[m] & do_match for m in range(M)]
        keep = [~rem4[m] & (n > m) for m in range(M)]
        layer_old = list(A["layer"])
        dec = [
            sum(
                (
                    rem4[k2]
                    & (layer_old[k2] > 0)
                    & (layer_old[m] > layer_old[k2])
                ).astype(jnp.int32)
                for k2 in range(M)
            )
            for m in range(M)
        ]
        A["layer"] = [layer_old[m] - dec[m] for m in range(M)]
        # stable compaction: source j lands at target (#kept ≤ j) − 1
        kc = []
        run = jnp.zeros((h, w_), jnp.int32)
        for m in range(M):
            run = run + keep[m].astype(jnp.int32)
            kc.append(run - 1)
        for k in A:
            old = A[k]
            newl = []
            for m in range(M):
                v = old[m]
                for j in range(M):
                    v = jnp.where(bc(keep[j] & (kc[j] == m), k), old[j], v)
                newl.append(v)
            A[k] = newl
        n_rem = sum(rem4[m].astype(jnp.int32) for m in range(M))
        changed4 = n_rem > 0
        n = n - n_rem
        # (layer numbers stay consecutive — see the invariant note above —
        # so the reference's rank-renumbering is the identity and skipped)

        # ---- final weight sort + bg_num (:727-748) ----------------------
        # unconditional when learning: whenever the reference skips it
        # (n ≤ 1) it is the identity; stability keeps tie order
        key = [jnp.where(n > m, A["w"][m], -INF) for m in range(M)]
        names = list(A.keys())
        _, sorted_payloads = _sort_desc_maps(key, [A[k2] for k2 in names])
        A = dict(zip(names, sorted_payloads))
        gate = ((n > 1) & ~is_empty) | changed1 | changed4 | is_empty
        bg_num = jnp.where(gate, bg_num_of(A["w"], n), bg_num)

    out_dist = jnp.where(is_empty, 0.0, out_dist)
    return A, n, bg_num, out_dist
