"""FGD — the legacy FGDetector FG_0 / FG_0S models (Li, Huang, Gu, Tian,
"Foreground Object Detection from Videos Containing Complex Background",
ACM MM 2003; OpenCV legacy ``CV_BG_MODEL_FGD`` / ``_FGD_SIMPLE``).

The reference's tracking app offers FG_0/FG_0S/FG_1 stock detectors
(``ustc_src/trackingMain.cpp:37-41``) next to the USTC_BGS override; FG_1
is MOG (implemented as MixtureOfGaussianV1BGS), FG_0/FG_0S are this model.
The detector lives in OpenCV legacy (outside the reference repo), so — as
with the blob trackers — this is a re-derivation from the published method
using OpenCV's parameter struct (``CvFGDStatModelParams``: N1c/N2c color
table sizes, N1cc/N2cc co-occurrence sizes, delta, alpha1/2/3, T,
is_obj_without_holes, perform_morphing, minArea), not a numerical clone.

Method: per pixel, two Bayes tables of quantized-color statistics —
- a COLOR table (stationary pixels): up to N2c entries (color c, P(c),
  P(c, bg)), classification over the N1c most frequent entries by the
  Bayes rule P(bg | c) > 0.5 ⇔ 2·P(c, bg) > P(c);
- a CO-OCCURRENCE table (changed pixels, |cur − prev| > delta): the same
  over (prev, cur) color pairs with N1cc/N2cc.
Unmatched colors are foreground (novel). Statistics decay by alpha2 and
the matched (or newly inserted / min-P replaced) entry is reinforced
toward this frame's label; the reported background image is an alpha1
running average over background pixels. Post-processing: optional
open/close morphing, border-connected hole filling
(is_obj_without_holes), and a minArea connected-component gate.

TPU design: tables are mode-major ([N, H, W] leaves) operated on
array-level along the entry axis — first-match via an exclusive
cumulative-or, matched-entry stats via one-hot masked sums, and "top-N1 by
P" by pairwise rank counting ((P > P_match).sum(axis=0)) instead of keeping
tables sorted — no sorts, no gathers anywhere. Replacement picks the min-P
entry with argmin (first-occurrence ties, matching a select chain). The
entry axis stays a tensor axis rather than a Python unroll: the unrolled
form emitted ~2000 separate [H, W] map ops that XLA fused poorly (67 fps at
720p); the vectorized form is ~30 [N, H, W] ops in a handful of fusions.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from tracking_tpu.bgs.base import BGSAlgorithm, State, StepResult
from tracking_tpu.core.config import BGSConfig
from tracking_tpu.core.registry import register
from tracking_tpu.ops.cc import area_gate
from tracking_tpu.ops.morphology import dilate, erode, fill_holes


@dataclasses.dataclass(frozen=True)
class FGDConfig(BGSConfig):
    # CvFGDStatModelParams defaults (cvaux/include legacy header)
    Lc: int = 128
    N1c: int = 15
    N2c: int = 25
    Lcc: int = 64
    N1cc: int = 25
    N2cc: int = 40
    is_obj_without_holes: bool = True
    perform_morphing: int = 1
    alpha1: float = 0.1
    alpha2: float = 0.005
    alpha3: float = 0.1
    delta: float = 2.0
    T: float = 0.9
    minArea: float = 15.0
    # the paper's foreground-absorption rule: a pixel continuously
    # foreground this long is relabeled background for the statistics
    # updates (and the reference background), so repetitive "dynamic
    # background" motion is gradually learned instead of sticking FG
    absorbFrames: int = 30
    showOutput: bool = True


def _quant(planes, levels):
    """Quantize u8 channels to `levels` (the Lc/Lcc color quantization)."""
    shift = 8 - int(np.log2(levels))
    return tuple(p >> shift for p in planes)


def _first_match(match, unroll=False):
    """(has [H, W], one-hot-first [N, H, W]) over [N, H, W] match flags —
    entry n is "first" iff it matches and no earlier entry does.

    Two formulations with IDENTICAL exact (boolean/integer) semantics:
    the vectorized exclusive-cumsum for XLA (the unrolled chain measured
    ~2.4 ms/frame slower — it breaks XLA's reduction fusion, the same
    failure the module docstring records for full unrolls), and a
    running-or unroll for the Pallas kernel (Mosaic cannot lower
    cumsum)."""
    if not unroll:
        m = match.astype(jnp.int32)
        first = match & ((jnp.cumsum(m, axis=0) - m) == 0)
        return jnp.any(match, axis=0), first
    firsts = []
    seen = jnp.zeros_like(match[0])
    for i in range(match.shape[0]):
        firsts.append(match[i] & ~seen)
        seen = seen | match[i]
    return seen, jnp.stack(firsts)


class _Table:
    """Mode-major Bayes table: keys [N, Ck, H, W] u8, P / Pb [N, H, W]
    stored STAT_DTYPE.

    Stat arithmetic runs in f32 with STAT_DTYPE as the storage format
    (one down-conversion per leaf per frame at the update store — strictly
    tighter than per-op narrow rounding). ``in_kernel`` selects
    Mosaic-lowerable formulations for the Pallas path (i32 key compares,
    unrolled first-match/argmin — Mosaic has no u8/bf16 vector compares,
    no cumsum, no lead-axis argmin, no i1 vector select); each has exactly
    the XLA formulation's boolean/integer semantics, so the paths stay
    bit-identical."""

    def __init__(self, state, prefix, N, in_kernel=False):
        self.in_kernel = in_kernel
        self.stat_dtype = state[f"{prefix}_P"].dtype
        self.keys_u8 = state[f"{prefix}_key"]
        self.keys = self.keys_u8.astype(jnp.int32) if in_kernel else self.keys_u8
        self.P = state[f"{prefix}_P"].astype(jnp.float32)
        self.Pb = state[f"{prefix}_Pb"].astype(jnp.float32)
        self.N = N
        # broadcasted_iota, not arange+reshape (Mosaic: "unsupported
        # shape cast" on 1D->3D reshape; identical value)
        self.idx = jax.lax.broadcasted_iota(jnp.int32, (N, 1, 1), 0)

    def match(self, key):
        """key: [Ck, H, W] u8. Exact quantized match per entry →
        [N, H, W]. XLA: dense u8 compare + all(axis=1). Kernel: i32
        channel loop (Mosaic has no u8 vector compares, and a 4D
        lead-axis reduction hits "invalid relayout"); exact either way."""
        if not self.in_kernel:
            return jnp.all(self.keys == key[None], axis=1) & (self.P > 0.0)
        k = key.astype(jnp.int32)
        m = None
        for c in range(self.keys.shape[1]):
            eq = self.keys[:, c] == k[c][None]
            m = eq if m is None else (m & eq)
        return m & (self.P > 0.0)

    def classify(self, match, n1, T):
        """BG where the first matched entry is among the top-n1 by P and
        2·Pb > T·P (T folds the paper's prior threshold). The rank is
        computed for the matched entry only — one [N, H, W] compare-reduce,
        O(N) instead of the O(N²) of ranking every entry."""
        has, first = _first_match(match, self.in_kernel)
        P_m = jnp.sum(jnp.where(first, self.P, 0.0), axis=0)
        Pb_m = jnp.sum(jnp.where(first, self.Pb, 0.0), axis=0)
        idx_m = jnp.sum(jnp.where(first, self.idx, 0), axis=0)
        rank = jnp.sum(
            (self.P > P_m[None])
            | ((self.P == P_m[None]) & (self.idx < idx_m[None])),
            axis=0,
            dtype=jnp.int32,
        )
        return has, has & (rank < n1) & (2.0 * Pb_m > T * P_m)

    def update(self, state, prefix, match, key, do, is_bg, alpha):
        """Decay all entries; reinforce the matched entry, or insert/replace
        the min-P entry (argmin keeps first-occurrence ties), only where
        `do`."""
        has, first = _first_match(match, self.in_kernel)
        # min-P entry with first-occurrence ties: jnp.argmin in XLA; a
        # strict-< unroll in the kernel (identical tie semantics; Mosaic
        # cannot lower argmin over the lead axis)
        if not self.in_kernel:
            min_idx = jnp.argmin(self.P, axis=0).astype(jnp.int32)
        else:
            min_idx = jnp.zeros_like(self.P[0], dtype=jnp.int32)
            min_v = self.P[0]
            for i in range(1, self.N):
                better = self.P[i] < min_v
                min_idx = jnp.where(better, i, min_idx)
                min_v = jnp.minimum(min_v, self.P[i])
        # and/or form, not where-on-bools (Mosaic has no i1 vector select)
        at = (
            (has[None] & first)
            | (~has[None] & (self.idx == min_idx[None]))
        ) & do[None]
        lab = is_bg.astype(jnp.float32)
        p_dec = self.P * (1.0 - alpha)
        pb_dec = self.Pb * (1.0 - alpha)
        # replacement resets the entry; a match reinforces it
        p_new = jnp.where(has[None], p_dec + alpha, alpha)
        pb_new = jnp.where(has[None], pb_dec + alpha * lab, alpha * lab)
        key_src = key.astype(jnp.int32) if self.in_kernel else key
        state[f"{prefix}_key"] = jnp.where(
            (at & ~has[None])[:, None], key_src[None], self.keys
        ).astype(jnp.uint8)
        state[f"{prefix}_P"] = jnp.where(
            do[None], jnp.where(at, p_new, p_dec), self.P
        ).astype(self.stat_dtype)
        state[f"{prefix}_Pb"] = jnp.where(
            do[None], jnp.where(at, pb_new, pb_dec), self.Pb
        ).astype(self.stat_dtype)


_TABLE_LEAVES = ("ct_key", "ct_P", "ct_Pb", "cc_key", "cc_P", "cc_Pb", "fg_age")


def _tables_phase(cfg, st, ckey, cckey, changed, first, in_kernel=False):
    """The whole Bayes-table phase on [H, W]-shaped maps (or tiles): match,
    classify, label (incl. foreground absorption) and decay/reinforce both
    tables. Shared VERBATIM by the XLA path and the fused Pallas kernel
    (ops/pallas_fgd.py) — every op is pointwise over pixels (reductions run
    along the entry axis only), so tiling is exact.

    st: dict with the _TABLE_LEAVES arrays; ckey [C, ...] / cckey [2C, ...]
    quantized keys; changed [...] bool; first: traced scalar bool (t == 0).
    Returns (updates dict over _TABLE_LEAVES, is_bg, lab_bg)."""
    ct = _Table(st, "ct", cfg.N2c, in_kernel)
    cc = _Table(st, "cc", cfg.N2cc, in_kernel)
    ct_m = ct.match(ckey)
    cc_m = cc.match(cckey)
    ct_has, ct_bg = ct.classify(ct_m, cfg.N1c, cfg.T)
    cc_has, cc_bg = cc.classify(cc_m, cfg.N1cc, cfg.T)

    # stationary pixels consult the color table, changed pixels the
    # co-occurrence table; unmatched (novel) colors are foreground
    # (and/or form, not where-on-bools — Mosaic has no i1 vector select)
    is_bg = (changed & cc_has & cc_bg) | (~changed & ct_has & ct_bg)
    is_bg = is_bg | first  # first frame: all background

    # foreground absorption: a pixel continuously foreground for
    # absorbFrames keeps being relabeled background for the updates
    # until the statistics genuinely flip it (the counter only resets
    # on a real background classification)
    fg_age = jnp.where(is_bg, 0, st["fg_age"] + 1)
    absorbed = fg_age >= cfg.absorbFrames
    lab_bg = is_bg | absorbed

    out = {k: st[k] for k in _TABLE_LEAVES}
    out["fg_age"] = fg_age
    ct.update(out, "ct", ct_m, ckey, ~changed | first, lab_bg, cfg.alpha2)
    cc.update(out, "cc", cc_m, cckey, changed, lab_bg, cfg.alpha2)
    return out, is_bg, lab_bg


@register("FGD", aliases=("FG_0", "fgd"))
class FGD(BGSAlgorithm):
    """FG_0: the full FGD model."""

    Config = FGDConfig

    # P/Pb statistics dtype: f16 halves the dominant HBM stream (the
    # N2c+N2cc = 65 P/Pb plane pairs are decayed+rewritten every frame;
    # f16 vs f32 measured 3.81 vs 5.24 ms/frame table phase at 720p,
    # round 5). The model is a re-derivation with no bit-exact oracle
    # (module docstring); the f16-vs-f32 mask agreement is pinned by
    # tests/test_bgs_fgd.py (0.9989 / settled IoU 0.9968 on the full real
    # clip). Round-5 dtype survey: bf16 REJECTED — its 8-bit mantissa
    # stalls the alpha2 = 0.005 absorption dynamic (the co-occurrence
    # absorption test fails); f32 exact but +1.4 ms. The opt-in Pallas
    # table kernel requires f32 (Mosaic has no f16 at all). Set to
    # jnp.float32 to restore exact stats.
    STAT_DTYPE = jnp.float16

    def init(self, h: int, w: int, c: int = 3) -> State:
        cfg = self.config
        c = max(c, 1)
        z8 = lambda n, k: jnp.zeros((n, k, h, w), jnp.uint8)
        zf = lambda n: jnp.zeros((n, h, w), self.STAT_DTYPE)
        return {
            "t": jnp.zeros((), jnp.int32),
            "prev": jnp.zeros((c, h, w), jnp.uint8),
            "bg": jnp.zeros((c, h, w), jnp.uint8),
            "ct_key": z8(cfg.N2c, c),
            "ct_P": zf(cfg.N2c),
            "ct_Pb": zf(cfg.N2c),
            "cc_key": z8(cfg.N2cc, 2 * c),
            "cc_P": zf(cfg.N2cc),
            "cc_Pb": zf(cfg.N2cc),
            "fg_age": jnp.zeros((h, w), jnp.int32),
        }

    def step(self, state: State, frame: jnp.ndarray) -> StepResult:
        cfg = self.config
        planes = (
            tuple(frame[..., ci] for ci in range(frame.shape[-1]))
            if frame.ndim == 3
            else (frame,)
        )
        c = len(planes)
        h, w = planes[0].shape
        t = state["t"]
        st = dict(state)

        prev = tuple(state["prev"][ci] for ci in range(c))
        diff_big = jnp.zeros((h, w), bool)
        for ci in range(c):
            d = jnp.abs(planes[ci].astype(jnp.int32) - prev[ci].astype(jnp.int32))
            diff_big = diff_big | (d > cfg.delta)
        changed = diff_big & (t > 0)

        ckey = jnp.stack(_quant(planes, cfg.Lc))  # [C, H, W]
        cckey = jnp.stack(
            _quant(prev, cfg.Lcc) + _quant(planes, cfg.Lcc)
        )  # [2C, H, W]

        # Optional fused Pallas table phase (ops/pallas_fgd.py). Measured
        # A/B verdict: a REGRESSION on hardware (6.8 vs ~3.8 ms — Mosaic
        # lacks u8 vector compares so key matching runs i32-widened at 1/4
        # lane density; see the kernel module docstring), so the DEFAULT is
        # the XLA formulation and TRACKING_TPU_FGD=pallas opts in;
        # =interp forces the interpret-mode kernel (CPU parity tests).
        first = t == 0
        fgd_env = os.environ.get("TRACKING_TPU_FGD", "xla")
        if fgd_env == "pallas" and self.STAT_DTYPE == jnp.float16:
            raise RuntimeError(
                "TRACKING_TPU_FGD=pallas requires f32 stats (Mosaic has "
                "no f16): set FGD.STAT_DTYPE = jnp.float32"
            )
        if (
            jax.default_backend() == "tpu" and fgd_env == "pallas"
        ) or fgd_env == "interp":
            from tracking_tpu.ops.pallas_fgd import fgd_tables_pallas

            updates, is_bg, lab_bg = fgd_tables_pallas(
                _tables_phase, cfg, state, ckey, cckey, changed, first,
                interpret=fgd_env == "interp",
            )
        else:
            updates, is_bg, lab_bg = _tables_phase(
                cfg, state, ckey, cckey, changed, first
            )
        st.update(updates)

        raw = jnp.where(is_bg, jnp.uint8(0), jnp.uint8(255))
        fg = raw
        if cfg.perform_morphing > 0:
            for _ in range(cfg.perform_morphing):
                fg = dilate(erode(fg, 3), 3)  # open: kill specks
        if cfg.is_obj_without_holes:
            filled = fill_holes(fg, seed="border")
            fg = jnp.where(filled > 0, jnp.uint8(255), jnp.uint8(0))
        if cfg.minArea > 0:
            # drop components below minArea (the top-64-by-area cap only
            # ever drops blobs smaller than every kept one); area_gate runs
            # the CC pass once and reuses the MXU one-hot for the keep mask
            # (the old extract_blobs + label_components + [64,H,W] compare
            # measured 2.5 of FGD's 9.2 ms/frame)
            fg = area_gate(fg, cfg.minArea, max_blobs=64)

        new_bg = tuple(
            jnp.where(
                lab_bg,
                jnp.rint(
                    (1.0 - cfg.alpha1) * state["bg"][ci].astype(jnp.float32)
                    + cfg.alpha1 * planes[ci].astype(jnp.float32)
                ).astype(jnp.uint8),
                state["bg"][ci],
            )
            for ci in range(c)
        )
        new_bg = tuple(
            jnp.where(t == 0, planes[ci], new_bg[ci]) for ci in range(c)
        )

        st["t"] = t + 1
        st["prev"] = jnp.stack(planes)
        st["bg"] = jnp.stack(new_bg)
        bg_img = jnp.moveaxis(st["bg"], 0, -1) if frame.ndim == 3 else st["bg"][0]
        return st, fg, bg_img


@register("FGDSimple", aliases=("FG_0S", "fgd-simple"))
class FGDSimple(FGD):
    """FG_0S: the simplified-parameter FGD variant (no morphing cycle)."""

    @dataclasses.dataclass(frozen=True)
    class Config(FGDConfig):
        perform_morphing: int = 0
