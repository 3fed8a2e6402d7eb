"""LBSP-family BGS: LOBSTER and SuBSENSE — the reference's north-star models.

References (all in ``/root/reference/package_bgs/pl/``):
- LOBSTER: ``BackgroundSubtractorLOBSTER.cpp:31-289`` (N=35 color+LBSP samples,
  fixed thresholds, learning rate 16; ustc type 37).
- SuBSENSE: ``BackgroundSubtractorSuBSENSE.cpp:82-700`` (N=50 sample consensus
  with per-pixel feedback loops R(x)/T(x)/v(x)/D_min, blink detection,
  unstable-region masks, LBSP-threshold-LUT rescaling, downsampled
  camera-motion analysis with auto model reset; ustc type 36).

TPU-native reformulations (each argued in place):
- **Per-channel pytree leaves**: color channels are separate ``[N, H, W]`` /
  ``[H, W]`` arrays (tuples of length C), never a size-3 tensor axis. TPU
  (8, 128) tiling pads any minor dim to 128 lanes; XLA's remat/copy layout
  choices put a C=3 axis minor at 720p and blew HBM up 42.7× (measured OOM:
  28 GB for a 264 MB logical array). With channels as leaves every array ends
  in H×W and tiles perfectly; the C loop is a static Python unroll (C ≤ 3).
- The per-sample early-exit scan becomes a ``lax.scan`` over the N sample
  banks with a saturating good-counter carry — mins/counters update only while
  ``count < required``, which reproduces the reference's early-exit semantics
  exactly (samples after the 2nd good one never contribute).
- The 16-neighbor LBSP stack is computed once per frame and shared by all N
  inter-frame descriptor evaluations (the reference recomputes neighborhood
  loads per sample).
- The stochastic *scatter* "write my value into a random neighbor's model"
  becomes a *gather*: each destination pixel draws a candidate source from the
  same 3×3 / 5×5 offset patterns and applies the source's own acceptance test
  (its BG status, spread mode, T(x) rate, ghost heuristic). Marginal write
  probabilities per (source, direction) pair match the reference; differences:
  at most one neighbor-write lands per destination per frame (collisions are
  O(1e-2) rare), and border clamping is applied to the source rather than the
  destination.
- libc ``rand()`` draws become counter-based ``jax.random`` fields; behavior
  matches distributionally (bit-exactness is impossible and meaningless here).
- Validation is against a golden oracle built from the *actual reference C++*
  (tests/oracle/subsense_oracle.cpp compiles the reference sources in place):
  ≥99.9% pixel agreement over the dataset video on both gray and color paths.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tracking_tpu.bgs.base import BGSAlgorithm, State, StepResult
from tracking_tpu.core.config import BGSConfig
from tracking_tpu.core.registry import register
from tracking_tpu.ops import lbsp
from tracking_tpu.ops.filters import binary_median_blur
from tracking_tpu.ops.morphology import dilate, erode, fill_holes, morph_close
from tracking_tpu.ops.rng import field_bits, field_randint
from tracking_tpu.ops.pallas_consensus import (
    NB3_IN_NB5,
    NB5,
    nb3_to_nb5_idx,
    pack_pending_ctrl,
    pack_pending_vals,
    unpack_pending_ctrl,
)

# --- constants from BackgroundSubtractorSuBSENSE.cpp:16-46 -----------------
GHOSTDET_D_MAX = 0.010
GHOSTDET_S_MIN = 0.995
FEEDBACK_R_VAR = 0.01
FEEDBACK_V_INCR = 1.0
FEEDBACK_V_DECR = 0.1
FEEDBACK_T_DECR = 0.25
FEEDBACK_T_INCR = 0.5
FEEDBACK_T_LOWER = 2.0
FEEDBACK_T_UPPER = 256.0
UNSTABLE_REG_RATIO_MIN = 0.1
UNSTABLE_REG_RDIST_MIN = 3.0
LBSPDESC_RATIO_MIN = 0.1
LBSPDESC_RATIO_MAX = 0.5
DOWNSAMPLE_RATIO = 8
DEFAULT_FRAME_AREA = 320 * 240
DEFAULT_MEDIAN_KSIZE = 9  # BackgroundSubtractorLBSP.cpp:19

# 7×7 gaussian init-sampling pattern (RandUtils.h:13-25), flattened in the
# reference's traversal order (x outer, y inner) for inverse-CDF sampling.
_INIT_PATTERN = np.array(
    [
        [2, 4, 6, 7, 6, 4, 2],
        [4, 8, 12, 14, 12, 8, 4],
        [6, 12, 21, 25, 21, 12, 6],
        [7, 14, 25, 28, 25, 14, 7],
        [6, 12, 21, 25, 21, 12, 6],
        [4, 8, 12, 14, 12, 8, 4],
        [2, 4, 6, 7, 6, 4, 2],
    ],
    dtype=np.int32,
)
_INIT_TOT = 512
_INIT_FLAT = _INIT_PATTERN.T.reshape(-1)  # traversal: x outer, y inner
_INIT_CDF = np.cumsum(_INIT_FLAT)
_INIT_DX = np.repeat(np.arange(7) - 3, 7)
_INIT_DY = np.tile(np.arange(7) - 3, 7)

# 3×3 / 5×5 neighbor offset patterns (RandUtils.h:52-81), (x, y) pairs.
_NB3 = np.array(
    [(-1, 1), (0, 1), (1, 1), (-1, 0), (1, 0), (-1, -1), (0, -1), (1, -1)],
    dtype=np.int32,
)
_NB5 = np.array(
    [(x, y) for y in (2, 1, 0, -1, -2) for x in (-2, -1, 0, 1, 2) if not (x == 0 and y == 0)],
    dtype=np.int32,
)

_RMAX = 1 << 30


def _roi_mask(h: int, w: int) -> np.ndarray:
    """LBSP ROI: excludes the 2-px border (LBSP::validateROI)."""
    roi = np.zeros((h, w), bool)
    roi[lbsp.BORDER : h - lbsp.BORDER, lbsp.BORDER : w - lbsp.BORDER] = True
    return roi


def _sample_offset_field(key, shape):
    """Random 7×7-gaussian-weighted offset index per pixel
    (getRandSamplePosition, RandUtils.h:28-48): inverse-CDF draw, returned as
    flat pattern indices 0..48 (no gathers: the 49-entry searchsorted is a
    compare-sum)."""
    r = jax.random.randint(key, shape, 1, _INIT_TOT + 1)
    cdf = jnp.asarray(_INIT_CDF).reshape((49,) + (1,) * len(shape))
    return jnp.clip(jnp.sum(r[None] > cdf, axis=0), 0, 48)


def _refresh_samples(key, n_samples, n_refresh, start, last_color, last_desc, ok_mask, colors, descs, own=None, shift=None, ok_own=None, global_h=None):
    """refreshModel (SuBSENSE :249-291 / LOBSTER :128-170), vectorized.

    last_color/last_desc: C-tuples of [H, W]; colors/descs: C-tuples of
    [N, H, W]. Refreshes slots [start, start+n_refresh) mod N from random
    gaussian-weighted nearby positions whose ok_mask also holds.

    Implemented gather-free: a per-(slot, pixel) offset-index draw selects
    among the 49 statically shifted source maps. The earlier per-slot
    ``.at[slot].set`` + advanced-indexing chain materialized hundreds of full
    bank copies once vmap-over-streams turned the enclosing ``lax.cond`` into
    a select, killing the TPU worker.

    Spatial-sharding hooks (sources then arrive as halo-extended SLABS from
    SpatialCtx.extend_border, not full frames — no all_gather): ``shift(src,
    dy, dx)`` realizes the border-clamped global shift on a slab (owned-shape
    result); ``ok_own`` is the shard's own rows of ok_mask; ``own`` row-
    slices the global-shape offset draw (the draw itself stays global so
    every pixel sees the unsharded bits); ``global_h`` is the full-frame H.
    """
    if own is None:
        own = lambda x: x
    if shift is None:
        # NOTE: the reference's getRandSamplePosition ADDS the offset
        # (sample at p + d); _shift_clamped realizes img[p + d] via −d
        shift = lambda s, dy, dx: _shift_clamped(s, -dy, -dx)
    if ok_own is None:
        ok_own = ok_mask
    h = ok_mask.shape[0] if global_h is None else global_h
    w = ok_mask.shape[1]
    ho, wo = ok_own.shape
    N = n_samples
    idx = own(_sample_offset_field(key, (n_refresh, h, w)))  # [R,·,·] ∈ 0..48
    slots = jnp.arange(N)

    srcs = tuple(last_color) + tuple(last_desc)
    picked = [jnp.zeros((n_refresh, ho, wo), s.dtype) for s in srcs]
    ok_p = jnp.zeros((n_refresh, ho, wo), bool)
    for k in range(49):
        dy, dx = int(_INIT_DY[k]), int(_INIT_DX[k])
        sel = idx == k
        for i, s in enumerate(srcs):
            picked[i] = jnp.where(sel, shift(s, dy, dx)[None], picked[i])
        ok_p = jnp.where(sel, shift(ok_mask, dy, dx)[None], ok_p)
    ok_all = ok_p & ok_own[None]

    def apply(bank, src):
        # per-draw slot select (no gather): R is small (5 or N)
        out = bank
        for r in range(n_refresh):
            slot_mask = slots == ((start + r) % N)
            cond = slot_mask[:, None, None] & ok_all[r][None]
            out = jnp.where(cond, src[r][None], out)
        return out

    C = len(last_color)
    new_colors = tuple(apply(colors[c], picked[c]) for c in range(C))
    new_descs = tuple(apply(descs[c], picked[C + c]) for c in range(len(descs)))
    return new_colors, new_descs


def _intra_descriptor(planes, thr_fn):
    """C-tuple of [H, W] u8 → (C-tuple intra desc u16, C-tuple neighbors [16, H, W])."""
    descs, nbs = [], []
    for img in planes:
        nb = lbsp.neighbor_stack(img)
        thr = thr_fn(img)
        descs.append(lbsp.pack_bits(lbsp.descriptor_bits(nb, img, thr)))
        nbs.append(nb)
    return tuple(descs), tuple(nbs)


def _inter_dist_1ch(nb, bg_color, bg_desc, thr_fn):
    """Hamming distance between the inter-frame descriptor (current neighbors
    [16, H, W] vs a BG sample's color/threshold) and the stored descriptor.

    The LBSP threshold is computed in closed form (the reference's 256-entry
    LUT is affine in the pixel value — ``BackgroundSubtractorSuBSENSE.cpp:210,
    228``); a per-sample [H, W] table gather measured ~25 ms/frame at 720p on
    TPU vs <1 ms of VPU arithmetic. The comparison runs packed (xor+popcount)
    instead of over unpacked bit planes."""
    thr = thr_fn(bg_color)
    bits = jnp.abs(nb - bg_color.astype(jnp.int16)[None]) > thr.astype(jnp.int16)[None]
    return lbsp.hamming16(lbsp.pack_bits(bits), bg_desc)


def _shift_clamped(img: jnp.ndarray, dy: int, dx: int, border: int = lbsp.BORDER):
    """S(y, x) = img[clip(y−dy, border, H−border−1), clip(x−dx, …)] for any
    static |dy|,|dx| — an edge-mode pad (+slice when the shift exceeds the
    border) of the de-bordered crop. Pure data movement; no gather."""
    h, w = img.shape[-2], img.shape[-1]
    crop = img[..., border : h - border, border : w - border]
    pt, pb = border + dy, border - dy
    pl, pr = border + dx, border - dx
    pad = [(0, 0)] * (img.ndim - 2) + [
        (max(pt, 0), max(pb, 0)),
        (max(pl, 0), max(pr, 0)),
    ]
    x = jnp.pad(crop, pad, mode="edge")
    ys, xs = max(-pt, 0), max(-pl, 0)
    return x[..., ys : ys + h, xs : xs + w]


def _pick_neighbor(o_idx: jnp.ndarray, offsets: np.ndarray, arrays):
    """For each pixel p with drawn offset index o_idx[p], return each array's
    value at the clamped source position p − offsets[o_idx[p]].

    Select-over-static-shifts form of the random-neighbor gather: K pads + K
    selects per array (vector ops) instead of a scattered [H, W] gather
    (~25 ms/frame each at 720p on TPU)."""
    outs = None
    for k, (dx, dy) in enumerate(offsets):
        sel = o_idx == k
        shifted = [_shift_clamped(a, int(dy), int(dx)) for a in arrays]
        if outs is None:
            outs = shifted
        else:
            outs = [jnp.where(sel, s, o) for s, o in zip(shifted, outs)]
    return tuple(outs)


def _use_v2() -> bool:
    """Consensus v2: frame-global slot draws + eager XLA-side bank updates
    (dynamic-slice writes of the ≤3 touched slots) + an incrementally carried
    background color sum. Per-pixel write *marginals* are identical to v1 —
    the slot index is only a storage position, drawn uniformly either way —
    but v2 never needs the full-bank write-back, which lets the TPU walk
    kernel fetch bank slot-groups on demand (now attic/pallas_consensus2.py).

    TPU A/B verdicts (PERF.md "Consensus v2/v3 A/B"): v2's manual grouped
    DMA regresses (156.7 vs 209.4 fps BGS-only) — Mosaic's automatic block
    pipelining beats hand-rolled double-buffering when every byte is
    eventually needed. ``v3`` keeps this eager-update model but walks with
    the v1 kernel in read-only mode (full-bank auto-pipelined blocks, no
    write-back — ops/pallas_consensus.consensus_read_pallas). One session
    measured v3 ahead (197.4 vs 184.5 BGS-only), but the verifying session
    could not reproduce it: interleaved repeated runs gave v1 203.6 /
    v3 159.6 BGS-only (180.8 / 135.5 full pipeline) — v1 ahead 28%, stable
    across 4 alternating runs, with v1 matching its earlier-session numbers.

    v1 (fused deferred-write kernel) is therefore the DEFAULT.
    TRACKING_TPU_CONSENSUS=v3 selects the read-only-walk variant. The v2
    grouped-DMA kernel was ATTICIZED round 5 (attic/pallas_consensus2.py)
    per its recorded negative verdict; =v2 now raises with a pointer.
    CPU/TPU masks stay bit-identical within each mode (the read kernel is
    exact vs the XLA scan, tests/test_consensus_v3.py)."""
    mode = os.environ.get("TRACKING_TPU_CONSENSUS", "v1")
    if mode == "v2":
        raise RuntimeError(
            "TRACKING_TPU_CONSENSUS=v2 (grouped-DMA walk) was retired to "
            "attic/pallas_consensus2.py — a measured regression (PERF.md "
            "'Consensus v2 A/B'); use v3 for the eager-update research "
            "path, or see attic/README.md to reproduce the v2 A/B"
        )
    return mode != "v1"


def _resolve_spread_xla(vals, u3, u5, col_dtype, desc_dtype, shift_src):
    """Resolve the gather-form neighbor-spread picks from packed value maps
    (``pack_pending_vals``): for each destination pixel, did its drawn 3×3 /
    5×5 source fire, and what (color, desc) does the winning source carry.
    Returns (ok3, ok5, nb_col C-list, nb_desc C-list); 3×3 wins both the
    value pick and (in the callers) the slot write."""
    C = len(vals)
    ok3 = jnp.zeros(vals[0].shape, bool)
    ok5 = jnp.zeros(vals[0].shape, bool)
    for k, (dx, dy) in enumerate(NB5):
        fv = shift_src(0, int(dy), int(dx)) >> 24
        if k in NB3_IN_NB5:
            ok3 = ok3 | ((u3 == k) & ((fv & 1) != 0))
        ok5 = ok5 | ((u5 == k) & ((fv & 2) != 0))
    u = jnp.where(ok3, u3, u5)
    nbv = [jnp.zeros(vals[0].shape, jnp.int32) for _ in range(C)]
    for k, (dx, dy) in enumerate(NB5):
        sel = u == k
        for c in range(C):
            nbv[c] = jnp.where(sel, shift_src(c, int(dy), int(dx)), nbv[c])
    nb_col = [(v & 0xFF).astype(col_dtype) for v in nbv]
    nb_desc = [((v >> 8) & 0xFFFF).astype(desc_dtype) for v in nbv]
    return ok3, ok5, nb_col, nb_desc


def _apply_updates_global(
    upd1, u3, u5, s1, s3, s5, vals, colors, descs, bg_sum, shift_src=None
):
    """Consensus-v2 bank update: the same per-pixel write decisions as
    ``_apply_pending_xla`` but with frame-global slot indices (scalars
    s1/s3/s5), applied eagerly as dynamic-slice read-modify-writes of the
    ≤3 touched slots — O(slots touched) HBM traffic instead of O(N).

    Write precedence matches v1/the sequential reference: a spread write
    wins over the self write on a slot collision (applied later), and the
    3×3 pick wins over the 5×5. ``bg_sum`` (C-tuple [H, W] i32, the bank
    color sum that backs getBackgroundImage) is updated incrementally:
    += new − old at each written slot. Returns (colors, descs, bg_sum)."""
    C = len(colors)
    if shift_src is None:
        shift_src = lambda ci, dy, dx: _shift_clamped(vals[ci], dy, dx)
    ok3, ok5, nb_col, nb_desc = _resolve_spread_xla(
        vals, u3, u5, colors[0].dtype, descs[0].dtype, shift_src
    )
    own_col = [(vals[c] & 0xFF).astype(colors[0].dtype) for c in range(C)]
    own_desc = [((vals[c] >> 8) & 0xFFFF).astype(descs[0].dtype) for c in range(C)]

    colors, descs, bg_sum = list(colors), list(descs), list(bg_sum)
    # later writes win: self, then 5×5-only spread, then 3×3 spread
    writes = (
        (s1, upd1.astype(bool), own_col, own_desc),
        (s5, ok5 & ~ok3, nb_col, nb_desc),
        (s3, ok3, nb_col, nb_desc),
    )
    for slot, mask, vcol, vdesc in writes:
        for c in range(C):
            old_c = jax.lax.dynamic_index_in_dim(colors[c], slot, 0, keepdims=False)
            new_c = jnp.where(mask, vcol[c], old_c)
            colors[c] = jax.lax.dynamic_update_index_in_dim(colors[c], new_c, slot, 0)
            old_d = jax.lax.dynamic_index_in_dim(descs[c], slot, 0, keepdims=False)
            descs[c] = jax.lax.dynamic_update_index_in_dim(
                descs[c], jnp.where(mask, vdesc[c], old_d), slot, 0
            )
            bg_sum[c] = bg_sum[c] + (
                new_c.astype(jnp.int32) - old_c.astype(jnp.int32)
            )
    return tuple(colors), tuple(descs), tuple(bg_sum)


def _apply_pending_xla(ctrl, vals, colors, descs, shift_src=None):
    """Apply a deferred stochastic-update log to the sample banks — the XLA
    twin of the Pallas kernels' in-VMEM apply stage
    (``ops.pallas_consensus._apply_pending_stage``); both backends make
    bit-identical writes from the same packed log.

    ctrl [H, W] i32 (``pack_pending_ctrl``), vals C-tuple [H, W] i32
    (``pack_pending_vals``: frame t's color|desc, fire bits on channel 0),
    colors/descs C-tuples of [N, H, W] u8/u16 banks. Returns the updated
    banks plus the per-channel post-apply color sums (bg image × N).

    ``shift_src(ci, dy, dx)``: spatial-sharding hook returning the shifted
    vals channel (halo-extended slabs under ``shard_map``); defaults to the
    unsharded ``_shift_clamped`` on ``vals`` itself."""
    C = len(colors)
    N = colors[0].shape[0]
    if shift_src is None:
        shift_src = lambda ci, dy, dx: _shift_clamped(vals[ci], dy, dx)
    upd1, slot1, u3, u5, slot3, slot5 = unpack_pending_ctrl(ctrl)

    ok3, ok5, nb_col, nb_desc = _resolve_spread_xla(
        vals, u3, u5, colors[0].dtype, descs[0].dtype, shift_src
    )
    okn = ok3 | ok5
    slotn = jnp.where(ok3, slot3, slot5)

    own_col = [(vals[c] & 0xFF).astype(colors[0].dtype) for c in range(C)]
    own_desc = [((vals[c] >> 8) & 0xFFFF).astype(descs[0].dtype) for c in range(C)]

    slot_axis = jnp.arange(N)[:, None, None]
    m1 = upd1[None] & (slot1[None] == slot_axis)
    mn = okn[None] & (slotn[None] == slot_axis)
    new_colors = tuple(
        jnp.where(mn, nb_col[c][None], jnp.where(m1, own_col[c][None], colors[c]))
        for c in range(C)
    )
    new_descs = tuple(
        jnp.where(mn, nb_desc[c][None], jnp.where(m1, own_desc[c][None], descs[c]))
        for c in range(C)
    )
    bg_sum = tuple(jnp.sum(nc.astype(jnp.int32), axis=0) for nc in new_colors)
    return new_colors, new_descs, bg_sum


def _to_planes(frame: jnp.ndarray) -> Tuple[Tuple[jnp.ndarray, ...], bool]:
    """[H, W] or [H, W, C] u8 → C-tuple of [H, W], was_gray flag."""
    if frame.ndim == 2:
        return (frame,), True
    return tuple(frame[..., c] for c in range(frame.shape[-1])), False


def _from_planes(planes, was_gray: bool) -> jnp.ndarray:
    if was_gray:
        return planes[0]
    return jnp.stack(planes, axis=-1)


# ---------------------------------------------------------------------------
# LOBSTER — ustc type 37
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class LOBSTERConfig(BGSConfig):
    fRelLBSPThreshold: float = 0.365
    nLBSPThresholdOffset: int = 0
    nDescDistThreshold: int = 4
    nColorDistThreshold: int = 30
    nBGSamples: int = 35
    nRequiredBGSamples: int = 2
    learningRate: float = 16.0
    showOutput: bool = True


@register("LOBSTERBGS", type_id=37, aliases=("lobster",))
class LOBSTER(BGSAlgorithm):
    """LOcal Binary Similarity segmenTER: ViBe-style consensus over N=35
    color+LBSP samples with fixed thresholds and stochastic 1/16 updates."""

    Config = LOBSTERConfig

    def _thr_fn(self, c: int):
        """Closed-form LBSP threshold (the reference's affine 8-bit LUT,
        ``BackgroundSubtractorLOBSTER.cpp:86-97``; /2 for grayscale)."""
        cfg = self.config
        div = 2.0 if c == 1 else 1.0

        def thr(v_u8):
            raw = (
                v_u8.astype(jnp.float32) * cfg.fRelLBSPThreshold
                + cfg.nLBSPThresholdOffset
            ) / div
            return jnp.clip(jnp.rint(raw), 0, 255).astype(jnp.int32)

        return thr

    def init(self, h: int, w: int, c: int = 3) -> State:
        cfg = self.config
        c = max(c, 1)
        N = cfg.nBGSamples
        return {
            "t": jnp.zeros((), jnp.int32),
            "key": jax.random.PRNGKey(0),
            "colors": tuple(jnp.zeros((N, h, w), jnp.uint8) for _ in range(c)),
            "descs": tuple(jnp.zeros((N, h, w), jnp.uint16) for _ in range(c)),
            "last_final": jnp.zeros((h, w), jnp.uint8),
            # deferred stochastic-update log (applied at the next step's
            # consensus; zero ctrl = no writes, so t=0 is a no-op)
            "pend_ctrl": jnp.zeros((h, w), jnp.int32),
            "pend_vals": tuple(jnp.zeros((h, w), jnp.int32) for _ in range(c)),
        }

    def warm_start(self, state: State, frame: jnp.ndarray) -> State:
        """initialize + refreshModel(1.0) (wrapper LOBSTER.cpp:28-36)."""
        cfg = self.config
        planes, _ = _to_planes(frame)
        h, w = planes[0].shape
        intra_desc, _ = _intra_descriptor(planes, self._thr_fn(len(planes)))
        key, sub = jax.random.split(state["key"])
        colors, descs = _refresh_samples(
            sub, cfg.nBGSamples, cfg.nBGSamples, 0, planes, intra_desc,
            jnp.ones((h, w), bool), state["colors"], state["descs"],
        )
        return dict(state, key=key, colors=colors, descs=descs)

    def step(self, state: State, frame: jnp.ndarray, ctx=None) -> StepResult:
        """One frame; ``ctx`` switches to row-sharded SPMD mode (see
        SuBSENSE.step and parallel/spatial.py — same contract)."""
        cfg = self.config
        N = cfg.nBGSamples
        required = cfg.nRequiredBGSamples
        planes_in, was_gray = _to_planes(frame)
        if ctx is not None:
            planes_ext = planes_in  # runner pre-extended the frame rows
            planes = tuple(ctx.crop(p) for p in planes_ext)
        else:
            planes_ext = None
            planes = planes_in
        c = len(planes)
        h, w = planes[0].shape
        H = ctx.H if ctx is not None else h
        roi = jnp.asarray(_roi_mask(h, w)) if ctx is None else ctx.roi(w)
        thr_fn = self._thr_fn(c)
        t = state["t"]
        keys = jax.random.split(state["key"], 8)
        new_key = keys[0]

        colors, descs = state["colors"], state["descs"]

        # -- sample consensus (BackgroundSubtractorLOBSTER.cpp:191-262) ------
        if c == 1:
            color_thr_sc = cfg.nColorDistThreshold // 2
            desc_thr_sc = cfg.nDescDistThreshold
        else:
            color_thr_sc = (cfg.nColorDistThreshold * 3) // 2
            desc_thr_sc = (cfg.nDescDistThreshold * 3) // 2
        tot_color_thr = cfg.nColorDistThreshold * 3
        tot_desc_thr = cfg.nDescDistThreshold * 3

        def consensus_body(count, sd):
            s_colors, s_descs = sd  # C-tuples of [H, W]
            cd, dd = [], []
            for ci in range(c):
                cdist = jnp.abs(
                    planes[ci].astype(jnp.int16) - s_colors[ci].astype(jnp.int16)
                ).astype(jnp.int32)
                ddist = _inter_dist_1ch(nb_stack[ci], s_colors[ci], s_descs[ci], thr_fn)
                cd.append(cdist)
                dd.append(ddist)
            if c == 1:
                good = (cd[0] <= color_thr_sc) & (dd[0] <= desc_thr_sc)
            else:
                sc_ok = jnp.ones((h, w), bool)
                for ci in range(c):
                    sc_ok &= (cd[ci] <= color_thr_sc) & (dd[ci] <= desc_thr_sc)
                good = (
                    sc_ok
                    & (sum(cd) <= tot_color_thr)
                    & (sum(dd) <= tot_desc_thr)
                )
            return count + jnp.where(good & (count < required), 1, 0), None

        # Frame t−1's stochastic writes arrive as a pending log and are
        # applied before the walk (in-VMEM on the Pallas path — bank bytes
        # cross HBM once per frame for consensus + updates combined; see
        # ops/pallas_consensus module docstring). Masks are identical to the
        # eager order; the bg image (bank mean, free from the apply loop)
        # lags the reference's by one frame of ≤2-slot writes.
        use_pallas = ctx is None and jax.default_backend() == "tpu"
        spatial_env = os.environ.get("TRACKING_TPU_SPATIAL", "pallas")
        use_spatial_pallas = ctx is not None and (
            (jax.default_backend() == "tpu" and spatial_env != "xla")
            or spatial_env == "interp"
        )
        if use_spatial_pallas:
            from tracking_tpu.ops.pallas_consensus import BH as _KBH

            _E = _KBH + ((-h) % _KBH)
            if _E > ctx.n * h:
                use_spatial_pallas = False
        if use_pallas or use_spatial_pallas:
            from tracking_tpu.ops.pallas_consensus import consensus_lobster_pallas

            if use_spatial_pallas:
                k_planes = tuple(ctx.extend_plain(p, halo=_E) for p in planes)
                k_vals = tuple(
                    ctx.extend_border(v, halo=_E) for v in state["pend_vals"]
                )
                k_ext = int(_E)
            else:
                k_planes, k_vals, k_ext = planes, state["pend_vals"], 0
            count, k_intra, bg_sums, colors, descs = consensus_lobster_pallas(
                k_planes, colors, descs,
                state["pend_ctrl"], k_vals,
                rel=cfg.fRelLBSPThreshold,
                offset=float(cfg.nLBSPThresholdOffset),
                div=2.0 if c == 1 else 1.0,
                c_sc=int(color_thr_sc), d_sc=int(desc_thr_sc),
                c_tot=int(tot_color_thr), d_tot=int(tot_desc_thr),
                req=int(required),
                interpret=use_spatial_pallas and spatial_env == "interp",
                row_ext=k_ext,
            )
            intra_desc = tuple(d.astype(jnp.uint16) for d in k_intra)
        else:
            if ctx is None:
                colors, descs, bg_sums = _apply_pending_xla(
                    state["pend_ctrl"], state["pend_vals"], colors, descs
                )
                intra_desc, nb_stack = _intra_descriptor(planes, thr_fn)
            else:
                vals_ext = tuple(
                    ctx.extend_border(v) for v in state["pend_vals"]
                )
                colors, descs, bg_sums = _apply_pending_xla(
                    state["pend_ctrl"], state["pend_vals"], colors, descs,
                    shift_src=lambda ci, dy, dx: ctx.shift_ext(vals_ext[ci], dy, dx),
                )
                intra_ext, nb_ext = _intra_descriptor(planes_ext, thr_fn)
                intra_desc = tuple(ctx.crop(d) for d in intra_ext)
                nb_stack = tuple(ctx.crop(nbv) for nbv in nb_ext)
            count, _ = jax.lax.scan(
                consensus_body, jnp.zeros((h, w), jnp.int32), (colors, descs)
            )
        is_bg = (count >= required) & roi
        raw_fg = jnp.where(roi & ~is_bg, jnp.uint8(255), jnp.uint8(0))

        # -- stochastic updates (:209-222), logged for the next step ---------
        # Spatial mode: draws at global shape + row slice, so every pixel
        # sees the unsharded run's draw (replicated key).
        def _draw(key, *a, **k):
            x = field_randint(key, (H, w), *a, **k)
            return x if ctx is None else ctx.rng_rows(x)

        lr = int(np.ceil(cfg.learningRate))
        r_self = _draw(keys[2], 0, _RMAX)
        slot_self = _draw(keys[3], 0, N)
        self_upd = is_bg & (r_self % lr == 0)

        # neighbor spread, gather form: dest p draws offset o; source q = p−o
        # passes its own 1/lr draw and BG test; p receives q's color/desc.
        # 3×3-only spread: fire bit1 (5×5) stays clear, u5/slot5 inert.
        r_nb_dec = _draw(keys[4], 0, _RMAX)
        o_idx = _draw(keys[5], 0, len(_NB3))
        src_fire = is_bg & (r_nb_dec % lr == 0)
        slot_nb = _draw(keys[6], 0, N)
        zero = jnp.zeros((h, w), jnp.int32)
        pend_ctrl = pack_pending_ctrl(
            self_upd, slot_self, nb3_to_nb5_idx(o_idx), zero, slot_nb, zero
        )
        pend_vals = pack_pending_vals(planes, intra_desc, src_fire)

        # -- post-proc: median blur 9 (:287) ---------------------------------
        if ctx is None:
            final = binary_median_blur(raw_fg, DEFAULT_MEDIAN_KSIZE)
        else:
            # bounded stencil: ride a halo slab (edge-replicate border =
            # the extension's clamped contents) instead of an all_gather
            mr = DEFAULT_MEDIAN_KSIZE // 2
            ext = ctx.extend_plain(raw_fg, halo=mr)
            final = binary_median_blur(ext, DEFAULT_MEDIAN_KSIZE)[mr : mr + h]

        bg_planes = tuple(
            jnp.rint(bg_sums[ci].astype(jnp.float32) / N).astype(jnp.uint8)
            for ci in range(c)
        )
        new_state = {
            "t": t + 1,
            "key": new_key,
            "colors": colors,
            "descs": descs,
            "last_final": final,
            "pend_ctrl": pend_ctrl,
            "pend_vals": pend_vals,
        }
        return new_state, final, _from_planes(bg_planes, was_gray)


# ---------------------------------------------------------------------------
# SuBSENSE — ustc type 36 (the flagship)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SuBSENSEConfig(BGSConfig):
    fRelLBSPThreshold: float = 0.333
    nDescDistThresholdOffset: int = 3
    nMinColorDistThreshold: int = 30
    nBGSamples: int = 50
    nRequiredBGSamples: int = 2
    nSamplesForMovingAvgs: int = 100
    showOutput: bool = True


@register("SuBSENSEBGS", type_id=36, aliases=("subsense",))
class SuBSENSE(BGSAlgorithm):
    """Self-Balanced SENsitivity SEgmenter (St-Charles et al., CVPRW 2014).

    50-sample color+LBSP consensus with per-pixel feedback: distance threshold
    R(x), update rate T(x), variation modulator v(x), rolling D_min/D_last
    averages, blink detection, unstable-region masking, global LBSP-LUT
    rescaling, and (for ≥QVGA frames) downsampled camera-motion analysis with
    automatic partial model resets.
    """

    Config = SuBSENSEConfig

    def _thr_fn(self, c: int, delta):
        """Closed-form LBSP threshold with the dynamic-rescale walk.

        The reference keeps a 256-entry LUT seeded affine
        (``saturate_cast((offset + t·fRel)/3)`` gray / undivided color,
        ``BackgroundSubtractorSuBSENSE.cpp:210,228``) and walks every entry
        ±1 per rescale event, each entry saturating at
        ``lo(t) = ceil(t·fRel/4)`` / ``hi = rint(255·fRel)``
        (``:643-654``). We carry the walk as one scalar ``delta`` and clamp
        per entry to [min(base, lo), max(base, hi)] — identical until an
        entry saturates while the walk keeps moving *and later reverses*
        (the entry would unstick one event earlier in the reference); the
        rescale regime itself needs nonzero-desc ratios outside [0.1, 0.5]
        for 2+ consecutive frames. In exchange the per-sample [H, W] table
        gather (measured ~25 ms/frame each at 720p) becomes VPU arithmetic.
        """
        cfg = self.config
        div = 3.0 if c == 1 else 1.0
        rel = cfg.fRelLBSPThreshold

        def thr(v_u8):
            v = v_u8.astype(jnp.float32)
            base = jnp.clip(jnp.rint(v * rel / div), 0, 255)
            lo = jnp.ceil(v * rel / 4.0)
            hi = jnp.float32(np.rint(255 * rel))
            return jnp.clip(
                base + delta.astype(jnp.float32),
                jnp.minimum(base, lo),
                jnp.maximum(base, hi),
            ).astype(jnp.int32)

        return thr

    @staticmethod
    def _size_policy(h: int, w: int):
        """initialize() size-dependent switches (:124-140)."""
        npix = h * w
        scaling = npix >= DEFAULT_FRAME_AREA
        if scaling:
            use3x3 = not (npix > DEFAULT_FRAME_AREA * 2)
            raw_k = min(int(np.floor(npix / DEFAULT_FRAME_AREA + 0.5)) + DEFAULT_MEDIAN_KSIZE, 14)
            ksize = raw_k if raw_k % 2 else raw_k - 1
            t_lower, t_upper = FEEDBACK_T_LOWER, FEEDBACK_T_UPPER
        else:
            use3x3 = True
            ksize = DEFAULT_MEDIAN_KSIZE
            t_lower, t_upper = FEEDBACK_T_LOWER * 2, FEEDBACK_T_UPPER * 2
        return scaling, use3x3, ksize, t_lower, t_upper

    def init(self, h: int, w: int, c: int = 3) -> State:
        cfg = self.config
        c = max(c, 1)
        N = cfg.nBGSamples
        _, _, _, t_lower, t_upper = self._size_policy(h, w)
        dsh, dsw = h // DOWNSAMPLE_RATIO, w // DOWNSAMPLE_RATIO
        f32 = lambda fill: jnp.full((h, w), fill, jnp.float32)
        st = {
            "t": jnp.zeros((), jnp.int32),
            "key": jax.random.PRNGKey(0),
            "colors": tuple(jnp.zeros((N, h, w), jnp.uint8) for _ in range(c)),
            "descs": tuple(jnp.zeros((N, h, w), jnp.uint16) for _ in range(c)),
            "R": f32(1.0),
            "T": f32(t_lower),
            "v": f32(10.0),
            "mean_last": f32(0.0),
            "dmin_lt": f32(0.0),
            "dmin_st": f32(0.0),
            "raw_lt": f32(0.0),
            "raw_st": f32(0.0),
            "final_lt": f32(0.0),
            "final_st": f32(0.0),
            "unstable": jnp.zeros((h, w), bool),
            "blinks": jnp.zeros((h, w), bool),
            "last_color": tuple(jnp.zeros((h, w), jnp.uint8) for _ in range(c)),
            "last_desc": tuple(jnp.zeros((h, w), jnp.uint16) for _ in range(c)),
            "last_raw": jnp.zeros((h, w), jnp.uint8),
            "last_final": jnp.zeros((h, w), jnp.uint8),
            "last_blink_mask": jnp.zeros((h, w), bool),
            "last_dil_inv": jnp.zeros((h, w), bool),
            "lut_delta": jnp.zeros((), jnp.int32),
            "ds_lt": tuple(jnp.zeros((dsh, dsw), jnp.float32) for _ in range(c)),
            "ds_st": tuple(jnp.zeros((dsh, dsw), jnp.float32) for _ in range(c)),
            "last_nonzero_ratio": jnp.zeros((), jnp.float32),
            "frames_since_reset": jnp.zeros((), jnp.int32),
            "cooldown": jnp.zeros((), jnp.int32),
            "auto_reset": jnp.array(True),
            "lr_lower": jnp.asarray(t_lower, jnp.float32),
            "lr_upper": jnp.asarray(t_upper, jnp.float32),
        }
        if _use_v2():
            # v2 carries the bank color sum (getBackgroundImage) instead of
            # a deferred write log — updates apply eagerly in-step
            st["bg_sum"] = tuple(jnp.zeros((h, w), jnp.int32) for _ in range(c))
        else:
            # deferred stochastic-update log (applied at the next step's
            # consensus; zero ctrl = no writes, so t=0 is a no-op)
            st["pend_ctrl"] = jnp.zeros((h, w), jnp.int32)
            st["pend_vals"] = tuple(
                jnp.zeros((h, w), jnp.int32) for _ in range(c)
            )
        return st

    def warm_start(self, state: State, frame: jnp.ndarray) -> State:
        """initialize() + refreshModel(1.0) (:206-247)."""
        cfg = self.config
        planes, _ = _to_planes(frame)
        h, w = planes[0].shape
        thr_fn = self._thr_fn(len(planes), state["lut_delta"])
        intra_desc, _ = _intra_descriptor(planes, thr_fn)
        key, sub = jax.random.split(state["key"])
        colors, descs = _refresh_samples(
            sub, cfg.nBGSamples, cfg.nBGSamples, 0, planes, intra_desc,
            jnp.ones((h, w), bool), state["colors"], state["descs"],
        )
        out = dict(state, key=key, colors=colors, descs=descs)
        if "bg_sum" in state:
            out["bg_sum"] = tuple(
                jnp.sum(c.astype(jnp.int32), axis=0) for c in colors
            )
        return out

    def step(self, state: State, frame: jnp.ndarray, ctx=None) -> StepResult:
        """One frame. ``ctx`` (parallel.spatial.SpatialCtx) switches the step
        into row-sharded SPMD mode inside ``shard_map``: ``frame`` arrives
        halo-extended, stencil reads go through halo-extended slabs, the
        flood-fill/post-proc chain and frame-level statistics run on
        all-gathered full masks, and RNG fields are drawn at global shape and
        row-sliced — the produced masks are bit-identical to the unsharded
        run (tests/test_mesh.py)."""
        cfg = self.config
        N = cfg.nBGSamples
        # per-pixel required-sample map hook: subsenseShrink raises the
        # requirement by 5 where its shrink-box mask fires
        # (ustc_src/.../subsenseshrink.cpp:242-248)
        required = cfg.nRequiredBGSamples + state.get(
            "shrink_req_offset", jnp.zeros((), jnp.int32)
        )
        planes_in, was_gray = _to_planes(frame)
        if ctx is not None:
            planes_ext = planes_in  # runner pre-extended the frame rows
            planes = tuple(ctx.crop(p) for p in planes_ext)
        else:
            planes_ext = None
            planes = planes_in
        c = len(planes)
        h, w = planes[0].shape
        H = ctx.H if ctx is not None else h  # global height
        scaling, use3x3_global, median_ksize, t_lower_static, t_upper_static = (
            self._size_policy(H, w)
        )
        if ctx is None:
            roi = jnp.asarray(_roi_mask(h, w))
        else:
            roi = ctx.roi(w)
        n_roi_px = (H - 2 * lbsp.BORDER) * (w - 2 * lbsp.BORDER)
        max_color = 255 * c
        max_desc = 16 * c
        t = state["t"]
        thr_fn = self._thr_fn(c, state["lut_delta"])
        keys = jax.random.split(state["key"], 12)
        new_key = keys[0]

        # rolling factors (:303-304); m_nFrameIndex pre-incremented
        fidx = (t + 1).astype(jnp.float32)
        a_lt = 1.0 / jnp.minimum(fidx, float(cfg.nSamplesForMovingAvgs))
        a_st = 1.0 / jnp.minimum(fidx, float(cfg.nSamplesForMovingAvgs // 4))

        colors, descs = state["colors"], state["descs"]

        # -- thresholds (old unstable mask; :327-328) ------------------------
        # On the Pallas path the kernel derives these per-tile from R and
        # the old unstable mask (two fewer full-map materializations).
        # Spatial sharding uses the XLA formulation (see parallel/spatial.py).
        v2 = "bg_sum" in state  # consensus v2 (see _use_v2)
        on_tpu = ctx is None and jax.default_backend() == "tpu"
        # whole-step fused kernel (consensus + feedback + pending pack in
        # one pallas_call) — measured-regression research artifact, opt-in
        # via TRACKING_TPU_FUSED=1: interleaved same-session A/B gave split
        # 6.60/6.51 vs fused 6.69/6.64 ms BGS-step (motion window). XLA
        # already fuses the elementwise feedback for free; the kernel
        # epilogue re-pays tile-granular DMA for every f32 state map and
        # runs on early-exited tiles too (PERF.md round 3).
        # TRACKING_TPU_FUSED_INTERP=1 forces the interpret-mode kernel on
        # CPU for the bit-exactness parity test.
        fused_interp = bool(os.environ.get("TRACKING_TPU_FUSED_INTERP"))
        use_fused = (
            (on_tpu or (ctx is None and fused_interp))
            and not v2
            and (fused_interp or os.environ.get("TRACKING_TPU_FUSED") == "1")
        )
        use_pallas = on_tpu and not v2 and not use_fused
        use_pallas_v2 = on_tpu and v2  # read-only walk kernel (v3)
        # spatial sharding: the SAME fused v1 kernel runs per shard on
        # halo-extended plane/pending slabs with owned-size banks
        # (consensus_pallas row_ext contract) — the sharded path is the
        # Pallas fast path, not the XLA scan. TRACKING_TPU_SPATIAL=xla
        # restores the XLA formulation; =interp forces the interpret-mode
        # kernel on the CPU mesh (equality tests).
        spatial_env = os.environ.get("TRACKING_TPU_SPATIAL", "pallas")
        use_spatial_pallas = (
            ctx is not None
            and not v2
            and (
                (jax.default_backend() == "tpu" and spatial_env != "xla")
                or spatial_env == "interp"
            )
        )
        if use_spatial_pallas:
            from tracking_tpu.ops.pallas_consensus import BH as _KBH

            _E = _KBH + ((-h) % _KBH)  # row slice needs E ≥ BH + align pad
            if _E > ctx.n * h:  # halo can't exceed the global height
                use_spatial_pallas = False
        any_kernel = use_pallas or use_pallas_v2 or use_fused or use_spatial_pallas
        R = state["R"]
        old_unstable = state["unstable"]
        if not any_kernel:
            stab_off = cfg.nMinColorDistThreshold // 5
            color_thr_f = R * cfg.nMinColorDistThreshold - jnp.where(
                old_unstable, 0, stab_off
            )
            if c == 1:
                color_thr = color_thr_f.astype(jnp.int32) // 2
            else:
                color_thr = color_thr_f.astype(jnp.int32)
            desc_thr = (
                (1 << jnp.floor(R + 0.5).astype(jnp.int32))
                + cfg.nDescDistThresholdOffset
                + jnp.where(old_unstable, cfg.nDescDistThresholdOffset, 0)
            )

        # -- sample consensus scan (:332-357 / :468-497) ---------------------
        if c == 3 and not any_kernel:
            tot_color_thr = color_thr * 3
            tot_desc_thr = desc_thr * 3
            sc_color_thr = tot_color_thr // 2

        def consensus_body(carry, sd):
            count, min_desc, min_sum = carry
            s_colors, s_descs = sd  # C-tuples of [H, W]
            cd, dd = [], []
            for ci in range(c):
                cdist = jnp.abs(
                    planes[ci].astype(jnp.int16) - s_colors[ci].astype(jnp.int16)
                ).astype(jnp.int32)
                intra_d = lbsp.popcount16(jnp.bitwise_xor(intra_desc[ci], s_descs[ci]))
                inter_d = _inter_dist_1ch(nb_stack[ci], s_colors[ci], s_descs[ci], thr_fn)
                cd.append(cdist)
                dd.append((intra_d + inter_d) // 2)
            if c == 1:
                sum_d = jnp.minimum((dd[0] // 4) * (255 // 16) + cd[0], 255)
                good = (cd[0] <= color_thr) & (dd[0] <= desc_thr) & (sum_d <= color_thr)
                tot_desc, tot_sum = dd[0], sum_d
            else:
                sum_c = [
                    jnp.minimum((dd[ci] // 2) * (255 // 16) + cd[ci], 255)
                    for ci in range(c)
                ]
                sc_ok = jnp.ones((h, w), bool)
                for ci in range(c):
                    sc_ok &= (cd[ci] <= sc_color_thr) & (sum_c[ci] <= sc_color_thr)
                tot_desc = sum(dd)
                tot_sum = sum(sum_c)
                good = sc_ok & (tot_desc <= tot_desc_thr) & (tot_sum <= tot_color_thr)
            live = good & (count < required_eff)
            min_desc = jnp.where(live, jnp.minimum(min_desc, tot_desc), min_desc)
            min_sum = jnp.where(live, jnp.minimum(min_sum, tot_sum), min_sum)
            return (count + live.astype(jnp.int32), min_desc, min_sum), None

        # ROI gating: non-ROI (2-px border) pixels never produce output —
        # is_fg masks them and spread/self-updates require is_bg & roi — but
        # they WOULD keep accumulating consensus counts, and in the kernel a
        # tile can only early-exit once every lane is satisfied. Zeroing
        # their required count kills those lanes on sample 0 (43% of 720p
        # tiles touch the border). Applied on both backends so carried
        # border state stays bit-identical.
        required_eff = jnp.where(roi, jnp.asarray(required, jnp.int32), 0)

        # Pallas fast path: fused VMEM-resident consensus with frame t−1's
        # pending stochastic writes applied in-kernel first (bank bytes cross
        # HBM exactly once per frame for consensus + updates + bg image
        # combined; neighbor views + intra descriptors built in-kernel from
        # the raw planes); real TPU only. Masks are identical to the eager
        # write order; the bg image (bank mean, free from the apply loop)
        # lags the reference's by one frame of ≤2-slot writes.
        if use_fused:
            pass  # consensus + feedback + pending pack run as ONE fused
            # kernel below (consensus_feedback_pallas) — see the feedback
            # section; nothing to do here.
        elif use_pallas:
            from tracking_tpu.ops.pallas_consensus import consensus_pallas

            count, min_desc, min_sum, k_intra, bg_sums, colors, descs = (
                consensus_pallas(
                    planes, colors, descs,
                    state["pend_ctrl"], state["pend_vals"],
                    state["lut_delta"], R, old_unstable,
                    required=required_eff,
                    rel=cfg.fRelLBSPThreshold,
                    div=3.0 if c == 1 else 1.0,
                    hi_const=float(np.rint(255 * cfg.fRelLBSPThreshold)),
                    min_cd=int(cfg.nMinColorDistThreshold),
                    desc_off=int(cfg.nDescDistThresholdOffset),
                )
            )
            intra_desc = tuple(d.astype(jnp.uint16) for d in k_intra)
        elif use_spatial_pallas:
            # per-shard fused kernel: planes/pending values ride E-row
            # halo-extended slabs (contents carry the global clamp
            # semantics), banks/maps stay owned-size; outputs are exactly
            # the unsharded kernel's owned rows (tests/test_mesh.py
            # equality on the CPU mesh, interpret mode)
            from tracking_tpu.ops.pallas_consensus import consensus_pallas

            planes_kext = tuple(ctx.extend_plain(p, halo=_E) for p in planes)
            vals_kext = tuple(
                ctx.extend_border(v, halo=_E) for v in state["pend_vals"]
            )
            count, min_desc, min_sum, k_intra, bg_sums, colors, descs = (
                consensus_pallas(
                    planes_kext, colors, descs,
                    state["pend_ctrl"], vals_kext,
                    state["lut_delta"], R, old_unstable,
                    required=required_eff,
                    rel=cfg.fRelLBSPThreshold,
                    div=3.0 if c == 1 else 1.0,
                    hi_const=float(np.rint(255 * cfg.fRelLBSPThreshold)),
                    min_cd=int(cfg.nMinColorDistThreshold),
                    desc_off=int(cfg.nDescDistThresholdOffset),
                    interpret=spatial_env == "interp",
                    row_ext=int(_E),
                )
            )
            intra_desc = tuple(d.astype(jnp.uint16) for d in k_intra)
        elif use_pallas_v2:
            # v3 TPU path: read-only walk kernel; banks are already
            # current (updates applied eagerly at the previous step's end
            # in XLA) — v1's auto-pipelined full-bank blocks without
            # write-back. Opt-in measured-regression research artifact
            # (PERF.md; the v2 grouped-DMA sibling lives in attic/).
            from tracking_tpu.ops.pallas_consensus import (
                consensus_read_pallas as consensus_walk_pallas,
            )

            bg_sums = state["bg_sum"]
            count, min_desc, min_sum, k_intra = consensus_walk_pallas(
                planes, colors, descs,
                state["lut_delta"], R, old_unstable,
                required=required_eff,
                rel=cfg.fRelLBSPThreshold,
                div=3.0 if c == 1 else 1.0,
                hi_const=float(np.rint(255 * cfg.fRelLBSPThreshold)),
                min_cd=int(cfg.nMinColorDistThreshold),
                desc_off=int(cfg.nDescDistThresholdOffset),
            )
            intra_desc = tuple(d.astype(jnp.uint16) for d in k_intra)
        else:
            if v2:
                # v2: banks are already current (updates applied eagerly at
                # the end of the previous step)
                bg_sums = state["bg_sum"]
                if ctx is None:
                    intra_desc, nb_stack = _intra_descriptor(planes, thr_fn)
                else:
                    intra_ext, nb_ext = _intra_descriptor(planes_ext, thr_fn)
                    intra_desc = tuple(ctx.crop(d) for d in intra_ext)
                    nb_stack = tuple(ctx.crop(nbv) for nbv in nb_ext)
            elif ctx is None:
                colors, descs, bg_sums = _apply_pending_xla(
                    state["pend_ctrl"], state["pend_vals"], colors, descs
                )
                intra_desc, nb_stack = _intra_descriptor(planes, thr_fn)
            else:
                # stencil reads ride halo-extended slabs; everything else is
                # per-pixel on the owned rows
                vals_ext = tuple(
                    ctx.extend_border(v) for v in state["pend_vals"]
                )
                colors, descs, bg_sums = _apply_pending_xla(
                    state["pend_ctrl"], state["pend_vals"], colors, descs,
                    shift_src=lambda ci, dy, dx: ctx.shift_ext(vals_ext[ci], dy, dx),
                )
                intra_ext, nb_ext = _intra_descriptor(planes_ext, thr_fn)
                intra_desc = tuple(ctx.crop(d) for d in intra_ext)
                nb_stack = tuple(ctx.crop(nbv) for nbv in nb_ext)
            carry0 = (
                jnp.zeros((h, w), jnp.int32),
                jnp.full((h, w), max_desc, jnp.int32),
                jnp.full((h, w), max_color, jnp.int32),
            )
            (count, min_desc, min_sum), _ = jax.lax.scan(
                consensus_body, carry0, (colors, descs)
            )
        if not use_fused:
            last_color = tuple(
                jnp.where(t == 0, planes[ci], state["last_color"][ci])
                for ci in range(c)
            )
            last_desc = tuple(
                jnp.where(t == 0, intra_desc[ci], state["last_desc"][ci])
                for ci in range(c)
            )
        # -- fused feedback stage (:358-431) ----------------------------------
        # Rolling means, stochastic update decisions, R/T/v controllers, blink
        # bookkeeping and the nonzero-descriptor map, all in one pass
        # (ops/pallas_feedback). Both backends slice the SAME pre-generated
        # bit field into their draws, so CPU and TPU make bit-identical
        # decisions. `rand() % rate == 0` events become uniform-float draws
        # u·rate < 1 — identical Bernoulli(1/rate) marginals without
        # per-pixel integer division (slow on the VPU).
        # NOTE: a standalone Pallas kernel of this stage was built, measured
        # SLOWER in-context (0.81 vs 0.63 ms/frame in isolation, ~1 ms worse
        # end-to-end — the stage is purely elementwise, XLA fuses it into
        # the surrounding ops for free, and the pallas_call boundary forced
        # 59 full-map HBM materializations), kept two rounds as a
        # parity-tested artifact, then deleted. XLA wins; see PERF.md.
        from tracking_tpu.ops.pallas_feedback import FeedbackConsts, feedback_xla

        # counter-hash field instead of threefry: same uniform marginals,
        # ~0.6 ms/frame cheaper at 720p (ops/rng.py module docstring)
        bits = jax.lax.bitcast_convert_type(
            field_bits(keys[2], (4, H, w)), jnp.int32
        )
        if ctx is not None:
            # global-shape draw + row slice: every pixel sees the same draw
            # as the unsharded run (replicated key)
            bits = ctx.rng_rows(bits)
        # native dtypes throughout (u8 planes/masks, u16 descs): the kernel
        # widens per-tile in VMEM; widening whole maps here would burn HBM
        consts = FeedbackConsts(
            t_incr=FEEDBACK_T_INCR, t_decr=FEEDBACK_T_DECR,
            t_lower=FEEDBACK_T_LOWER, v_incr=FEEDBACK_V_INCR,
            v_decr=FEEDBACK_V_DECR, r_var=FEEDBACK_R_VAR,
            rdist_min=UNSTABLE_REG_RDIST_MIN, ratio_min=UNSTABLE_REG_RATIO_MIN,
            ghost_s_min=GHOSTDET_S_MIN, ghost_d_max=GHOSTDET_D_MAX,
        )
        if use_fused:
            # whole-step fused kernel: pending apply + walk + feedback +
            # next-frame pending pack in one pallas_call (the split path's
            # count/mind/mins/intra intermediates and the XLA feedback's
            # re-reads never touch HBM); flags word carries the 5 masks
            from types import SimpleNamespace

            from tracking_tpu.ops.pallas_consensus import (
                consensus_feedback_pallas,
            )

            flags, pend_ctrl, pend_vals, f32o, bg_sums, colors, descs = (
                consensus_feedback_pallas(
                    planes, colors, descs,
                    state["pend_ctrl"], state["pend_vals"],
                    state["lut_delta"], R, old_unstable,
                    required,
                    state["last_color"], state["last_desc"], bits,
                    (state["last_final"], state["blinks"],
                     state["last_blink_mask"], state["last_raw"],
                     state["last_dil_inv"]),
                    (state["mean_last"], state["dmin_lt"], state["dmin_st"],
                     state["raw_lt"], state["raw_st"], state["final_lt"],
                     state["final_st"], state["T"], state["v"]),
                    (a_lt, a_st, state["lr_lower"], state["lr_upper"],
                     state["cooldown"], t),
                    rel=cfg.fRelLBSPThreshold,
                    div=3.0 if c == 1 else 1.0,
                    hi_const=float(np.rint(255 * cfg.fRelLBSPThreshold)),
                    min_cd=int(cfg.nMinColorDistThreshold),
                    desc_off=int(cfg.nDescDistThresholdOffset),
                    use3x3_global=bool(use3x3_global),
                    k_consts=consts,
                    interpret=fused_interp,
                )
            )
            intra_desc = tuple(
                ((v_ >> 8) & 0xFFFF).astype(jnp.uint16) for v_ in pend_vals
            )
            fb = SimpleNamespace(
                is_fg=(flags & 1) != 0,
                unstable=((flags >> 1) & 1) != 0,
                nz=((flags >> 2) & 1) != 0,
                curr_blink=((flags >> 3) & 1) != 0,
                blinks_pre=((flags >> 4) & 1) != 0,
                mean_last=f32o[0], dmin_lt=f32o[1], dmin_st=f32o[2],
                raw_lt=f32o[3], raw_st=f32o[4], T=f32o[5], v=f32o[6],
                R=f32o[7],
                upd1=None, slot1=None,  # packed in-kernel; unused here
            )
        else:
            fb_tensors = dict(
                count=count, mind=min_desc, mins=min_sum,
                required=jnp.broadcast_to(
                    jnp.asarray(required, jnp.int32), (h, w)
                ),
                roi=roi,
                planes=tuple(planes),
                intras=tuple(intra_desc),
                last_colors=tuple(last_color),
                last_descs=tuple(last_desc),
                bits=tuple(bits[i] for i in range(4)),
                mean_last=state["mean_last"], dmin_lt=state["dmin_lt"],
                dmin_st=state["dmin_st"], raw_lt=state["raw_lt"],
                raw_st=state["raw_st"], final_lt=state["final_lt"],
                final_st=state["final_st"], R=state["R"], T=state["T"],
                v=state["v"],
                last_final=state["last_final"],  # u8 mask, 0/255
                blinks_old=state["blinks"],
                last_blink_mask=state["last_blink_mask"],
                last_raw=state["last_raw"],  # u8 mask, 0/255
                last_dil_inv=state["last_dil_inv"],
            )
            fb_scalars = (
                a_lt, a_st, state["lr_lower"], state["lr_upper"],
                state["cooldown"],
            )
            fb = feedback_xla(
                fb_tensors, fb_scalars, C=c, N=N,
                use3x3_global=bool(use3x3_global), k=consts,
            )
        is_fg = fb.is_fg  # bool on the XLA path
        raw_fg = jnp.where(is_fg, jnp.uint8(255), jnp.uint8(0))
        mean_last, dmin_lt, dmin_st = fb.mean_last, fb.dmin_lt, fb.dmin_st
        raw_lt, raw_st = fb.raw_lt, fb.raw_st
        unstable = fb.unstable
        upd1, slot1 = fb.upd1, fb.slot1

        # BG self + neighbor-spread writes (:381-404; see module docstring).
        # v1: logged as the pending control word + packed frame values,
        # applied by the NEXT step's consensus (in-VMEM on the Pallas path,
        # _apply_pending_xla otherwise) — both backends replay the identical
        # log bit-identically.
        # v2: applied eagerly right here with frame-global slot draws — the
        # reference's per-pixel uniform slot marginals are preserved (the
        # slot is only a storage position) and only the ≤3 touched slots
        # cross HBM. The bg image then includes this frame's writes, exactly
        # like the reference's getBackgroundImage (v1's lags one frame).
        if use_fused:
            pass  # pend_ctrl/pend_vals were packed in-kernel
        elif v2:
            fires = fb.fire3.astype(jnp.uint8) | (fb.fire5.astype(jnp.uint8) << 1)
            slots_g = jax.random.randint(keys[4], (3,), 0, N)
            vals_now = pack_pending_vals(planes, intra_desc, fires)
            if ctx is None:
                v2_shift = None
            else:
                vals_now_ext = tuple(ctx.extend_border(v) for v in vals_now)
                v2_shift = lambda ci, dy, dx: ctx.shift_ext(vals_now_ext[ci], dy, dx)
            colors, descs, bg_sums = _apply_updates_global(
                upd1, nb3_to_nb5_idx(fb.o3), fb.o5,
                slots_g[0], slots_g[1], slots_g[2],
                vals_now, colors, descs, state["bg_sum"], shift_src=v2_shift,
            )
        else:
            fires = fb.fire3.astype(jnp.uint8) | (fb.fire5.astype(jnp.uint8) << 1)
            pend_ctrl = pack_pending_ctrl(
                upd1, slot1, nb3_to_nb5_idx(fb.o3), fb.o5, fb.slot3, fb.slot5
            )
            pend_vals = pack_pending_vals(planes, intra_desc, fires)

        # -- feedback (:406-429): fused above ---------------------------------
        T, v, R = fb.T, fb.v, fb.R

        # nonzero-descriptor ratio (:430-431 / :577-578)
        nz_sum = jnp.sum(fb.nz & roi).astype(jnp.float32)
        if ctx is not None:
            nz_sum = ctx.psum(nz_sum)
        nz_ratio = nz_sum / n_roi_px

        # -- post-processing (:624-642) --------------------------------------
        # Spatial mode: flood-fill hole filling is border-connected global
        # propagation (unbounded reach), so the whole chain runs replicated
        # on the all-gathered full mask — same code, same array, bit-equal —
        # and the owned rows are sliced back out (Amdahl cost ≈ the ~15%
        # post-proc share of the step).
        curr_blink = fb.curr_blink  # xor of raw masks
        if ctx is None:
            pre_flood = morph_close(raw_fg, 3)
            filled = fill_holes(pre_flood, seed="corner")
            holes = (filled > 0) & ~(pre_flood > 0)
            pre_flood_eroded = erode(erode(erode(pre_flood, 3), 3), 3)
            fg1 = jnp.where(
                is_fg | holes | (pre_flood_eroded > 0),
                jnp.uint8(255), jnp.uint8(0),
            )
            final = binary_median_blur(fg1, median_ksize)
            dil_inv = ~(dilate(dilate(dilate(final, 3), 3), 3) > 0)
        else:
            # row-sharded chain: bounded stencils on halo slabs with the
            # ops' border semantics baked into out-of-globe rows; the
            # flood fill runs cross-shard injection rounds. Bit-exact vs
            # the unsharded chain (tests/test_mesh.py) — the round-2
            # all_gather-replicated tail is gone.
            from tracking_tpu.parallel.spatial import sharded_postproc

            final, dil_inv = sharded_postproc(ctx, raw_fg, is_fg, median_ksize)
        # fb.blinks_pre = (curr_blink | last_blink_mask) & STALE inverted
        # mask (:637); the fresh inverted mask applies after post-proc (:639)
        blinks = fb.blinks_pre & dil_inv
        final_fg = final > 0
        final_lt = state["final_lt"] * (1 - a_lt) + final_fg.astype(jnp.float32) * a_lt
        final_st = state["final_st"] * (1 - a_st) + final_fg.astype(jnp.float32) * a_st

        # -- LBSP LUT rescaling (:643-654), carried as a scalar walk ----------
        last_ratio = state["last_nonzero_ratio"]
        dec_cond = (nz_ratio < LBSPDESC_RATIO_MIN) & (last_ratio < LBSPDESC_RATIO_MIN)
        inc_cond = (nz_ratio > LBSPDESC_RATIO_MAX) & (last_ratio > LBSPDESC_RATIO_MAX)
        lut_delta = state["lut_delta"] - dec_cond.astype(jnp.int32) + inc_cond.astype(jnp.int32)
        lut_delta = jnp.clip(lut_delta, -256, 256)

        # -- frame-level motion analysis + auto reset (:655-699) --------------
        lr_lower, lr_upper = state["lr_lower"], state["lr_upper"]
        cooldown = state["cooldown"]
        frames_since = state["frames_since_reset"]
        auto_reset = state["auto_reset"]
        ds_lt, ds_st = state["ds_lt"], state["ds_st"]
        if scaling:
            # Frame-level (replicated) statistics. Sharded mode gathers only
            # the PER-ROW 8-column sums (u16, ~1/10 the plane bytes) instead
            # of the full planes: every partial is an exact integer ≤ 8·255
            # and the cell divisor 64 is a power of two, so the two-stage sum
            # is bit-identical to the one-shot cell mean at any split.
            dsh, dsw = H // DOWNSAMPLE_RATIO, w // DOWNSAMPLE_RATIO

            def _ds_colsum(p):
                rows = p.shape[0]
                return (
                    p[:, : dsw * DOWNSAMPLE_RATIO]
                    .reshape(rows, dsw, DOWNSAMPLE_RATIO)
                    .astype(jnp.uint16)
                    .sum(axis=2, dtype=jnp.uint16)
                )

            def _ds_of(colsum_full):
                s = (
                    colsum_full[: dsh * DOWNSAMPLE_RATIO]
                    .reshape(dsh, DOWNSAMPLE_RATIO, dsw)
                    .astype(jnp.int32)
                    .sum(axis=1)
                )
                return s.astype(jnp.float32) / (DOWNSAMPLE_RATIO * DOWNSAMPLE_RATIO)

            if ctx is None:
                ds = tuple(_ds_of(_ds_colsum(planes[ci])) for ci in range(c))
            else:
                ds = tuple(
                    _ds_of(ctx.gather_rows(_ds_colsum(planes[ci])))
                    for ci in range(c)
                )
            ds_lt = tuple(ds_lt[ci] * (1 - a_lt) + ds[ci] * a_lt for ci in range(c))
            ds_st = tuple(ds_st[ci] * (1 - a_st) + ds[ci] * a_st for ci in range(c))
            perpx = [jnp.abs(ds_st[ci] - ds_lt[ci]).astype(jnp.int32) for ci in range(c)]
            if c == 1:
                diff = perpx[0] // 2
            else:
                diff = jnp.maximum(jnp.maximum(perpx[0], perpx[1]), perpx[2])
            color_diff_ratio = jnp.sum(diff).astype(jnp.float32) / (dsh * dsw)

            reset_thr = cfg.nMinColorDistThreshold / 2.0
            trigger = (
                auto_reset
                & (frames_since <= 1000)
                & (color_diff_ratio >= reset_thr)
                & (cooldown == 0)
            )
            n_refresh = max(int(0.1 * N), 1)
            start = jax.random.randint(keys[8], (), 0, N)

            # The reference refreshes AFTER frame t's stochastic writes
            # (:656-700 runs at frame end): the rare trigger branch applies
            # the pending log eagerly, refreshes, and clears the log so the
            # next step doesn't replay it. Spatial mode hoists the halo
            # exchanges out of the cond (collectives may not live inside a
            # conditional branch): sources arrive as border-clamped slabs
            # (SpatialCtx.extend_border — a few 8-row bands over ICI, not
            # the old full-frame all_gathers of planes/descs/final).
            if ctx is not None:
                src_planes = tuple(ctx.extend_border(p) for p in planes)
                src_intra = tuple(ctx.extend_border(d) for d in intra_desc)
                ok_ext = ctx.extend_border(~final_fg)
                rs_kw = dict(
                    own=ctx.rng_rows,
                    shift=lambda s, dy, dx: ctx.shift_ext(s, -dy, -dx),
                    ok_own=~final_fg,
                    global_h=H,
                )
            else:
                src_planes, src_intra, ok_ext = planes, intra_desc, ~final_fg
                rs_kw = {}
            if v2:
                # v2 banks are already current; refresh then recompute the
                # carried bank sum on the (rare) trigger branch only
                def _do_refresh(args):
                    cd_colors, cd_descs, _bg = args
                    rc, rd = _refresh_samples(
                        keys[9], N, n_refresh, start, src_planes, src_intra,
                        ok_ext, cd_colors, cd_descs, **rs_kw,
                    )
                    return rc, rd, tuple(
                        jnp.sum(cc.astype(jnp.int32), axis=0) for cc in rc
                    )

                colors, descs, bg_sums = jax.lax.cond(
                    trigger, _do_refresh, lambda a: a, (colors, descs, bg_sums)
                )
            else:
                if ctx is not None:
                    new_vals_ext = tuple(ctx.extend_border(v) for v in pend_vals)
                    refresh_shift = lambda ci, dy, dx: ctx.shift_ext(new_vals_ext[ci], dy, dx)
                else:
                    refresh_shift = None

                def _do_refresh(args):
                    cd_colors, cd_descs, ctrl = args
                    ac, ad, _ = _apply_pending_xla(
                        ctrl, pend_vals, cd_colors, cd_descs, shift_src=refresh_shift
                    )
                    rc, rd = _refresh_samples(
                        keys[9], N, n_refresh, start, src_planes, src_intra,
                        ok_ext, ac, ad, **rs_kw,
                    )
                    return rc, rd, jnp.zeros_like(ctrl)

                colors, descs, pend_ctrl = jax.lax.cond(
                    trigger, _do_refresh, lambda a: a, (colors, descs, pend_ctrl)
                )
            T = jnp.where(trigger, jnp.ones_like(T), T)
            cooldown = jnp.where(trigger, cfg.nSamplesForMovingAvgs // 4, cooldown)
            auto_reset = jnp.where(
                auto_reset & (frames_since > 1000),
                False,
                jnp.where(~auto_reset & (color_diff_ratio >= reset_thr * 2), True, auto_reset),
            )
            frames_since = jnp.where(
                trigger, 0, jnp.where(auto_reset, frames_since + 1, frames_since)
            )
            shift = jnp.clip((color_diff_ratio / 2.0).astype(jnp.int32), 0, 30)
            cap_cond = color_diff_ratio >= reset_thr / 2
            lr_lower = jnp.where(
                cap_cond,
                jnp.maximum(jnp.int32(FEEDBACK_T_LOWER) >> shift, 1).astype(jnp.float32),
                jnp.asarray(t_lower_static, jnp.float32),
            )
            lr_upper = jnp.where(
                cap_cond,
                jnp.maximum(jnp.int32(FEEDBACK_T_UPPER) >> shift, 1).astype(jnp.float32),
                jnp.asarray(t_upper_static, jnp.float32),
            )
            cooldown = jnp.maximum(cooldown - 1, 0)

        bg_planes = tuple(
            jnp.rint(bg_sums[ci].astype(jnp.float32) / N).astype(jnp.uint8)
            for ci in range(c)
        )

        new_state = {
            "t": t + 1,
            "key": new_key,
            "colors": colors,
            "descs": descs,
            "R": R,
            "T": T,
            "v": v,
            "mean_last": mean_last,
            "dmin_lt": dmin_lt,
            "dmin_st": dmin_st,
            "raw_lt": raw_lt,
            "raw_st": raw_st,
            "final_lt": final_lt,
            "final_st": final_st,
            "unstable": unstable,
            "blinks": blinks,
            "last_color": planes,
            "last_desc": intra_desc,
            "last_raw": raw_fg,
            "last_final": final,
            "last_blink_mask": curr_blink,
            "last_dil_inv": dil_inv,
            "lut_delta": lut_delta,
            "ds_lt": ds_lt,
            "ds_st": ds_st,
            "last_nonzero_ratio": nz_ratio,
            "frames_since_reset": frames_since,
            "cooldown": cooldown,
            "auto_reset": auto_reset,
            "lr_lower": lr_lower,
            "lr_upper": lr_upper,
        }
        if v2:
            new_state["bg_sum"] = bg_sums
        else:
            new_state["pend_ctrl"] = pend_ctrl
            new_state["pend_vals"] = pend_vals
        return new_state, final, _from_planes(bg_planes, was_gray)
