"""Connected-component labeling + blob statistics, XLA-native.

Replaces OpenCV's pointer-chasing flood-fill / contour CC extraction used by
``CvBlobDetectorCC`` (reference: OpenCV legacy, driven from
``ustc_src/trackingMain.cpp:626``) and the jmo blob library
(``package_bgs/jmo/BlobExtraction.cpp``).

Algorithm: iterative min-label propagation with pointer-jumping. Every
foreground pixel starts labeled with its own linear index; each sweep takes
the neighborhood minimum and then *compresses* (label ← label[label], a
gather), which squares the propagation distance per iteration → convergence
in O(log diameter) sweeps instead of O(diameter). A ``lax.while_loop`` with a
global change flag exits at the fixed point. Shapes are static; masks are the
only data dependence.

Blob statistics are scatter-reductions keyed by root label (area, centroid
sums, bbox min/max) followed by a top-K compaction to a fixed-capacity blob
table — the XLA-friendly replacement for dynamic blob lists.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_SE8 = np.ones((3, 3), dtype=bool)
_SE4 = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], dtype=bool)


def _neighbor_min(lab: jnp.ndarray, fg: jnp.ndarray, se: np.ndarray, big: int):
    """Min label over the structuring-element neighborhood (fg pixels only)."""
    H, W = lab.shape[-2], lab.shape[-1]
    padded = jnp.pad(lab, [(1, 1), (1, 1)], constant_values=big)
    out = lab
    for dy in range(3):
        for dx in range(3):
            if not se[dy, dx] or (dy == 1 and dx == 1):
                continue
            out = jnp.minimum(out, padded[dy : dy + H, dx : dx + W])
    return jnp.where(fg, out, big)


def _masked_min_scan(lab: jnp.ndarray, fg: jnp.ndarray, big: int, axis: int, reverse: bool):
    """Directional min-label flow: y_j = fg_j ? min(lab_j, y_{j−1}) : big.

    T_j(x) = min(x ⊕ m_j, v_j) with m = 0 on fg / big off, v = fg ? lab : big
    (⊕ = saturating add); transforms compose associatively
    ((m1,v1)∘(m2,v2) = (m1⊕m2, min(v1⊕m2, v2))), giving whole-line
    propagation in one log-depth associative scan.
    """
    m = jnp.where(fg, 0, big).astype(jnp.int32)
    v = jnp.where(fg, lab, big).astype(jnp.int32)

    def op(a, b):
        return (
            jnp.minimum(a[0] + b[0], big),
            jnp.minimum(jnp.minimum(a[1] + b[0], big), b[1]),
        )

    _, y = jax.lax.associative_scan(op, (m, v), axis=axis, reverse=reverse)
    return y


@partial(jax.jit, static_argnames=("connectivity",))
def label_components(mask: jnp.ndarray, connectivity: int = 8) -> jnp.ndarray:
    """Label connected components of a binary mask [H, W].

    Returns int32 labels: background = -1; each component labeled by the
    linear index of its minimum pixel (row-major) — deterministic and
    order-compatible with OpenCV's top-left-first numbering after compaction.

    Fixed-point of {4-directional line min-scans (log-depth associative
    scans), one local neighbor-min step (supplies diagonal/4-conn coupling),
    two pointer-jumping label compressions} — converges in O(component
    spiral depth) iterations rather than O(pixel diameter).
    """
    H, W = mask.shape
    # TPU fast path: sequential tile-raster min propagation (ops/pallas_cc)
    # — the pointer-jumping compressions below are [H, W] gathers, ~25 ms
    # each at 720p. Exact same fixed point (component-min labels).
    if jax.default_backend() == "tpu" and mask.ndim == 2:
        from tracking_tpu.ops.pallas_cc import label_components_pallas

        return label_components_pallas(mask, connectivity=connectivity)

    big = H * W
    fg = mask > 0
    iota = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
    lab = jnp.where(fg, iota, big)
    lab, _ = label_fixpoint(fg, lab, big, connectivity)
    return jnp.where(fg, lab, -1)


def label_fixpoint(
    fg: jnp.ndarray,
    lab0: jnp.ndarray,
    big: int,
    connectivity: int = 8,
    base: int | jnp.ndarray = 0,
):
    """Min-label fixpoint from arbitrary initial labels (the CC core, shared
    by :func:`label_components` and the spatially-sharded labeling in
    parallel/spatial.py).

    ``lab0`` values form any total order consistent with row-major pixel
    order; background carries ``big``. ``base``: when labels are GLOBAL
    linear indices on a row-sharded slab, the pointer-jumping compression
    can only follow labels that point inside this slab — ``base`` is the
    slab's first global index; out-of-slab labels pass through uncompressed
    (min propagation still converges to the unique component minimum).

    Returns ``(labels, converged)``: the XLA path always runs to its exact
    fixpoint (converged=True); the TPU raster kernel path caps its rounds
    and reports False when capped mid-change, which the sharded caller folds
    into its global convergence flag.
    """
    H, W = fg.shape
    if jax.default_backend() == "tpu" and fg.ndim == 2:
        from tracking_tpu.ops.pallas_cc import label_fixpoint_pallas

        return label_fixpoint_pallas(fg, lab0, big, connectivity)

    se = _SE8 if connectivity == 8 else _SE4
    n_loc = H * W

    def compress(lab):
        flat = lab.reshape(-1)
        flat_ext = jnp.concatenate([flat, jnp.array([big], jnp.int32)])
        loc = lab - base
        ok = (loc >= 0) & (loc < n_loc)
        comp = flat_ext[jnp.where(ok, loc, n_loc)].reshape(H, W)
        return jnp.where(ok, comp, big)

    def body(carry):
        lab, _ = carry
        new = lab
        for axis in (1, 0):
            for rev in (False, True):
                new = jnp.minimum(new, _masked_min_scan(new, fg, big, axis, rev))
        new = _neighbor_min(new, fg, se, big)
        new = jnp.where(fg, jnp.minimum(new, compress(new)), big)
        new = jnp.where(fg, jnp.minimum(new, compress(new)), big)
        return new, jnp.any(new != lab)

    def cond(carry):
        return carry[1]

    lab, _ = jax.lax.while_loop(cond, body, (lab0, jnp.array(True)))
    return lab, jnp.bool_(True)


class Blobs(NamedTuple):
    """Fixed-capacity blob table (invalid slots have area == 0)."""

    area: jnp.ndarray  # [K] int32
    cx: jnp.ndarray  # [K] f32 centroid x
    cy: jnp.ndarray  # [K] f32 centroid y
    x0: jnp.ndarray  # [K] int32 bbox
    y0: jnp.ndarray  # [K] int32
    x1: jnp.ndarray  # [K] int32 (inclusive)
    y1: jnp.ndarray  # [K] int32 (inclusive)
    label: jnp.ndarray  # [K] int32 root label (pixel index), -1 if invalid

    @property
    def w(self):
        return jnp.maximum(self.x1 - self.x0 + 1, 0)

    @property
    def h(self):
        return jnp.maximum(self.y1 - self.y0 + 1, 0)


def _root_candidates(lab, n_cand: int):
    """Top-``n_cand`` top-left-most component roots of a label image.

    Root compaction: a full top_k over H·W elements costs ~1.05 ms at 720p
    (measured; it was 80% of blob extraction). Roots are sparse, so first
    reduce 8 lane-adjacent pixels to their max (0.1 ms incl. the small
    top_k) — exact unless two roots share an 8-px row block, which the
    count check detects (two components' min-pixels within 8 px on one
    row); only then fall back to the exact full top_k. Returns candidate
    root labels, padded with ``n`` (matches nothing)."""
    H, W = lab.shape
    n = H * W
    iota = (
        jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) * W
        + jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    )
    score = jnp.where(lab == iota, n - iota, 0)
    if W % 8 == 0 and (H * W) // 8 >= n_cand:
        blk = score.reshape(H, W // 8, 8)
        collision = jnp.any(jnp.sum(blk > 0, axis=-1) > 1)
        top_score = jax.lax.cond(
            collision,
            lambda s: jax.lax.top_k(s.reshape(-1), n_cand)[0],
            lambda s: jax.lax.top_k(
                jnp.max(s.reshape(H, W // 8, 8), axis=-1).reshape(-1), n_cand
            )[0],
            score,
        )
    else:
        top_score, _ = jax.lax.top_k(score.reshape(-1), n_cand)
    return jnp.where(top_score > 0, n - top_score, n)  # n matches nothing


def _extract_blobs_mxu(lab, max_blobs: int, n_cand: int = 128):
    """Blob stats without full-image scatters (each ~11 ms at 720p on TPU).

    Roots (component-min pixels, where lab == own index) are compacted with
    one top_k; per-component statistics become one-hot contractions over the
    candidate axis — row/column count matrices via MXU einsums, from which
    area, centroid sums, and bounding boxes are tiny reductions. Caveat: if
    a frame has more than `n_cand` components, the top-`max_blobs`-by-area
    selection is taken among the `n_cand` top-left-most roots (the XLA
    scatter path considers all components); real masks after median
    filtering have far fewer.
    """
    H, W = lab.shape
    n = H * W
    roots_c = _root_candidates(lab, n_cand)

    # area per candidate: one [H, W, K] one-hot, contracted over W then H.
    # One-hots are bf16 with f32 MXU accumulation — exact (integer sums of
    # 0/1 accumulate in f32) at half the one-hot HBM traffic.
    ones_w = jnp.ones((W,), jnp.bfloat16)
    ohc = (lab[:, :, None] == roots_c[None, None, :]).astype(jnp.bfloat16)
    cnt_rk_c = jnp.einsum(
        "hwk,w->hk", ohc, ones_w, preferred_element_type=jnp.float32
    )
    area_c = jnp.sum(cnt_rk_c, axis=0)

    top_area, top_i = jax.lax.top_k(area_c, max_blobs)
    roots = roots_c[top_i]

    oh = (lab[:, :, None] == roots[None, None, :]).astype(jnp.bfloat16)
    cnt_rk = jnp.einsum(
        "hwk,w->hk", oh, ones_w, preferred_element_type=jnp.float32
    )
    cnt_wk = jnp.einsum(
        "hwk,h->wk", oh, jnp.ones((H,), jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    rows = blob_row_moments(cnt_rk, jnp.arange(H, dtype=jnp.int32), H)
    return blob_finalize(rows, cnt_wk, roots, H, W)


def blob_row_moments(cnt_rk, ys: jnp.ndarray, H: int):
    """Row-axis blob moments (area, Σy, bbox-y maxes) from a per-row count
    matrix [rows, K] whose rows cover global rows ``ys``.

    All values are exact integers accumulated in i32 — exact AND
    addition-order-free, so the spatially-sharded caller psums per-shard
    partials and lands on bit-identical results (the f32 sums this replaces
    were already rounding for blobs with coordinate sums > 2²⁴). The bbox
    mins are encoded as maxes ((H−1)−max((H−1)−y) == min y, empty → H) so
    partials combine with one pmax."""
    cnt = cnt_rk.astype(jnp.int32)
    pr = cnt > 0
    area = jnp.sum(cnt, axis=0)
    sy = jnp.sum(cnt * ys[:, None], axis=0)
    ny0 = jnp.max(jnp.where(pr, (H - 1) - ys[:, None], -1), axis=0)
    y1 = jnp.max(jnp.where(pr, ys[:, None], -1), axis=0)
    return area, sy, ny0, y1


def blob_finalize(rows, cnt_wk, roots, H: int, W: int) -> Blobs:
    """Blob table from combined row moments + full column counts [W, K]."""
    area, sy, ny0, y1 = rows
    xs = jnp.arange(W, dtype=jnp.int32)
    cnt_w = cnt_wk.astype(jnp.int32)
    pw_ = cnt_w > 0
    sx = jnp.sum(cnt_w * xs[:, None], axis=0)
    y0 = (H - 1) - ny0
    x0 = (W - 1) - jnp.max(jnp.where(pw_, (W - 1) - xs[:, None], -1), axis=0)
    x1 = jnp.max(jnp.where(pw_, xs[:, None], -1), axis=0)

    ok = area > 0
    inv_a = 1.0 / jnp.maximum(area.astype(jnp.float32), 1.0)
    return Blobs(
        area=jnp.where(ok, area, 0),
        cx=jnp.where(ok, sx.astype(jnp.float32) * inv_a, 0.0),
        cy=jnp.where(ok, sy.astype(jnp.float32) * inv_a, 0.0),
        x0=jnp.where(ok, x0, 0),
        y0=jnp.where(ok, y0, 0),
        x1=jnp.where(ok, x1, -1),
        y1=jnp.where(ok, y1, -1),
        label=jnp.where(ok, roots, -1),
    )


@partial(jax.jit, static_argnames=("max_blobs", "connectivity"))
def extract_blobs(
    mask: jnp.ndarray, max_blobs: int = 64, connectivity: int = 8
) -> Blobs:
    """Binary mask [H, W] → top-`max_blobs` components by area."""
    H, W = mask.shape
    n = H * W
    lab = label_components(mask, connectivity)
    if jax.default_backend() == "tpu":
        return _extract_blobs_mxu(lab, max_blobs)
    flat = lab.reshape(-1)
    valid = flat >= 0
    idx = jnp.where(valid, flat, n)  # background scatters into the overflow bin

    ys = jnp.arange(n, dtype=jnp.int32) // W
    xs = jnp.arange(n, dtype=jnp.int32) % W

    # moment sums in i32 (exact + order-free), matching _extract_blobs_mxu
    area = jnp.zeros(n + 1, jnp.int32).at[idx].add(1)
    sx = jnp.zeros(n + 1, jnp.int32).at[idx].add(xs)
    sy = jnp.zeros(n + 1, jnp.int32).at[idx].add(ys)
    bx0 = jnp.full(n + 1, W, jnp.int32).at[idx].min(xs)
    by0 = jnp.full(n + 1, H, jnp.int32).at[idx].min(ys)
    bx1 = jnp.full(n + 1, -1, jnp.int32).at[idx].max(xs)
    by1 = jnp.full(n + 1, -1, jnp.int32).at[idx].max(ys)

    area = area.at[n].set(0)  # drop the background bin
    top_area, top_idx = jax.lax.top_k(area, max_blobs)
    ok = top_area > 0
    inv_a = 1.0 / jnp.maximum(top_area.astype(jnp.float32), 1.0)
    return Blobs(
        area=jnp.where(ok, top_area, 0),
        cx=jnp.where(ok, sx[top_idx].astype(jnp.float32) * inv_a, 0.0),
        cy=jnp.where(ok, sy[top_idx].astype(jnp.float32) * inv_a, 0.0),
        x0=jnp.where(ok, bx0[top_idx], 0),
        y0=jnp.where(ok, by0[top_idx], 0),
        x1=jnp.where(ok, bx1[top_idx], -1),
        y1=jnp.where(ok, by1[top_idx], -1),
        label=jnp.where(ok, top_idx, -1),
    )


@partial(jax.jit, static_argnames=("max_blobs", "connectivity"))
def area_gate(
    mask: jnp.ndarray,
    min_area: float,
    max_blobs: int = 64,
    connectivity: int = 8,
) -> jnp.ndarray:
    """Zero out components smaller than ``min_area`` (the FGD minArea gate,
    OpenCV legacy ``cvbgfg_gaussmix`` / FGD post-processing parity).

    Keeps the top-``max_blobs``-by-area components that clear ``min_area``
    — identical semantics to extract_blobs + a keep-by-label pass, but the
    labeling runs ONCE and the keep mask falls out of the one-hot the MXU
    blob statistics already materialize (extract_blobs + a separate
    label_components + a [K, H, W] any-compare measured 2.5 ms at 720p;
    this is ~0.9)."""
    H, W = mask.shape
    n = H * W
    lab = label_components(mask, connectivity)
    if jax.default_backend() == "tpu":
        # areas only — no moment contractions: the gate needs candidate
        # areas (top-max_blobs membership by pairwise rank, first-candidate
        # ties) and a per-pixel kept-root membership test. Round 5: the
        # [H, W, 128] bf16 one-hot + two einsums was replaced by a
        # [K, H, W] compare-reduce for the areas and a 128-iteration fused
        # where-chain for the membership (reads lab once per pixel; no
        # one-hot ever materializes) — measured 1.70 -> 1.34 ms on FGD's
        # dense motion-window masks, bit-identical output.
        n_cand = 128
        roots_c = _root_candidates(lab, n_cand)
        area_c = jnp.sum(
            (lab[None] == roots_c[:, None, None]).astype(jnp.int32),
            axis=(1, 2),
        )
        ci = jnp.arange(n_cand)
        rank = jnp.sum(
            (area_c[None, :] > area_c[:, None])
            | ((area_c[None, :] == area_c[:, None]) & (ci[None, :] < ci[:, None])),
            axis=1,
        )
        okf = (area_c >= min_area) & (rank < max_blobs)
        keep = jnp.zeros(lab.shape, bool)
        for k in range(n_cand):
            keep = keep | ((lab == roots_c[k]) & okf[k])
    else:
        flat = lab.reshape(-1)
        idx = jnp.where(flat >= 0, flat, n)
        area = jnp.zeros(n + 1, jnp.int32).at[idx].add(1).at[n].set(0)
        top_area, top_idx = jax.lax.top_k(area, max_blobs)
        flag = (
            jnp.zeros(n + 1, bool)
            .at[jnp.where(top_area > 0, top_idx, n)]
            .set(top_area >= min_area)
            .at[n]
            .set(False)
        )
        keep = flag[idx].reshape(H, W)
    return jnp.where(keep, jnp.uint8(255), jnp.uint8(0))
