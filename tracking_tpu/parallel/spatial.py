"""Single-stream spatial scale-out: shard H over chips with explicit halos.

The reference is strictly single-threaded (SURVEY §2.10); its only true
sequential dependency is time. Within one frame, every BGS model is a
per-pixel state machine whose spatial coupling is a *bounded stencil*:
the 5×5 LBSP patch (``package_bgs/pl/LBSP.h:50-59``), the 3×3/5×5
stochastic neighbor spread (``BackgroundSubtractorSuBSENSE.cpp:381-405``)
and the post-processing morphology chain (``:624-642``). That makes row
sharding the natural single-stream scale-out: each chip owns a slab of
rows plus a halo ring exchanged over ICI with ``ppermute``.

Design (exactness argument in each piece):

- ``SpatialCtx.extend_plain(x)`` builds an extended slab whose row ``y``
  holds ``global[clip(row0-halo+y, 0, H-1)]``: a two-neighbor ``ppermute``
  plus edge fix-ups. Applying any *edge-clamped* stencil (e.g.
  ``ops.lbsp.neighbor_stack``'s ``mode="edge"`` pad) to this slab and
  cropping the owned rows reproduces the unsharded result exactly, because
  the clamp semantics are baked into the halo row *contents* — the op
  itself needs no modification and its own boundary handling never engages
  (the ext edge is ``halo`` rows away from any owned row).
- ``extend_border(x)`` bakes the LBSP-ROI clamp ``clip(·, 2, H-3)``
  (``_shift_clamped``'s border crop) into the halo contents the same way;
  ``shift_ext`` then realizes ``S(y,x) = x[clip(y-dy,2,H-3),
  clip(x-dx,2,W-3)]`` as a static row slice + the usual column crop/pad.
- The post-processing chain is row-sharded too (:func:`sharded_postproc`):
  every bounded stencil (close, erode³, median, dilate³) rides a
  halo-extended slab whose out-of-globe rows carry that op's OpenCV
  border semantics, and the one *unbounded* op — flood-fill hole filling
  — runs as per-shard reach fixpoints with single-row boundary-injection
  rounds and a psum'd convergence flag (:func:`sharded_fill`). The one
  all_gather left in the per-frame loop is the frame-level motion
  analysis' plane/descriptor gather (lbsp_family.py ``scaling`` block) —
  accounted in PERF.md's multi-chip budget.
- RNG fields are drawn at *global* shape from the replicated key and
  row-sliced, so every pixel sees the same draw as the unsharded run —
  this is what makes the sharded masks equal bit-for-bit, not just
  statistically.

The consensus compute inside the shard runs the fused Pallas kernel by
default on TPU (row_ext contract: planes/pending maps arrive as
halo-extended slabs, banks stay owned-size; ``TRACKING_TPU_SPATIAL=xla``
restores the scan formulation, ``=interp`` forces the interpret kernel
on the CPU mesh). See PERF.md "Multi-chip budget" for the per-chip
ms/frame table this design targets.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DEFAULT_HALO = 8  # covers: LBSP ±2, spread ±2, refresh-pattern ±3 (+ slack)


class SpatialCtx:
    """Per-device view of a row-sharded frame; built inside ``shard_map``."""

    def __init__(self, axis: str, n_shards: int, h_global: int, halo: int = DEFAULT_HALO):
        self.axis = axis
        self.n = n_shards
        self.H = h_global
        self.halo = halo
        self.h_loc = h_global // n_shards
        assert h_global % n_shards == 0, (h_global, n_shards)
        assert halo <= self.n * self.h_loc, "halo exceeds the global height"
        self.idx = jax.lax.axis_index(axis)
        self.row0 = self.idx * self.h_loc
        # axes for data-dependent convergence flags (sharded_fill): on a
        # combined stream x space mesh this must span ALL mesh axes so every
        # device runs the same number of collective rounds — divergent
        # while_loop trip counts across independent subgroups abort XLA:CPU's
        # in-process rendezvous (and stagger real-TPU ICI phases for nothing:
        # the extra rounds on already-converged subgroups are no-op fixpoint
        # re-confirmations).
        self.conv_axes: tuple = (axis,)

    # -- collectives -------------------------------------------------------
    def _ppermute(self, x, shift: int):
        perm = [(i, i + shift) for i in range(self.n) if 0 <= i + shift < self.n]
        return jax.lax.ppermute(x, self.axis, perm)

    def _halo_band(self, x, hl: int, top: bool):
        """The ``hl`` rows directly above (``top``) / below my slab, gathered
        from as many neighbor shards as the band spans (multi-hop ppermute
        when ``hl > h_loc``); rows outside the global range arrive as the
        ppermute zero-fill and are fixed up by the caller's edge clamp."""
        hops = -(-hl // self.h_loc)
        parts = []
        r = hl - (hops - 1) * self.h_loc  # rows taken from the farthest hop
        for k in range(hops, 0, -1):
            if k == hops:
                band = x[..., -r:, :] if top else x[..., :r, :]
            else:
                band = x
            parts.append(self._ppermute(band, +k if top else -k))
        return jnp.concatenate(parts if top else parts[::-1], axis=-2)

    def psum(self, x):
        return jax.lax.psum(x, self.axis)

    def gather_rows(self, x):
        """Owned slab [..., h_loc, W] → replicated full [..., H, W]."""
        return jax.lax.all_gather(x, self.axis, axis=x.ndim - 2, tiled=True)

    def own_rows(self, x_full):
        """Replicated full [..., H, W] → my owned rows [..., h_loc, W]."""
        return jax.lax.dynamic_slice_in_dim(x_full, self.row0, self.h_loc, axis=x_full.ndim - 2)

    # -- halo construction -------------------------------------------------
    def extend_plain(self, x, halo: Optional[int] = None):
        """[..., h_loc, W] → [..., h_loc+2·halo, W] with row y holding
        ``global[clip(row0-halo+y, 0, H-1)]`` (edge-clamp semantics).
        ``halo`` may exceed ``h_loc`` (multi-hop ppermute)."""
        hl = self.halo if halo is None else halo
        ext = jnp.concatenate(
            [self._halo_band(x, hl, True), x, self._halo_band(x, hl, False)],
            axis=-2,
        )
        gy = (self.row0 - hl) + jnp.arange(ext.shape[-2])
        gy = gy.reshape((-1, 1))
        eh = ext.shape[-2]
        # global edges: the ppermute zero-fill there is replaced by the true
        # global edge rows 0 / H-1 — any shard with out-of-globe rows also
        # holds the edge row inside its ext (contiguity), at a traced index
        i_zero = jnp.clip(hl - self.row0, 0, eh - 1)
        i_last = jnp.clip(hl + (self.H - 1) - self.row0, 0, eh - 1)
        first = jax.lax.dynamic_slice_in_dim(ext, i_zero, 1, axis=ext.ndim - 2)
        last = jax.lax.dynamic_slice_in_dim(ext, i_last, 1, axis=ext.ndim - 2)
        ext = jnp.where(gy < 0, first, ext)
        ext = jnp.where(gy > self.H - 1, last, ext)
        return ext

    def extend_border(self, x, border: int = 2, halo: Optional[int] = None):
        """Like :meth:`extend_plain` but with the LBSP-ROI clamp
        ``clip(·, border, H-1-border)`` baked into the contents."""
        hl = self.halo if halo is None else halo
        ext = self.extend_plain(x, halo=hl)
        b = border
        gy = (self.row0 - hl) + jnp.arange(ext.shape[-2])
        gy = gy.reshape((-1, 1))
        eh = ext.shape[-2]
        # global rows b and H-1-b live at traced local indices; clamp keeps
        # the slice legal on shards that don't contain them (their predicate
        # is false everywhere, so the value is unused)
        i_top = jnp.clip(hl + b - self.row0, 0, eh - 1)
        i_bot = jnp.clip(hl + (self.H - 1 - b) - self.row0, 0, eh - 1)
        row_b = jax.lax.dynamic_slice_in_dim(ext, i_top, 1, axis=ext.ndim - 2)
        row_hb = jax.lax.dynamic_slice_in_dim(ext, i_bot, 1, axis=ext.ndim - 2)
        ext = jnp.where(gy < b, row_b, ext)
        ext = jnp.where(gy > self.H - 1 - b, row_hb, ext)
        return ext

    def crop(self, ext, halo: Optional[int] = None):
        """Extended slab → owned rows."""
        hl = self.halo if halo is None else halo
        return ext[..., hl : hl + self.h_loc, :]

    def shift_ext(self, ext_border, dy: int, dx: int, border: int = 2):
        """``_shift_clamped`` twin on a border-extended slab: returns the
        owned-shaped ``S(y, x) = global[clip(y-dy, b, H-1-b),
        clip(x-dx, b, W-1-b)]``."""
        hl = self.halo
        rows = ext_border[..., hl - dy : hl - dy + self.h_loc, :]
        w = rows.shape[-1]
        b = border
        crop = rows[..., b : w - b]
        pl, pr = b + dx, b - dx
        pad = [(0, 0)] * (rows.ndim - 1) + [(max(pl, 0), max(pr, 0))]
        out = jnp.pad(crop, pad, mode="edge")
        xs = max(-pl, 0)
        return out[..., xs : xs + w]

    def extend_const(self, x, halo: int, const=0):
        """Like :meth:`extend_plain` but out-of-globe rows hold ``const`` —
        the halo form of OpenCV's BORDER_CONSTANT morphology padding
        (erode pads 255, dilate pads 0)."""
        hl = halo
        ext = jnp.concatenate(
            [self._halo_band(x, hl, True), x, self._halo_band(x, hl, False)],
            axis=-2,
        )
        gy = (self.row0 - hl) + jnp.arange(ext.shape[-2])
        gy = gy.reshape((-1, 1))
        out = (gy < 0) | (gy > self.H - 1)
        return jnp.where(out, jnp.asarray(const, ext.dtype), ext)

    def out_globe(self, halo: int, h_rows: Optional[int] = None):
        """[rows, 1] bool: which rows of a halo-``halo`` slab lie outside
        the global image."""
        rows = self.h_loc + 2 * halo if h_rows is None else h_rows
        gy = (self.row0 - halo) + jnp.arange(rows)
        gy = gy.reshape((-1, 1))
        return (gy < 0) | (gy > self.H - 1)

    def clamp_rows(self, ext, halo: int):
        """Overwrite a slab's out-of-globe rows with the global edge rows
        (row 0 / row H−1) — realizes edge-replicate semantics for values
        COMPUTED on the slab (e.g. the median input fg1)."""
        gy = (self.row0 - halo) + jnp.arange(ext.shape[-2])
        gy = gy.reshape((-1, 1))
        eh = ext.shape[-2]
        i_zero = jnp.clip(halo - self.row0, 0, eh - 1)
        i_last = jnp.clip(halo + (self.H - 1) - self.row0, 0, eh - 1)
        first = jax.lax.dynamic_slice_in_dim(ext, i_zero, 1, axis=ext.ndim - 2)
        last = jax.lax.dynamic_slice_in_dim(ext, i_last, 1, axis=ext.ndim - 2)
        ext = jnp.where(gy < 0, first, ext)
        ext = jnp.where(gy > self.H - 1, last, ext)
        return ext

    # -- global-consistent pieces -----------------------------------------
    def roi(self, w: int, border: int = 2):
        """Owned rows of the global LBSP ROI (2-px border excluded)."""
        gy = self.row0 + jnp.arange(self.h_loc)
        rows_ok = (gy >= border) & (gy <= self.H - 1 - border)
        cols = np.zeros((w,), bool)
        cols[border : w - border] = True
        return rows_ok[:, None] & jnp.asarray(cols)[None, :]

    def rng_rows(self, full_field):
        """Row-slice of a *global-shape* random field (drawn identically on
        every shard from the replicated key, so pixels match the unsharded
        run bit-for-bit)."""
        return jax.lax.dynamic_slice_in_dim(
            full_field, self.row0, self.h_loc, axis=full_field.ndim - 2
        )


def sharded_fill(ctx: SpatialCtx, mask_own: jnp.ndarray) -> jnp.ndarray:
    """Row-sharded flood-fill hole filling, exact vs ``ops.morphology.
    fill_holes(mask, seed="corner")`` (``cv::floodFill(Point(0,0))`` parity,
    ``BackgroundSubtractorSuBSENSE.cpp:630``).

    Each round runs the LOCAL reach fixpoint per shard (the same raster
    Pallas kernel / line-sweep formulation as unsharded), then exchanges ONE
    boundary row with each neighbor (4-connectivity across a row cut is
    same-column only) and re-converges; a psum'd convergence flag ends the
    loop. Rounds are data-dependent (the mask's cross-shard spiral depth —
    1-2 on real masks); the fixpoint is unique, so any schedule reaches the
    same set the unsharded sweep does."""
    from tracking_tpu.ops.morphology import reach_fixpoint

    fg = mask_own > 0
    bg = ~fg
    h, w = mask_own.shape
    seed = (
        (ctx.row0 + jnp.arange(h) == 0)[:, None]
        & (jnp.arange(w) == 0)[None, :]
    )
    reach0 = seed & bg

    def body(carry):
        reach, _ = carry
        reach = reach_fixpoint(bg, reach)
        up = ctx._ppermute(reach[-1:], +1)  # prev shard's last row
        dn = ctx._ppermute(reach[:1], -1)  # next shard's first row
        row0_new = reach[:1] | (bg[:1] & up)
        rowl_new = reach[-1:] | (bg[-1:] & dn)
        new = jnp.concatenate([row0_new, reach[1:-1], rowl_new], axis=0)
        changed = jax.lax.psum(
            jnp.any(new != reach).astype(jnp.int32), ctx.conv_axes
        )
        return new, changed > 0

    reach, _ = jax.lax.while_loop(
        lambda c: c[1], body, (reach0, jnp.array(True))
    )
    return jnp.where(fg | ~reach, jnp.uint8(255), jnp.uint8(0))


def sharded_label(
    ctx: SpatialCtx, mask_own: jnp.ndarray, connectivity: int = 8
) -> jnp.ndarray:
    """Row-sharded connected-component labeling, exact vs
    ``ops.cc.label_components`` (labels = GLOBAL row-major index of each
    component's minimum pixel; background −1).

    Same round structure as :func:`sharded_fill` — per-shard min-label
    fixpoint (``ops.cc.label_fixpoint``: the raster Pallas kernel on TPU,
    log-depth line scans on CPU), then one boundary-row exchange per
    neighbor with the connectivity's ±1 column coupling, to a psum'd global
    fixpoint. Label values are global indices throughout; the per-shard
    pointer-jumping compression follows only labels that point inside the
    shard (``base`` argument) — min propagation carries the rest."""
    from tracking_tpu.ops.cc import label_fixpoint

    fg = mask_own > 0
    h, w = mask_own.shape
    big = ctx.H * w
    base = ctx.row0 * w
    iota = base + (
        jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
        + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    )
    lab0 = jnp.where(fg, iota, big)

    def inject(row_lab, nb_row, nb_valid):
        """Min-couple my edge row with a neighbor's boundary row."""
        nb = jnp.where(nb_valid, nb_row, big)
        cand = nb
        if connectivity == 8:
            left = jnp.concatenate([jnp.full((1, 1), big, jnp.int32), nb[:, :-1]], axis=1)
            right = jnp.concatenate([nb[:, 1:], jnp.full((1, 1), big, jnp.int32)], axis=1)
            cand = jnp.minimum(cand, jnp.minimum(left, right))
        return jnp.where(row_lab < big, jnp.minimum(row_lab, cand), big)

    def body(carry):
        lab, _ = carry
        lab, conv = label_fixpoint(fg, lab, big, connectivity, base=base)
        up = ctx._ppermute(lab[-1:], +1)  # prev shard's last row
        dn = ctx._ppermute(lab[:1], -1)  # next shard's first row
        row0_new = inject(lab[:1], up, ctx.idx > 0)
        rowl_new = inject(lab[-1:], dn, ctx.idx < ctx.n - 1)
        new = jnp.concatenate([row0_new, lab[1:-1], rowl_new], axis=0)
        # a shard whose local raster pass hit its round cap un-converged
        # must force another global round even if injection changed nothing
        changed = jax.lax.psum(
            (jnp.any(new != lab) | ~conv).astype(jnp.int32), ctx.conv_axes
        )
        return new, changed > 0

    lab, _ = jax.lax.while_loop(
        lambda c: c[1], body, (lab0, jnp.array(True))
    )
    return jnp.where(fg, lab, -1)


def sharded_extract_blobs(
    ctx: SpatialCtx,
    mask_own: jnp.ndarray,
    max_blobs: int = 64,
    connectivity: int = 8,
    n_cand: int = 128,
):
    """Row-sharded blob extraction, bit-identical to ``ops.cc.extract_blobs``
    on the gathered mask (the replicated-tail fix: labeling, root compaction
    and the MXU moment contractions all run on owned rows; only O(K)-sized
    tables cross ICI).

    Exactness: root candidates merge per-shard top-k's (every global
    top-``n_cand`` root is in its own shard's top-``n_cand``); count
    matrices are exact integers, so psum partials equal the unsharded sums
    regardless of order (ops/cc.py ``blob_row_moments``); bbox mins/maxes
    combine with pmax. The returned ``Blobs`` table is replicated on every
    shard."""
    from tracking_tpu.ops.cc import Blobs, blob_finalize, blob_row_moments

    h, w = mask_own.shape
    n_glob = ctx.H * w
    lab = sharded_label(ctx, mask_own, connectivity)

    gy = ctx.row0 + jnp.arange(h, dtype=jnp.int32)
    iota = (
        gy[:, None] * w + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    )
    score = jnp.where(lab == iota, n_glob - iota, 0)
    # per-shard root compaction, then a replicated merge: each shard's local
    # top-n_cand contains every global top-n_cand root that lives in it
    k_loc = min(n_cand, h * w)
    top_loc, _ = jax.lax.top_k(score.reshape(-1), k_loc)
    top_all = jax.lax.all_gather(top_loc, ctx.axis, axis=0, tiled=True)
    top_score, _ = jax.lax.top_k(top_all, n_cand)
    roots_c = jnp.where(top_score > 0, n_glob - top_score, n_glob)

    ohc = (lab[:, :, None] == roots_c[None, None, :]).astype(jnp.float32)
    cnt_rk_c = jnp.einsum("hwk,w->hk", ohc, jnp.ones((w,), jnp.float32))
    area_c = jax.lax.psum(
        jnp.sum(cnt_rk_c.astype(jnp.int32), axis=0), ctx.axis
    )
    top_area, top_i = jax.lax.top_k(area_c, max_blobs)
    roots = roots_c[top_i]

    oh = (lab[:, :, None] == roots[None, None, :]).astype(jnp.float32)
    cnt_rk = jnp.einsum("hwk,w->hk", oh, jnp.ones((w,), jnp.float32))
    cnt_wk = jax.lax.psum(
        jnp.einsum("hwk,h->wk", oh, jnp.ones((h,), jnp.float32)), ctx.axis
    )
    area_p, sy_p, ny0_p, y1_p = blob_row_moments(cnt_rk, gy, ctx.H)
    rows = (
        jax.lax.psum(area_p, ctx.axis),
        jax.lax.psum(sy_p, ctx.axis),
        jax.lax.pmax(ny0_p, ctx.axis),
        jax.lax.pmax(y1_p, ctx.axis),
    )
    return blob_finalize(rows, cnt_wk, roots, ctx.H, w)


def sharded_postproc(
    ctx: SpatialCtx,
    raw_fg: jnp.ndarray,
    is_fg: jnp.ndarray,
    median_ksize: int,
):
    """Row-sharded SuBSENSE post-processing chain
    (``BackgroundSubtractorSuBSENSE.cpp:624-639``), bit-exact vs the
    unsharded ``morph_close → fill_holes → erode³ → median → dilate³``:
    every bounded stencil rides a halo-extended slab whose out-of-globe rows
    carry that op's OpenCV border semantics (dilate 0 / erode 255 / median
    edge-replicate via :meth:`SpatialCtx.clamp_rows`), and the unbounded
    flood fill runs as cross-shard injection rounds (:func:`sharded_fill`).
    Returns (final u8 owned rows, dil_inv bool owned rows)."""
    from tracking_tpu.ops.filters import binary_median_blur
    from tracking_tpu.ops.morphology import dilate, erode

    h = ctx.h_loc
    mr = median_ksize // 2
    F = mr + 3          # fg1 rows needed: median ±mr for final ±3 (dilate³)
    Ch = F + 3          # close rows needed: erode³ reach for fg1 ±F
    E = Ch + 2          # raw rows: dilate ±1 + erode ±1 for close ±Ch

    def shrink(slab, a: int, b: int):
        """Slab with halo a → slab with halo b (a ≥ b)."""
        return slab[a - b : a - b + h + 2 * b]

    # close = erode(dilate(raw)): dilate pads 0, erode pads 255 at the globe
    ext_raw = ctx.extend_const(raw_fg, E, 0)
    dil = jnp.where(ctx.out_globe(E), jnp.uint8(255), dilate(ext_raw, 3))
    close = erode(dil, 3)  # valid on ±Ch (slab-edge rows garbage, unused)

    filled_own = sharded_fill(ctx, shrink(close, E, 0))

    # fg1 = is_fg | holes | eroded³(close), built on ±F rows
    close_F = shrink(close, E, F)
    cc = jnp.where(ctx.out_globe(Ch), jnp.uint8(255), shrink(close, E, Ch))
    er = erode(erode(erode(cc, 3), 3), 3)  # valid on ±F
    er_F = shrink(er, Ch, F)
    is_fg_F = ctx.extend_plain(is_fg, halo=F)
    filled_F = ctx.extend_plain(filled_own, halo=F)
    holes_F = (filled_F > 0) & ~(close_F > 0)
    fg1 = jnp.where(
        is_fg_F | holes_F | (er_F > 0), jnp.uint8(255), jnp.uint8(0)
    )
    # median pads edge-replicate: out-of-globe fg1 rows = the edge row's
    # COMPUTED fg1 (clamp_rows), exactly jnp.pad(..., mode="edge") unsharded
    fg1 = ctx.clamp_rows(fg1, F)

    final_3 = shrink(binary_median_blur(fg1, median_ksize), F, 3)
    final_own = shrink(final_3, 3, 0)
    fin_d = jnp.where(ctx.out_globe(3), jnp.uint8(0), final_3)
    dilated = dilate(dilate(dilate(fin_d, 3), 3), 3)
    dil_inv_own = ~(shrink(dilated, 3, 0) > 0)
    return final_own, dil_inv_own


def spatial_specs(state, h_global: int, axis: str = "space"):
    """PartitionSpec tree for a BGS state pytree: any leaf with a
    ``h_global``-sized second-to-last axis is row-sharded, everything else
    (scalars, keys, downsampled maps) is replicated."""

    def leaf_spec(x):
        shape = jnp.shape(x)
        if len(shape) >= 2 and shape[-2] == h_global:
            return P(*([None] * (len(shape) - 2) + [axis, None]))
        return P()

    return jax.tree_util.tree_map(leaf_spec, state)


def run_video_batch_spatial(
    algo,
    frames: jnp.ndarray,
    mesh: Mesh,
    states=None,
    halo: int = DEFAULT_HALO,
    stream_axis: str = "stream",
    axis: str = "space",
):
    """Stream x space explicit scale-out: [B, T, H, W, C] with B shard_mapped
    over ``stream_axis`` and H row-sharded over ``axis`` with the same
    explicit ``ppermute`` halo exchange as :func:`run_video_spatial` (the
    per-stream body is vmapped inside one 2-D ``shard_map``).

    This is the production combined configuration: every collective is an
    explicitly placed halo exchange / psum / all_gather in a fixed program
    order, identical on every device — nothing is left to the automatic
    partitioner. (The auto-partitioned fallback in ``mesh.run_video_batch``
    additionally deadlocks XLA:CPU's thunk executor on the consensus-v3 step:
    the partitioner emits independent subgroup all-to-alls that race the halo
    permutes in the in-process rendezvous; see tests/test_mesh.py.)

    Masks and state are bit-identical to the unsharded per-stream run
    (equality test in tests/test_mesh.py).
    """
    import inspect

    from tracking_tpu.parallel.mesh import shard_map

    if "ctx" not in inspect.signature(algo.step).parameters:
        raise ValueError(
            f"{type(algo).__name__}.step has no spatial-context support"
        )

    n_space = mesh.shape[axis]
    n_stream = mesh.shape[stream_axis]
    b, t, h = frames.shape[:3]
    w = frames.shape[3]
    c = frames.shape[4] if frames.ndim == 5 else 1
    assert b % n_stream == 0, (b, n_stream)
    if states is None:
        states = jax.vmap(lambda _: algo.init(h, w, c))(jnp.arange(b))
        states = jax.jit(jax.vmap(algo.warm_start))(states, frames[:, 0])

    def leaf_spec(x):
        shape = jnp.shape(x)
        if len(shape) >= 3 and shape[-2] == h:
            return P(stream_axis, *([None] * (len(shape) - 3)), axis, None)
        return P(stream_axis)

    specs = jax.tree_util.tree_map(leaf_spec, states)
    frame_spec = (
        P(stream_axis, None, axis, None, None)
        if frames.ndim == 5
        else P(stream_axis, None, axis, None)
    )
    mask_spec = P(stream_axis, None, axis, None)

    def local_fn(states_loc, frames_loc):
        ctx = SpatialCtx(axis, n_space, h, halo)
        ctx.conv_axes = (stream_axis, axis)

        def one_stream(state, fr_loc):
            if fr_loc.ndim == 4:
                fr = jnp.moveaxis(fr_loc, 3, 1)  # [T, C, h_loc, W]
                fr = ctx.extend_plain(fr)
                fr = jnp.moveaxis(fr, 1, 3)
            else:
                fr = ctx.extend_plain(fr_loc)

            def body(st, frame_ext):
                st, fg, _bg = algo.step(st, frame_ext, ctx=ctx)
                return st, fg

            return jax.lax.scan(body, state, fr)

        return jax.vmap(one_stream)(states_loc, frames_loc)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(specs, frame_spec),
        out_specs=(specs, mask_spec),
        check_rep=False,
    )

    sharded_states = jax.device_put(
        states,
        jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs),
    )
    frames = jax.device_put(frames, NamedSharding(mesh, frame_spec))
    return jax.jit(fn)(sharded_states, frames)


def run_video_spatial_tracked(
    algo,
    tracker,
    frames: jnp.ndarray,
    mesh: Mesh,
    states=None,
    tracker_state=None,
    halo: int = DEFAULT_HALO,
    axis: str = "space",
    pipelined: bool = False,
):
    """ONE stream through the FULL multi-chip pipeline: row-sharded BGS
    step (Pallas consensus on halo slabs) → row-sharded post-processing →
    row-sharded blob extraction (:func:`sharded_extract_blobs`) →
    replicated fixed-K tracking (association kernel + Kalman on the
    psum'd blob table — O(K) work, no [H, W] data). The reference's
    DEFAULT tracker configuration — CCMSPF with mean-shift collision
    resolution (``trackingMain.cpp:633``) — is supported: the collision
    refinement runs as psum-combined window moments over the owned rows
    (``track.meanshift.meanshift_refine_batch_sharded``), bit-exact vs the
    full-frame refinement. This is the configuration PERF.md's multi-chip
    budget costs out; masks, track tables and per-frame track outputs are
    bit-identical to the unsharded ``BGS step → tracker.step`` chain
    (tests/test_mesh.py).

    ``pipelined=True`` software-pipelines the stateful tracking tail one
    frame behind the BGS stage (the PERF.md "tracking pipelined" operating
    point): scan step ``i`` runs BGS(i) and tracking(i−1) as
    data-independent subgraphs, so the scheduler / a dedicated stage chip
    can overlap the replicated association+Kalman tail with the next
    frame's sharded BGS. The per-frame ordering the reference fixes
    (frame t's tracks come from frame t's mask, ``trackingMain.cpp:
    161-166``) is preserved — the SAME tracker.step calls run in the same
    order with identical inputs, one scan step later — so masks, track
    outputs and final state are bit-identical to the lockstep chain; only
    the schedule (and, on real hardware, a one-frame output latency)
    differs.

    Returns (bgs_state, tracker_state, masks [T, H, W], tracks_x
    [T, K, state_dim]).
    """
    import inspect

    from tracking_tpu.parallel.mesh import shard_map

    if "ctx" not in inspect.signature(algo.step).parameters:
        raise ValueError(
            f"{type(algo).__name__}.step has no spatial-context support"
        )
    ttype = tracker.config.trackerType.upper()
    if ttype not in ("CC", "CCMSPF"):
        raise ValueError(
            "the sharded tracked pipeline supports the CC/CCMSPF trackers "
            "(the MS family's color-backprojection windows sum float "
            "histogram weights, which a psum split cannot reproduce "
            "bit-exactly; run those on gathered masks)"
        )

    n = mesh.shape[axis]
    t, h = frames.shape[0], frames.shape[1]
    w = frames.shape[2]
    c = frames.shape[3] if frames.ndim == 4 else 1
    if states is None:
        states = algo.init(h, w, c)
        states = jax.jit(algo.warm_start)(states, jnp.asarray(frames[0]))
    if tracker_state is None:
        tracker_state = tracker.init()

    specs = spatial_specs(states, h, axis)
    t_specs = jax.tree_util.tree_map(lambda _: P(), tracker_state)
    frame_spec = P(None, axis, None, None) if frames.ndim == 4 else P(None, axis, None)
    mask_spec = P(None, axis, None)

    def local_fn(state, tstate, frames_loc):
        ctx = SpatialCtx(axis, n, h, halo)
        if frames_loc.ndim == 4:
            fr = jnp.moveaxis(frames_loc, 3, 1)
            fr = ctx.extend_plain(fr)
            fr = jnp.moveaxis(fr, 1, 3)
        else:
            fr = ctx.extend_plain(frames_loc)

        def body(carry, frame_ext):
            st, ts = carry
            st, fg, _bg = algo.step(st, frame_ext, ctx=ctx)
            blobs = sharded_extract_blobs(
                ctx, fg, max_blobs=tracker.config.maxBlobs
            )
            ts, tracks = tracker.step(ts, fg, blobs=blobs, ctx=ctx)
            return (st, ts), (fg, tracks.x)

        def body_pipelined(carry, frame_ext):
            st, ts, pfg, pblobs, pvalid = carry
            # tracking(t-1): consumes only the carried blob table + mask
            # slab — data-independent of this step's BGS(t) subgraph below,
            # so the two overlap in the schedule. Runs unconditionally on
            # the zero-initialized carry at step 0 (uniform collective
            # count on every shard); the `where` discards that result.
            ts_new, tracks = tracker.step(ts, pfg, blobs=pblobs, ctx=ctx)
            ts = jax.tree_util.tree_map(
                lambda a, b: jnp.where(pvalid, a, b), ts_new, ts
            )
            st, fg, _bg = algo.step(st, frame_ext, ctx=ctx)
            blobs = sharded_extract_blobs(
                ctx, fg, max_blobs=tracker.config.maxBlobs
            )
            return (st, ts, fg, blobs, jnp.bool_(True)), (fg, tracks.x)

        if not pipelined:
            (state, tstate), (masks, xs) = jax.lax.scan(
                body, (state, tstate), fr
            )
            return state, tstate, masks, xs

        h_loc = h // n
        fg0 = jnp.zeros((h_loc, w), jnp.uint8)
        kb = tracker.config.maxBlobs
        zi = jnp.zeros((kb,), jnp.int32)
        zf = jnp.zeros((kb,), jnp.float32)
        from tracking_tpu.ops.cc import Blobs

        blobs0 = Blobs(
            area=zi, cx=zf, cy=zf, x0=zi, y0=zi, x1=zi, y1=zi,
            label=jnp.full((kb,), -1, jnp.int32),
        )
        (state, tstate, lfg, lblobs, _), (masks, xs) = jax.lax.scan(
            body_pipelined,
            (state, tstate, fg0, blobs0, jnp.bool_(False)),
            fr,
        )
        # drain: tracking for the last frame
        tstate, tracks_last = tracker.step(
            tstate, lfg, blobs=lblobs, ctx=ctx
        )
        xs = jnp.concatenate([xs[1:], tracks_last.x[None]], axis=0)
        return state, tstate, masks, xs

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(specs, t_specs, frame_spec),
        out_specs=(specs, t_specs, mask_spec, P()),
        check_rep=False,
    )

    sharded_states = jax.device_put(
        states,
        jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs),
    )
    tracker_state = jax.device_put(
        tracker_state,
        jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), t_specs),
    )
    frames = jax.device_put(frames, NamedSharding(mesh, frame_spec))
    return jax.jit(fn)(sharded_states, tracker_state, frames)


def run_video_spatial(
    algo,
    frames: jnp.ndarray,
    mesh: Mesh,
    states=None,
    halo: int = DEFAULT_HALO,
    axis: str = "space",
):
    """Run ONE stream spatially sharded over the mesh's ``axis``.

    frames: [T, H, W, C] (or [T, H, W]) u8, H divisible by the axis size.
    Returns (final_state, masks [T, H, W]) with masks bit-identical to the
    unsharded ``run_video`` (the equality test lives in tests/test_mesh.py).

    Only algorithms whose ``step`` accepts a ``ctx`` argument are supported
    (SuBSENSE / LOBSTER — the flagship family this scale-out exists for).
    """
    import inspect

    from tracking_tpu.parallel.mesh import shard_map

    if "ctx" not in inspect.signature(algo.step).parameters:
        raise ValueError(
            f"{type(algo).__name__}.step has no spatial-context support; "
            "spatial sharding is implemented for the LBSP family (SuBSENSE/"
            "LOBSTER). Use run_video_batch (XLA auto-partitioning) instead."
        )

    n = mesh.shape[axis]
    t, h = frames.shape[0], frames.shape[1]
    w = frames.shape[2]
    c = frames.shape[3] if frames.ndim == 4 else 1
    if states is None:
        # init + warm-start unsharded (once per stream), then shard the state
        states = algo.init(h, w, c)
        states = jax.jit(algo.warm_start)(states, jnp.asarray(frames[0]))

    specs = spatial_specs(states, h, axis)
    frame_spec = P(None, axis, None, None) if frames.ndim == 4 else P(None, axis, None)
    mask_spec = P(None, axis, None)

    def local_fn(state, frames_loc):
        ctx = SpatialCtx(axis, n, h, halo)
        # halo-extend the whole chunk's frames once ([T, h_loc, W, C] with
        # rows at axis 1 → move rows last-but-one for extend, then back)
        if frames_loc.ndim == 4:
            fr = jnp.moveaxis(frames_loc, 3, 1)  # [T, C, h_loc, W]
            fr = ctx.extend_plain(fr)
            fr = jnp.moveaxis(fr, 1, 3)
        else:
            fr = ctx.extend_plain(frames_loc)

        def body(st, frame_ext):
            st, fg, _bg = algo.step(st, frame_ext, ctx=ctx)
            return st, fg

        return jax.lax.scan(body, state, fr)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(specs, frame_spec),
        out_specs=(specs, mask_spec),
        check_rep=False,
    )

    sharded_states = jax.device_put(
        states,
        jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs),
    )
    frames = jax.device_put(frames, NamedSharding(mesh, frame_spec))
    return jax.jit(fn)(sharded_states, frames)
