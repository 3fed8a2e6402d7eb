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
- Global operations — flood-fill hole filling (border-connected
  propagation is unbounded) and the frame-level reductions — run on
  ``all_gather``-ed full masks, replicated per chip. A 720p u8 mask is
  ~0.9 MB over ICI; post-processing is ~15% of the step, so the scaling
  loss is Amdahl-bounded and the masks stay bit-identical to the
  unsharded chain (same code on the same full array).
- RNG fields are drawn at *global* shape from the replicated key and
  row-sliced, so every pixel sees the same draw as the unsharded run —
  this is what makes the sharded masks equal bit-for-bit, not just
  statistically.

The consensus compute inside the shard runs the XLA formulation (the
Pallas fast path currently assumes chip-local global borders and aliased
full-size bank buffers; an ext-bank variant — banks carried at slab+halo
size with never-read halo rows — is the planned follow-up).
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
