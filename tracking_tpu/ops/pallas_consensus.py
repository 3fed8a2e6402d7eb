"""Pallas TPU kernel: fused SuBSENSE/LOBSTER sample-consensus with deferred
bank writes.

The consensus is the hot inner loop of the LBSP family
(``pl/BackgroundSubtractorSuBSENSE.cpp:332-358``): for every pixel, walk the
N=50 background samples computing an L1 color distance plus an LBSP
descriptor distance (intra XOR-popcount + a 16-neighbor inter-frame
descriptor built against the *sample's* color and threshold), and count
"good" samples until 2 are found, tracking the minimal distances.

The XLA formulation (lax.scan over the bank axis) round-trips its [H, W]
carries and bank slices through HBM on every sample. This kernel instead
tiles the image plane over a grid and holds a tile's entire [N, bh, bw]
color/desc banks in VMEM, fusing the whole N-sample walk into one pass.

**Deferred bank writes**: the reference's per-frame order is consensus(t) →
stochastic bank writes(t) → feedback(t); the writes touch ≤ 2 of N slots per
pixel but a separate write pass must stream every bank byte through HBM
again (read+write — ~1.7 ms at 720p color on top of the consensus read).
Instead, frame t's writes are carried as a *pending log* — one packed
control word per pixel (self/spread slot+offset draws, see
:func:`pack_pending_ctrl`) plus the frame's packed color|desc values — and
applied by THIS kernel at frame t+1, to the VMEM-resident tile, before the
walk. The banks are donated inputs aliased to outputs, so bank bytes cross
HBM exactly once per frame (one read + one write) for consensus AND updates
combined. Masks are bit-identical to the eager order: the mask at t depends
on banks updated through t−1 either way. The per-pixel background image
(mean over the bank) falls out of the apply loop for free as a ``bg_sum``
output, removing the separate full-bank mean pass.

The 16-neighbor LBSP stack is built IN-KERNEL from the raw u8 planes: each
plane is edge-padded by one block and passed as 9 shifted-block views
(index maps (i+di, j+dj)); the 5×5-patch neighbor views are then
``pltpu.roll`` + iota-mask compositions of the center/edge/corner blocks in
VMEM. This replaces the materialized [16, H, W] i32 stacks (177 MB of HBM
write+read per 720p color frame, ~1.4 ms) with ~25 MB of overlapping u8
block reads. The intra-frame descriptors fall out for free and are kernel
outputs (the feedback stage, bank updates and carried state consume them).

Layouts: the [N, H, W] banks stay u8/u16 end-to-end (widening 414 MB of
banks to i32 outside the kernel cost more than the kernel itself); they are
cast per-tile inside VMEM. Small [H, W] planes are i32. Tiles are
(bh=16, bw=256).

Per-channel inputs (C ≤ 3 static unroll): the early-exit "count < required"
gating matches the reference's semantics exactly (later samples never update
the mins once satisfied). Outputs: good-sample count, min total desc dist,
min total sum dist, intra descriptors ×C.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

from tracking_tpu.ops import lbsp
from tracking_tpu.ops.pallas_fill import _roll

# Profiling knob (tools/profile_stages.py): "1" replaces the pending-apply
# stage with a bank copy + bg accumulation (isolates the fire/pick + select
# cost); "2" additionally skips the bg accumulation (pure copy floor).
# Masks are wrong under either — never set outside profiling. Measured
# (720p color, settling window): required=0 floor 2.75 ms BGS-step under
# all three variants — the apply-stage compute is free next to the bank
# DMA + slot copy loop.
_NULL_APPLY = int(os.environ.get("TRACKING_TPU_NULL_APPLY", "0"))

# Tile shape. Negative results (measured, don't retry):
#   - sliced walk (independent early-exit per 8-sublane slice of the tile):
#     6.01 vs 5.84 ms BGS step — blobs span the full 16-row tile height, so
#     row slices never separate foreground stragglers from background lanes
#     and the slice machinery is pure overhead.
#   - tiles (32,128), same 4-vreg op width but finer horizontal early-exit
#     granularity: 7.74 vs 5.84 ms — short 128-lane rows cost more in DMA /
#     roll efficiency than the finer exit granularity buys.
#   - resolving the spread fire/pick OUTSIDE the kernel in XLA (ship a
#     packed per-pixel write plan + C resolved value maps instead of the
#     9 halo'd i32 block views per channel): 6.44 vs 5.84 ms — the 24
#     shifted-view select chains fuse poorly as an XLA prologue, costing
#     more than the ~97 MB/frame of block-view DMA they remove (in-kernel
#     the same picks ride the shared _ViewCache for ~free).
#   - a pure bank-copy kernel on a tile-major contiguous [nH, nW, N, BH, BW]
#     bank layout measured 1.06 vs 1.20 ms/frame for the [N, H, W] strided
#     blocks — the strided-DMA penalty is only ~0.13 ms/frame, not worth a
#     state-layout fork between backends.
# Positive result: vmem_limit_bytes=100MB (Mosaic's 16 MB default budget
# blocked double-buffering of the ~4.2 MB/tile working set; the physical
# v5e VMEM is larger): BGS step 5.72 → 5.51 ms. (16,512) tiles — which the
# raised budget un-blocks from their old compile failure — measure 10.2 ms:
# the coarser early-exit granularity costs far more than the better DMA
# chunking buys.
BH = int(os.environ.get("TRACKING_TPU_CONS_BH", "16"))
BW = int(os.environ.get("TRACKING_TPU_CONS_BW", "256"))


def _popcount16(v):
    v = v - ((v >> 1) & 0x5555)
    v = (v & 0x3333) + ((v >> 2) & 0x3333)
    v = (v + (v >> 4)) & 0x0F0F
    return (v + (v >> 8)) & 0x1F


def _popcount32(v):
    """One SWAR popcount over a 32-bit word = two 16-bit popcounts for the
    price of one (the final byte-sum multiply cannot carry: nibble-pair sums
    are ≤ 8 per byte, total ≤ 32)."""
    v = v - ((v >> 1) & 0x55555555)
    v = (v & 0x33333333) + ((v >> 2) & 0x33333333)
    v = (v + (v >> 4)) & 0x0F0F0F0F
    return (v * 0x01010101) >> 24


def _pack16(bits):
    """[16, bh, bw] bool → i32 packed (binary-tree combine: 15 shift|or pairs
    instead of the 16-step serial accumulate — half the vector ops and a
    shorter dependency chain)."""
    vs = [bits[k].astype(jnp.int32) for k in range(16)]
    sh = 1
    while len(vs) > 1:
        vs = [vs[i] | (vs[i + 1] << sh) for i in range(0, len(vs), 2)]
        sh *= 2
    return vs[0]


def _thr_closed_form(v, delta, rel, div, hi_const):
    base = jnp.clip(jnp.rint(v.astype(jnp.float32) * rel / div), 0.0, 255.0)
    lo = jnp.ceil(v.astype(jnp.float32) * rel / 4.0)
    return jnp.clip(
        base + delta, jnp.minimum(base, lo), jnp.maximum(base, hi_const)
    ).astype(jnp.int32)


class _ViewCache:
    """Memoized shifted-tile views V(y, x) = P(y+sy, x+sx) over a 9-block
    neighborhood, |sy|,|sx| ≤ 2.

    The naive per-view construction (roll center + re-roll the vertical
    neighbor for the row fix-up + the same again per horizontal column)
    costs ~12-18 vector ops PER VIEW and was recomputed from scratch for
    each of the 16 LBSP offsets × C channels plus the 24 spread offsets ×
    (1+C) channels. Factoring the vertical resolve — R[(sy, dj)] = block
    column dj shifted by sy with wrapped rows patched from the (di=∓1, dj)
    blocks — lets all views of one (channel, sy) share it: each view is
    then one horizontal roll + ≤2 edge patches (~3-5 ops), and identical
    (sy, sx) requests (the fire test and the value pick both read channel
    0's views) are returned from cache outright. Pure vector ops, no HBM
    traffic, no unaligned lane slicing (which trips Mosaic layout bugs; see
    pallas_fill)."""

    def __init__(self, get_blk, interp):
        self.get_blk = get_blk
        self.interp = interp
        self._vcache = {}
        self._cache = {}
        self._i0 = jax.lax.broadcasted_iota(jnp.int32, (BH, BW), 0)
        self._i1 = jax.lax.broadcasted_iota(jnp.int32, (BH, BW), 1)

    def _vres(self, sy, dj):
        key = (sy, dj)
        if key in self._vcache:
            return self._vcache[key]
        if sy == 0:
            v = self.get_blk(0, dj)
        else:
            c_ = _roll(self.get_blk(0, dj), -sy, 0, self.interp)
            if sy < 0:
                v = jnp.where(
                    self._i0 < -sy,
                    _roll(self.get_blk(-1, dj), -sy, 0, self.interp), c_,
                )
            else:
                v = jnp.where(
                    self._i0 >= BH - sy,
                    _roll(self.get_blk(1, dj), -sy, 0, self.interp), c_,
                )
        self._vcache[key] = v
        return v

    def view(self, sy, sx):
        """V(y, x) = P(y+sy, x+sx)."""
        key = (sy, sx)
        if key in self._cache:
            return self._cache[key]
        base = self._vres(sy, 0)
        v = _roll(base, -sx, 1, self.interp) if sx else base
        if sx < 0:
            v = jnp.where(
                self._i1 < -sx, _roll(self._vres(sy, -1), -sx, 1, self.interp), v
            )
        elif sx > 0:
            v = jnp.where(
                self._i1 >= BW - sx, _roll(self._vres(sy, 1), -sx, 1, self.interp), v
            )
        self._cache[key] = v
        return v


def _nb_views(get_blk, interp):
    """16 LBSP neighbor views of the center tile, V_k(y, x) = P(y+dy_k, x+dx_k)."""
    vc = _ViewCache(get_blk, interp)
    return [vc.view(dy, dx) for dx, dy in lbsp.OFFSETS]


def _pad_plane_blocks(p, Hp, Wp):
    """u8 [H, W] → [Hp+2BH, Wp+2BW] edge-padded (alignment padding is also
    edge-mode so neighbor views clamp exactly like ops.lbsp.neighbor_stack
    even when H/W are not block multiples)."""
    H, W = p.shape
    return jnp.pad(p, ((BH, Hp - H + BH), (BW, Wp - W + BW)), mode="edge")


def _ext_plane_blocks(p_ext, E, Hp, Wp):
    """Row-sharded twin of :func:`_pad_plane_blocks`: ``p_ext`` is a
    [h_loc+2E, W] halo-extended slab whose halo rows already carry the
    correct (clamped-)global contents (parallel/spatial.SpatialCtx), so the
    row padding becomes a slice (E ≥ BH + row-alignment pad required);
    columns are edge-padded exactly as in the unsharded path (W is never
    sharded)."""
    W = p_ext.shape[1]
    rows = p_ext[E - BH : E - BH + Hp + 2 * BH]
    return jnp.pad(rows, ((0, 0), (BW, Wp - W + BW)), mode="edge")


def _interior_rep_cols(a, border: int = 2):
    """Column-only :func:`interior_rep` (row clamping is already baked into
    halo-extended slab contents by ``SpatialCtx.extend_border``)."""
    return jnp.pad(
        a[:, border:-border], ((0, 0), (border, border)), mode="edge"
    )


def _plane_block_specs():
    """9 shifted-block views of an edge-padded plane (center = (i+1, j+1))."""
    specs = []
    for di in range(3):
        for dj in range(3):
            specs.append(
                pl.BlockSpec(
                    (BH, BW),
                    partial(lambda di, dj, i, j: (i + di, j + dj), di, dj),
                    memory_space=pltpu.VMEM,
                )
            )
    return specs


# ---------------------------------------------------------------------------
# Pending-write machinery (deferred stochastic bank updates)
# ---------------------------------------------------------------------------

# 5×5 neighbor offsets, (x, y), reference traversal order (RandUtils.h:62-81)
NB5 = tuple(
    (x, y)
    for y in (2, 1, 0, -1, -2)
    for x in (-2, -1, 0, 1, 2)
    if not (x == 0 and y == 0)
)
# 3×3 offsets (RandUtils.h:52-59) as indices into NB5
_NB3 = ((-1, 1), (0, 1), (1, 1), (-1, 0), (1, 0), (-1, -1), (0, -1), (1, -1))
NB3_IN_NB5 = tuple(NB5.index(o) for o in _NB3)


def nb3_to_nb5_idx(o3: jnp.ndarray) -> jnp.ndarray:
    """Map a 3×3 offset draw (0..7) to its unified 5×5 index — an 8-way
    select chain (a table gather over [H, W] indices costs ~25 ms)."""
    out = jnp.zeros_like(o3)
    for k, u in enumerate(NB3_IN_NB5):
        out = jnp.where(o3 == k, u, out)
    return out


def pack_pending_ctrl(upd1, slot1, u3, u5, slot3, slot5):
    """Pack the per-pixel write draws into one i32 word:
    bit 0 upd1 (self/cooldown write), bits 1-6 slot1, bits 7-11 u3 (unified
    5×5 index of the 3×3 spread draw, via :func:`nb3_to_nb5_idx`), bits
    12-16 u5, bits 17-22 slot3, bits 23-28 slot5. Slots fit N ≤ 63."""
    return (
        upd1.astype(jnp.int32)
        | (slot1.astype(jnp.int32) << 1)
        | (u3.astype(jnp.int32) << 7)
        | (u5.astype(jnp.int32) << 12)
        | (slot3.astype(jnp.int32) << 17)
        | (slot5.astype(jnp.int32) << 23)
    )


def pack_pending_vals(planes, intras, fires):
    """Per-channel packed source words ``plane | intra << 8``; the spread
    fire bits ride channel 0's bits 24-25 (bit 24 = 3×3 fired, 25 = 5×5)."""
    vals = [
        planes[c].astype(jnp.int32) | (intras[c].astype(jnp.int32) << 8)
        for c in range(len(planes))
    ]
    vals[0] = vals[0] | (fires.astype(jnp.int32) << 24)
    return tuple(vals)


def unpack_pending_ctrl(w):
    return (
        (w & 1) != 0,        # upd1
        (w >> 1) & 63,       # slot1
        (w >> 7) & 31,       # u3 (NB5 index)
        (w >> 12) & 31,      # u5
        (w >> 17) & 63,      # slot3
        (w >> 23) & 63,      # slot5
    )


def interior_rep(a, border: int = 2):
    """Replicate the ROI-interior edge outward: shifted views of the result
    reproduce the reference's clamp of spread positions into the 2-px ROI
    interior (``_shift_clamped`` parity)."""
    return jnp.pad(a[border:-border, border:-border], border, mode="edge")


def _apply_pending_stage(
    C, N, ctrl, own_vals, pend_blk, col_in, desc_in, col_out, desc_out, interp
):
    """Kernel stage: resolve the spread picks from halo'd packed-value views,
    apply the ≤ 2 slot writes per pixel to the output bank refs (all N slots
    pass through VMEM selects), and accumulate the per-channel color sum of
    the POST-apply bank (the background image, ``getBackgroundImage``).

    ctrl: unpacked i32 tile of control words. own_vals: C in-refs of the
    un-replicated packed values (the destination pixel's own frame-t
    color|desc). pend_blk(c, di, dj): i32 block view of the interior-
    replicated packed values. Write precedence matches the sequential
    reference: the neighbor spread (second loop) wins over the self write
    on a same-slot collision. Returns the C bg sums ([BH, BW] i32).

    Negative result (measured, don't retry): tile-level lax.cond skips of
    the fire/pick/write stages benched 123.6 vs 125.9 fps — at 4096 px per
    tile, P(no stochastic write anywhere in a tile) ≈ (1−1/T)^8192 ≈ 0, so
    the skips never fire and the probes are pure overhead. Per-pixel
    sparsity does NOT translate to tile sparsity at this tile size. The
    win here is the shared :class:`_ViewCache` instead."""
    if _NULL_APPLY:

        def copy_body(j, bg):
            out = []
            for c in range(C):
                cur = col_in[c][j]
                col_out[c][j] = cur
                desc_out[c][j] = desc_in[c][j]
                out.append(
                    bg[c] + (cur.astype(jnp.int32) if _NULL_APPLY < 2 else 0)
                )
            return tuple(out)

        return jax.lax.fori_loop(
            0, N, copy_body,
            tuple(jnp.zeros((BH, BW), jnp.int32) for _ in range(C)),
        )

    upd1, slot1, u3, u5, slot3, slot5 = unpack_pending_ctrl(ctrl)
    vcs = [_ViewCache(partial(pend_blk, c), interp) for c in range(C)]

    # -- spread pick: fire tests, then one unified value pick ---------------
    # _view semantics V(y,x) = P(y−dy, x−dx)  →  cache key (sy, sx) = (−dy, −dx)
    f = jnp.bool_(False)
    ok3 = jnp.full((BH, BW), f)
    ok5 = jnp.full((BH, BW), f)
    for k, (dx, dy) in enumerate(NB5):
        fv = vcs[0].view(-dy, -dx) >> 24
        if k in NB3_IN_NB5:
            ok3 = ok3 | ((u3 == k) & ((fv & 1) != 0))
        ok5 = ok5 | ((u5 == k) & ((fv & 2) != 0))
    okn = ok3 | ok5
    u = jnp.where(ok3, u3, u5)
    slotn = jnp.where(ok3, slot3, slot5)

    nbv = [jnp.zeros((BH, BW), jnp.int32) for _ in range(C)]
    for k, (dx, dy) in enumerate(NB5):
        sel = u == k
        for c in range(C):
            nbv[c] = jnp.where(sel, vcs[c].view(-dy, -dx), nbv[c])
    nb_col = [(v & 0xFF).astype(col_in[0].dtype) for v in nbv]
    nb_desc = [((v >> 8) & 0xFFFF).astype(desc_in[0].dtype) for v in nbv]

    own = [own_vals[c][...] for c in range(C)]
    own_col = [(v & 0xFF).astype(col_in[0].dtype) for v in own]
    own_desc = [((v >> 8) & 0xFFFF).astype(desc_in[0].dtype) for v in own]

    # -- in-place slot writes + bg accumulation -----------------------------
    def body(j, bg):
        w1 = upd1 & (slot1 == j)
        w2 = okn & (slotn == j)
        out = []
        for c in range(C):
            cur = col_in[c][j]
            newc = jnp.where(w2, nb_col[c], jnp.where(w1, own_col[c], cur))
            col_out[c][j] = newc
            desc_out[c][j] = jnp.where(
                w2, nb_desc[c], jnp.where(w1, own_desc[c], desc_in[c][j])
            )
            out.append(bg[c] + newc.astype(jnp.int32))
        return tuple(out)

    return jax.lax.fori_loop(
        0, N, body, tuple(jnp.zeros((BH, BW), jnp.int32) for _ in range(C))
    )


def _consensus_core(
    C, N, rel, div, hi_const, gray_mode, min_cd, desc_off, interp,
    get_blk, delta_ref, r_ref, unst_ref, req_ref,
    colors, descs, count_ref, mind_ref, mins_ref, intra_refs,
):
    """Shared tile body: per-tile thresholds from R/unstable, in-kernel
    neighbor views + intra LBSP descriptors, and the early-exiting sample
    walk. ``colors``/``descs`` may be input refs (read-only kernel) or the
    post-pending-apply output refs (fused v1 kernel) — the walk only reads."""
    count, mind, mins, _px, intra = _consensus_values(
        C, N, rel, div, hi_const, gray_mode, min_cd, desc_off, interp,
        get_blk, delta_ref[0, 0], r_ref[...], unst_ref[...], req_ref[...],
        colors, descs,
    )
    for c in range(C):
        intra_refs[c][...] = intra[c]
    count_ref[...] = count
    mind_ref[...] = mind
    mins_ref[...] = mins


def _consensus_values(
    C, N, rel, div, hi_const, gray_mode, min_cd, desc_off, interp,
    get_blk, delta_s, R, unstable, required, colors, descs,
):
    """Value-returning twin of :func:`_consensus_core`: returns
    (count, mind, mins, px ×C, intra ×C) as tile values so fused kernels can
    keep consuming them in-VMEM (the feedback epilogue)."""
    delta = delta_s.astype(jnp.float32)

    stab_off = float(min_cd // 5)
    ct_f = R * float(min_cd) - (1 - unstable).astype(jnp.float32) * stab_off
    color_thr = ct_f.astype(jnp.int32)
    if gray_mode:
        color_thr = color_thr // 2
    n_exp = jnp.floor(R + 0.5).astype(jnp.int32)
    pow2 = pltpu.bitcast((n_exp + 127) << 23, jnp.float32).astype(jnp.int32)
    desc_thr = pow2 + desc_off + unstable * desc_off

    # center planes + in-kernel neighbor views + intra descriptors
    px, nb, intra = [], [], []
    for c in range(C):
        p = get_blk(c, 0, 0)
        views = _nb_views(partial(get_blk, c), interp)
        thr_px = _thr_closed_form(p, delta, rel, div, hi_const)
        ibits = [(jnp.abs(views[k] - p) > thr_px) for k in range(16)]
        d = _pack16(jnp.stack(ibits))
        px.append(p)
        nb.append(views)
        intra.append(d)

    if C == 3:
        tot_color_thr = color_thr * 3
        tot_desc_thr = desc_thr * 3
        sc_color_thr = tot_color_thr // 2

    count = jnp.zeros((BH, BW), jnp.int32)
    mind = jnp.full((BH, BW), 16 * C, jnp.int32)
    mins = jnp.full((BH, BW), 255 * C, jnp.int32)

    # NOTE (negative result, measured): a per-sample "lazy descriptor"
    # color gate (skip the 16-neighbor LBSP stage via lax.cond when no
    # unsatisfied lane passes the color precondition) benched 112.9 vs
    # 114.7 fps without it — the scalar any()-reduce + cond bubble costs
    # more than the skipped work on real content, where the tile-level
    # early exit already absorbs background tiles. Keep the body flat.
    def body(j, carry):
        count, mind, mins = carry
        s_cols, cd = [], []
        for c in range(C):
            s_col = colors[c][j].astype(jnp.int32)
            s_cols.append(s_col)
            cd.append(jnp.abs(px[c] - s_col))
        dd = []
        for c in range(C):
            s_col = s_cols[c]
            s_desc = descs[c][j].astype(jnp.int32) & 0xFFFF
            sthr = _thr_closed_form(s_col, delta, rel, div, hi_const)
            bits = [
                (jnp.abs(nb[c][k] - s_col) > sthr) for k in range(16)
            ]
            inter = _pack16(jnp.stack(bits))
            # (popcount(intra⊕s) + popcount(inter⊕s)) // 2 as ONE 32-bit
            # popcount of the concatenated halves — exact
            w = (intra[c] ^ s_desc) | ((inter ^ s_desc) << 16)
            dd.append(_popcount32(w) // 2)
        if C == 1:
            sum_d = jnp.minimum((dd[0] // 4) * (255 // 16) + cd[0], 255)
            good = (
                (cd[0] <= color_thr)
                & (dd[0] <= desc_thr)
                & (sum_d <= color_thr)
            )
            tot_desc, tot_sum = dd[0], sum_d
        else:
            sum_c = [
                jnp.minimum((dd[c] // 2) * (255 // 16) + cd[c], 255)
                for c in range(C)
            ]
            sc_ok = (cd[0] <= sc_color_thr) & (sum_c[0] <= sc_color_thr)
            for c in range(1, C):
                sc_ok &= (cd[c] <= sc_color_thr) & (sum_c[c] <= sc_color_thr)
            tot_desc = dd[0] + (dd[1] + dd[2] if C == 3 else 0)
            tot_sum = sum_c[0] + (sum_c[1] + sum_c[2] if C == 3 else 0)
            good = (
                sc_ok
                & (tot_desc <= tot_desc_thr)
                & (tot_sum <= tot_color_thr)
            )
        live = good & (count < required)
        mind = jnp.where(live, jnp.minimum(mind, tot_desc), mind)
        mins = jnp.where(live, jnp.minimum(mins, tot_sum), mins)
        return count + live.astype(jnp.int32), mind, mins

    # tile-level early exit: the reference stops per pixel after
    # `required` good samples; in SIMD we stop when the WHOLE tile is
    # satisfied (typical background tiles exit after a handful of the N
    # samples). Exact: skipped samples could only have updated dead lanes.
    def w_cond(carry):
        j, count, _, _ = carry
        return (j < N) & jnp.any(count < required)

    def w_body(carry):
        j, count, mind, mins = carry
        count, mind, mins = body(j, (count, mind, mins))
        return j + 1, count, mind, mins

    _, count, mind, mins = jax.lax.while_loop(
        w_cond, w_body, (jnp.int32(0), count, mind, mins)
    )
    return count, mind, mins, px, intra



def _make_kernel(C, N, rel, div, hi_const, gray_mode, min_cd, desc_off, interp):
    """Fused v1 kernel body closure. Refs order:
    [plane blocks×9×C, own_vals×C, ctrl, pend blocks×9×C,
     colors×C, descs×C, delta, R, unstable, req]
    outputs [count, min_desc, min_sum, intra×C, bg_sum×C,
             colors×C, descs×C (aliased to the input banks)].

    The R(x)-dependent thresholds are computed per-tile from R and the old
    unstable mask (``BackgroundSubtractorSuBSENSE.cpp:327-328``) instead of
    arriving as precomputed maps — saves two full-map materializations per
    frame. The vector ``1 << floor(R+0.5)`` uses the f32-exponent bit trick
    (Mosaic has no vector shift-by-vector)."""

    def kernel(*refs):
        def get_blk(c, di, dj):
            return refs[9 * c + (di + 1) * 3 + (dj + 1)][...].astype(jnp.int32)

        pb0 = 9 * C
        own_vals = refs[pb0 : pb0 + C]
        ctrl_ref = refs[pb0 + C]

        def pend_blk(c, di, dj):
            return refs[pb0 + C + 1 + 9 * c + (di + 1) * 3 + (dj + 1)][...]

        base = pb0 + C + 1 + 9 * C
        col_in = refs[base : base + C]
        desc_in = refs[base + C : base + 2 * C]
        delta_ref = refs[base + 2 * C]
        r_ref = refs[base + 2 * C + 1]
        unst_ref = refs[base + 2 * C + 2]
        req_ref = refs[base + 2 * C + 3]
        outs = refs[base + 2 * C + 4 :]
        count_ref, mind_ref, mins_ref = outs[:3]
        intra_refs = outs[3 : 3 + C]
        bg_refs = outs[3 + C : 3 + 2 * C]
        colors = outs[3 + 2 * C : 3 + 3 * C]
        descs = outs[3 + 3 * C : 3 + 4 * C]

        # -- apply frame-(t−1)'s pending writes to the VMEM tiles ------------
        bg = _apply_pending_stage(
            C, N, ctrl_ref[...], own_vals, pend_blk,
            col_in, desc_in, colors, descs, interp,
        )
        for c in range(C):
            bg_refs[c][...] = bg[c]

        _consensus_core(
            C, N, rel, div, hi_const, gray_mode, min_cd, desc_off, interp,
            get_blk, delta_ref, r_ref, unst_ref, req_ref,
            colors, descs, count_ref, mind_ref, mins_ref, intra_refs,
        )

    return kernel


def _make_read_kernel(C, N, rel, div, hi_const, gray_mode, min_cd, desc_off, interp):
    """Read-only variant (consensus v3): banks arrive as plain VMEM *inputs*
    (full-bank blocks, auto-pipelined by Mosaic across grid steps — no manual
    DMA, unlike the atticized grouped-DMA v2 kernel, attic/pallas_consensus2.py) and are never written back; the ≤3
    stochastic slot writes happen eagerly in XLA via frame-global slot draws
    (bgs/lbsp_family._apply_updates_global). Refs order:
    [plane blocks×9×C, colors×C, descs×C, delta, R, unstable, req]
    outputs [count, min_desc, min_sum, intra×C]."""

    def kernel(*refs):
        def get_blk(c, di, dj):
            return refs[9 * c + (di + 1) * 3 + (dj + 1)][...].astype(jnp.int32)

        base = 9 * C
        colors = refs[base : base + C]
        descs = refs[base + C : base + 2 * C]
        delta_ref = refs[base + 2 * C]
        r_ref = refs[base + 2 * C + 1]
        unst_ref = refs[base + 2 * C + 2]
        req_ref = refs[base + 2 * C + 3]
        outs = refs[base + 2 * C + 4 :]
        count_ref, mind_ref, mins_ref = outs[:3]
        intra_refs = outs[3 : 3 + C]

        _consensus_core(
            C, N, rel, div, hi_const, gray_mode, min_cd, desc_off, interp,
            get_blk, delta_ref, r_ref, unst_ref, req_ref,
            colors, descs, count_ref, mind_ref, mins_ref, intra_refs,
        )

    return kernel



@partial(
    jax.jit,
    static_argnames=(
        "rel", "div", "hi_const", "min_cd", "desc_off", "interpret", "row_ext"
    ),
)
def consensus_pallas(
    planes,
    colors,
    descs,
    pend_ctrl,
    pend_vals,
    lut_delta,
    R,
    unstable,
    required,
    rel: float,
    div: float,
    hi_const: float,
    min_cd: int,
    desc_off: int,
    interpret: bool = False,
    row_ext: int = 0,
):
    """Fused consensus + deferred bank update. All tensor args are C-tuples:
    planes [H, W] u8, colors/descs [N, H, W] u8/u16 (donated; aliased to the
    returned banks); pend_ctrl [H, W] i32 (:func:`pack_pending_ctrl`);
    pend_vals C-tuple [H, W] i32 (:func:`pack_pending_vals`); R [H, W] f32;
    unstable [H, W] bool/int; lut_delta scalar i32; required is a scalar or
    [H, W] i32 map (the subsenseShrink per-pixel offset); min_cd/desc_off
    the config threshold constants (thresholds are derived in-kernel).
    Returns (count, min_desc, min_sum, intra, bg_sum, colors, descs):
    i32 [H, W] maps (intra = C-tuple of 16-bit intra-frame LBSP descriptors,
    bg_sum = C-tuple of post-apply bank color sums) and the updated banks.

    ``row_ext`` (spatial sharding, parallel/spatial.py): planes and
    pend_vals arrive as [h_loc+2·row_ext, W] halo-extended slabs whose halo
    rows carry clamped-global / border-clamped contents respectively
    (``SpatialCtx.extend_plain`` / ``extend_border``); every other tensor is
    owned-rows-only, and the kernel's row padding becomes a slice into the
    halo (``row_ext ≥ BH + (-h_loc) % BH``). Banks stay owned-size — the
    walk and the slot writes are per-pixel; only the frame/pending-value
    stencils reach across rows."""
    C = len(planes)
    N = colors[0].shape[0]
    if row_ext:
        H, W = planes[0].shape[0] - 2 * row_ext, planes[0].shape[1]
    else:
        H, W = planes[0].shape
    ph, pw = (-H) % BH, (-W) % BW
    assert not row_ext or row_ext >= BH + ph, (row_ext, BH, ph)

    def pad2(a):
        return jnp.pad(a.astype(jnp.int32), ((0, ph), (0, pw)))

    def pad3(a):
        return jnp.pad(a, ((0, 0), (0, ph), (0, pw)))

    Hp, Wp = H + ph, W + pw
    # one input entry per block view (same device buffer 9×, no copies)
    if row_ext:
        E = row_ext
        plane_views = tuple(
            pb for p in planes for pb in (_ext_plane_blocks(p, E, Hp, Wp),) * 9
        )
        pend_views = tuple(
            pb
            for v in pend_vals
            for pb in (_ext_plane_blocks(_interior_rep_cols(v), E, Hp, Wp),) * 9
        )
        own_pend = tuple(v[E : E + H] for v in pend_vals)
    else:
        plane_views = tuple(
            pb for p in planes for pb in (_pad_plane_blocks(p, Hp, Wp),) * 9
        )
        pend_views = tuple(
            pb
            for v in pend_vals
            for pb in (_pad_plane_blocks(interior_rep(v), Hp, Wp),) * 9
        )
        own_pend = pend_vals
    args = (
        plane_views
        + tuple(pad2(v) for v in own_pend)
        + (pad2(pend_ctrl),)
        + pend_views
        + tuple(pad3(c) for c in colors)  # u8, native
        + tuple(pad3(d) for d in descs)  # u16, native (aliasing needs dtype match)
        + (lut_delta.astype(jnp.int32).reshape(1, 1),)
        + (jnp.pad(R.astype(jnp.float32), ((0, ph), (0, pw))), pad2(unstable))
        + (pad2(jnp.broadcast_to(jnp.asarray(required, jnp.int32), (H, W))),)
    )

    grid = (Hp // BH, Wp // BW)
    spec2 = pl.BlockSpec((BH, BW), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    spec_bank = pl.BlockSpec(
        (N, BH, BW), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
    )
    spec_scalar = pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)

    in_specs = (
        _plane_block_specs() * C
        + [spec2] * (C + 1)
        + _plane_block_specs() * C
        + [spec_bank] * (2 * C)
        + [spec_scalar, spec2, spec2, spec2]
    )
    n_bank_in = 9 * C + C + 1 + 9 * C  # index of the first bank input
    n_map_out = 3 + 2 * C
    out_shape = (
        [jax.ShapeDtypeStruct((Hp, Wp), jnp.int32)] * n_map_out
        + [jax.ShapeDtypeStruct((N, Hp, Wp), colors[0].dtype)] * C
        + [jax.ShapeDtypeStruct((N, Hp, Wp), descs[0].dtype)] * C
    )
    out_specs = [spec2] * n_map_out + [spec_bank] * (2 * C)
    aliases = {n_bank_in + k: n_map_out + k for k in range(2 * C)}

    kernel = _make_kernel(
        C, N, rel, div, hi_const, C == 1, min_cd, desc_off, interpret
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases=aliases,
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)
    count, mind, mins = (o[:H, :W] for o in outs[:3])
    intra = tuple(o[:H, :W] for o in outs[3 : 3 + C])
    bg_sum = tuple(o[:H, :W] for o in outs[3 + C : n_map_out])
    new_colors = tuple(o[:, :H, :W] for o in outs[n_map_out : n_map_out + C])
    new_descs = tuple(o[:, :H, :W] for o in outs[n_map_out + C :])
    return count, mind, mins, intra, bg_sum, new_colors, new_descs


@partial(
    jax.jit,
    static_argnames=("rel", "div", "hi_const", "min_cd", "desc_off", "interpret"),
)
def consensus_read_pallas(
    planes,
    colors,
    descs,
    lut_delta,
    R,
    unstable,
    required,
    rel: float,
    div: float,
    hi_const: float,
    min_cd: int,
    desc_off: int,
    interpret: bool = False,
):
    """Consensus v3: the v1 walk on read-only full-bank VMEM blocks.

    Same signature/return as the retired ``attic/pallas_consensus2.py:consensus_walk_pallas``:
    banks are *inputs* (already current — the caller applies the stochastic
    writes eagerly via frame-global slot draws, bgs/lbsp_family
    ``_apply_updates_global``), Mosaic auto-pipelines the full-bank block
    DMA across grid steps, and nothing is written back — the ~0.5 ms/frame
    write half of the v1 bank traffic disappears while keeping v1's DMA
    pipelining (which the v2 kernel's manual grouped DMA lost, PERF.md; attic/).
    Returns (count, min_desc, min_sum, intra) cropped to [H, W]."""
    C = len(planes)
    N = colors[0].shape[0]
    H, W = planes[0].shape
    ph, pw = (-H) % BH, (-W) % BW

    def pad2(a):
        return jnp.pad(a.astype(jnp.int32), ((0, ph), (0, pw)))

    def pad3(a):
        return jnp.pad(a, ((0, 0), (0, ph), (0, pw)))

    Hp, Wp = H + ph, W + pw
    plane_views = tuple(
        pb for p in planes for pb in (_pad_plane_blocks(p, Hp, Wp),) * 9
    )
    args = (
        plane_views
        + tuple(pad3(c) for c in colors)
        + tuple(pad3(d) for d in descs)
        + (lut_delta.astype(jnp.int32).reshape(1, 1),)
        + (jnp.pad(R.astype(jnp.float32), ((0, ph), (0, pw))), pad2(unstable))
        + (pad2(jnp.broadcast_to(jnp.asarray(required, jnp.int32), (H, W))),)
    )

    grid = (Hp // BH, Wp // BW)
    spec2 = pl.BlockSpec((BH, BW), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    spec_bank = pl.BlockSpec(
        (N, BH, BW), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
    )
    spec_scalar = pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)

    in_specs = (
        _plane_block_specs() * C
        + [spec_bank] * (2 * C)
        + [spec_scalar, spec2, spec2, spec2]
    )
    out_shape = [jax.ShapeDtypeStruct((Hp, Wp), jnp.int32)] * (3 + C)
    out_specs = [spec2] * (3 + C)

    kernel = _make_read_kernel(
        C, N, rel, div, hi_const, C == 1, min_cd, desc_off, interpret
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)
    count, mind, mins = (o[:H, :W] for o in outs[:3])
    intra = tuple(o[:H, :W] for o in outs[3 : 3 + C])
    return count, mind, mins, intra


def _make_fused_kernel(
    C, N, rel, div, hi_const, gray_mode, min_cd, desc_off,
    H, W, use3x3_global, k_consts, interp,
):
    """Whole-step fused kernel: pending apply + consensus walk + the ENTIRE
    feedback stage (``pallas_feedback._core`` — rolling means, R/T/v
    controllers, stochastic draws, blink bookkeeping) + next-frame pending
    pack, all per-tile in VMEM.

    vs the split formulation this removes the count/mind/mins/intra
    intermediate maps (6 full-map HBM round-trips), the separate XLA
    feedback pass's re-read of planes/intra, and the pending-pack
    materializations; the 5 output masks ride ONE packed flags word
    (bit 0 is_fg, 1 unstable, 2 nz, 3 curr_blink, 4 blinks_pre).

    The LBSP ROI mask and the walk's ROI-zeroed required map are derived
    in-kernel from the global pixel coordinates (H, W static), so the
    ``required`` input carries the TRUE per-pixel requirement
    (subsenseShrink's +5 map rides it; ``_core`` divides by it for the
    FG dmin penalty, reference ``BackgroundSubtractorSuBSENSE.cpp:366``).

    Refs (inputs): [plane blocks×9C, own_vals×C, ctrl, pend blocks×9C,
    colors×C, descs×C, delta(SMEM), R, unstable, required,
    last_color×C, last_desc×C, bits×4,
    last_final, blinks_old, last_blink_mask, last_raw, last_dil_inv,
    mean_last, dmin_lt, dmin_st, raw_lt, raw_st, final_lt, final_st, T, v,
    fscal(SMEM [1,4]: a_lt a_st lr_lower lr_upper),
    iscal(SMEM [1,2]: cooldown, t)]
    outputs: [flags, pend_ctrl, pend_vals×C,
    mean_last, dmin_lt, dmin_st, raw_lt, raw_st, T, v, R,
    bg_sum×C, colors×C, descs×C (aliased)].
    """
    from tracking_tpu.ops.pallas_feedback import _core

    def kernel(*refs):
        def get_blk(c, di, dj):
            return refs[9 * c + (di + 1) * 3 + (dj + 1)][...].astype(jnp.int32)

        pb0 = 9 * C
        own_vals = refs[pb0 : pb0 + C]
        ctrl_ref = refs[pb0 + C]

        def pend_blk(c, di, dj):
            return refs[pb0 + C + 1 + 9 * c + (di + 1) * 3 + (dj + 1)][...]

        base = pb0 + C + 1 + 9 * C
        col_in = refs[base : base + C]
        desc_in = refs[base + C : base + 2 * C]
        b = base + 2 * C
        delta_ref, r_ref, unst_ref, req_ref = refs[b : b + 4]
        b += 4
        last_color = refs[b : b + C]
        last_desc = refs[b + C : b + 2 * C]
        bits_refs = refs[b + 2 * C : b + 2 * C + 4]
        b += 2 * C + 4
        (lf_ref, bo_ref, lbm_ref, lraw_ref, ldi_ref) = refs[b : b + 5]
        b += 5
        f32_in = refs[b : b + 9]
        fscal = refs[b + 9]
        iscal = refs[b + 10]
        outs = refs[b + 11 :]
        flags_ref, pctrl_ref = outs[0], outs[1]
        pvals_refs = outs[2 : 2 + C]
        f32_out = outs[2 + C : 2 + C + 8]
        bg_refs = outs[2 + C + 8 : 2 + 2 * C + 8]
        colors = outs[2 + 2 * C + 8 : 2 + 3 * C + 8]
        descs = outs[2 + 3 * C + 8 : 2 + 4 * C + 8]

        # -- apply frame-(t−1)'s pending writes to the VMEM tiles ------------
        bg = _apply_pending_stage(
            C, N, ctrl_ref[...], own_vals, pend_blk,
            col_in, desc_in, colors, descs, interp,
        )
        for c in range(C):
            bg_refs[c][...] = bg[c]

        # -- ROI + ROI-zeroed required from global coordinates ---------------
        gi = pl.program_id(0) * BH + jax.lax.broadcasted_iota(
            jnp.int32, (BH, BW), 0
        )
        gj = pl.program_id(1) * BW + jax.lax.broadcasted_iota(
            jnp.int32, (BH, BW), 1
        )
        roi = (gi >= 2) & (gi <= H - 3) & (gj >= 2) & (gj <= W - 3)
        req_true = req_ref[...]
        req_eff = jnp.where(roi, req_true, 0)

        count, mind, mins, px, intra = _consensus_values(
            C, N, rel, div, hi_const, gray_mode, min_cd, desc_off, interp,
            get_blk, delta_ref[0, 0], r_ref[...], unst_ref[...], req_eff,
            colors, descs,
        )

        # -- feedback epilogue (pallas_feedback._core, shared math) ----------
        t = iscal[0, 1]
        lc = [
            jnp.where(t == 0, px[c], last_color[c][...].astype(jnp.int32))
            for c in range(C)
        ]
        ld = [
            jnp.where(t == 0, intra[c], last_desc[c][...].astype(jnp.int32))
            for c in range(C)
        ]
        fb = _core(
            count, mind, mins, req_true, roi.astype(jnp.int32),
            tuple(px), tuple(intra), tuple(lc), tuple(ld),
            [r[...].astype(jnp.int32) for r in bits_refs],
            f32_in[0][...], f32_in[1][...], f32_in[2][...],
            f32_in[3][...], f32_in[4][...], f32_in[5][...], f32_in[6][...],
            r_ref[...], f32_in[7][...], f32_in[8][...],
            lf_ref[...].astype(jnp.int32), bo_ref[...].astype(jnp.int32),
            lbm_ref[...].astype(jnp.int32), lraw_ref[...].astype(jnp.int32),
            ldi_ref[...].astype(jnp.int32),
            fscal[0, 0], fscal[0, 1], fscal[0, 2], fscal[0, 3], iscal[0, 0],
            C=C, N=N, use3x3_global=use3x3_global, k=k_consts,
        )

        flags_ref[...] = (
            fb.is_fg
            | (fb.unstable << 1)
            | (fb.nz << 2)
            | (fb.curr_blink << 3)
            | (fb.blinks_pre << 4)
        )
        u3u = nb3_to_nb5_idx(fb.o3)
        pctrl_ref[...] = pack_pending_ctrl(
            fb.upd1, fb.slot1, u3u, fb.o5, fb.slot3, fb.slot5
        )
        fires = fb.fire3 | (fb.fire5 << 1)
        for c in range(C):
            v = px[c] | (intra[c] << 8)
            if c == 0:
                v = v | (fires << 24)
            pvals_refs[c][...] = v
        for ref, val in zip(
            f32_out,
            (fb.mean_last, fb.dmin_lt, fb.dmin_st, fb.raw_lt, fb.raw_st,
             fb.T, fb.v, fb.R),
        ):
            ref[...] = val

    return kernel


@partial(
    jax.jit,
    static_argnames=(
        "rel", "div", "hi_const", "min_cd", "desc_off", "use3x3_global",
        "k_consts", "interpret",
    ),
)
def consensus_feedback_pallas(
    planes,
    colors,
    descs,
    pend_ctrl,
    pend_vals,
    lut_delta,
    R,
    unstable,
    required,
    last_color,
    last_desc,
    bits,
    masks,      # (last_final, blinks_old, last_blink_mask, last_raw, last_dil_inv)
    f32_state,  # (mean_last, dmin_lt, dmin_st, raw_lt, raw_st, final_lt, final_st, T, v)
    scalars,    # (a_lt, a_st, lr_lower, lr_upper, cooldown, t)
    rel: float,
    div: float,
    hi_const: float,
    min_cd: int,
    desc_off: int,
    use3x3_global: bool,
    k_consts,
    interpret: bool = False,
):
    """Whole-step fused SuBSENSE kernel (see :func:`_make_fused_kernel`).

    Tensor args as in :func:`consensus_pallas` plus the feedback-stage
    state: last_color/last_desc C-tuples ([H, W] u8/u16), bits [4, H, W]
    i32, masks 5-tuple of [H, W] u8 (0/255 or 0/1 — nonzero = set),
    f32_state 9-tuple of [H, W] f32, scalars (f32 ×4, i32 cooldown, i32 t).
    ``required`` is the TRUE per-pixel requirement (scalar or [H, W] map);
    the ROI zeroing happens in-kernel. Returns
    (flags, pend_ctrl_out, pend_vals_out ×C,
     (mean_last, dmin_lt, dmin_st, raw_lt, raw_st, T, v, R),
     bg_sum ×C, colors, descs)."""
    C = len(planes)
    N = colors[0].shape[0]
    H, W = planes[0].shape
    ph, pw = (-H) % BH, (-W) % BW

    def pad2(a, dt=jnp.int32):
        return jnp.pad(a.astype(dt) if dt else a, ((0, ph), (0, pw)))

    def pad3(a):
        return jnp.pad(a, ((0, 0), (0, ph), (0, pw)))

    Hp, Wp = H + ph, W + pw
    plane_views = tuple(
        pb for p in planes for pb in (_pad_plane_blocks(p, Hp, Wp),) * 9
    )
    pend_views = tuple(
        pb
        for v in pend_vals
        for pb in (_pad_plane_blocks(interior_rep(v), Hp, Wp),) * 9
    )
    a_lt, a_st, lr_lower, lr_upper, cooldown, t = scalars
    args = (
        plane_views
        + tuple(pad2(v) for v in pend_vals)
        + (pad2(pend_ctrl),)
        + pend_views
        + tuple(pad3(c) for c in colors)  # u8, native
        + tuple(pad3(d) for d in descs)  # u16, native
        + (lut_delta.astype(jnp.int32).reshape(1, 1),)
        + (pad2(R, jnp.float32), pad2(unstable))
        + (pad2(jnp.broadcast_to(jnp.asarray(required, jnp.int32), (H, W))),)
        + tuple(pad2(c, None) for c in last_color)  # u8 native
        + tuple(pad2(d, None) for d in last_desc)  # u16 native
        + tuple(pad2(bits[i]) for i in range(4))
        + tuple(pad2(m, jnp.uint8) for m in masks)
        + tuple(pad2(f, jnp.float32) for f in f32_state)
        + (
            jnp.stack(
                [jnp.float32(a_lt), jnp.float32(a_st),
                 jnp.float32(lr_lower), jnp.float32(lr_upper)]
            ).reshape(1, 4),
            jnp.stack(
                [jnp.asarray(cooldown, jnp.int32), jnp.asarray(t, jnp.int32)]
            ).reshape(1, 2),
        )
    )

    grid = (Hp // BH, Wp // BW)
    spec2 = pl.BlockSpec((BH, BW), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    spec_bank = pl.BlockSpec(
        (N, BH, BW), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
    )
    spec_d = pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)
    spec_f4 = pl.BlockSpec((1, 4), lambda i, j: (0, 0), memory_space=pltpu.SMEM)
    spec_i2 = pl.BlockSpec((1, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM)

    in_specs = (
        _plane_block_specs() * C
        + [spec2] * (C + 1)
        + _plane_block_specs() * C
        + [spec_bank] * (2 * C)
        + [spec_d, spec2, spec2, spec2]
        + [spec2] * (2 * C)  # last_color, last_desc
        + [spec2] * 4  # bits
        + [spec2] * 5  # masks
        + [spec2] * 9  # f32 state
        + [spec_f4, spec_i2]
    )
    n_bank_in = 9 * C + C + 1 + 9 * C  # index of the first bank input
    n_map_out = 2 + C + 8 + C  # flags, ctrl, vals×C, f32×8, bg×C
    out_shape = (
        [jax.ShapeDtypeStruct((Hp, Wp), jnp.int32)] * (2 + C)
        + [jax.ShapeDtypeStruct((Hp, Wp), jnp.float32)] * 8
        + [jax.ShapeDtypeStruct((Hp, Wp), jnp.int32)] * C
        + [jax.ShapeDtypeStruct((N, Hp, Wp), colors[0].dtype)] * C
        + [jax.ShapeDtypeStruct((N, Hp, Wp), descs[0].dtype)] * C
    )
    out_specs = [spec2] * n_map_out + [spec_bank] * (2 * C)
    aliases = {n_bank_in + k: n_map_out + k for k in range(2 * C)}

    kernel = _make_fused_kernel(
        C, N, rel, div, hi_const, C == 1, min_cd, desc_off,
        H, W, use3x3_global, k_consts, interpret,
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases=aliases,
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)
    flags = outs[0][:H, :W]
    pctrl = outs[1][:H, :W]
    pvals = tuple(o[:H, :W] for o in outs[2 : 2 + C])
    f32_out = tuple(o[:H, :W] for o in outs[2 + C : 2 + C + 8])
    bg_sum = tuple(o[:H, :W] for o in outs[2 + C + 8 : n_map_out])
    new_colors = tuple(o[:, :H, :W] for o in outs[n_map_out : n_map_out + C])
    new_descs = tuple(o[:, :H, :W] for o in outs[n_map_out + C :])
    return flags, pctrl, pvals, f32_out, bg_sum, new_colors, new_descs


def _make_lobster_kernel(
    C, N, rel, offset, div, c_sc, d_sc, c_tot, d_tot, req, interp
):
    """LOBSTER variant (``BackgroundSubtractorLOBSTER.cpp:191-262``): fixed
    scalar thresholds, descriptor distance = inter-frame hamming only (no
    intra average, no min tracking). Refs: [plane blocks×9×C, own_vals×C,
    ctrl, pend blocks×9×C, colors×C, descs×C] → [count, intra×C, bg_sum×C,
    colors×C, descs×C (aliased)]; the pending writes are frame t−1's
    stochastic updates, applied in-VMEM before the walk (see module
    docstring), and intra feeds the caller's next pending log.

    i16 in-kernel arithmetic was tried and rejected: this Mosaic/v5e
    toolchain cannot legalize i16 vector absi/maxsi/cmpi, so everything
    stays i32 in-register (banks are still u8/u16 in VMEM)."""

    def kernel(*refs):
        def get_blk(c, di, dj):
            return refs[9 * c + (di + 1) * 3 + (dj + 1)][...].astype(jnp.int32)

        pb0 = 9 * C
        own_vals = refs[pb0 : pb0 + C]
        ctrl_ref = refs[pb0 + C]

        def pend_blk(c, di, dj):
            return refs[pb0 + C + 1 + 9 * c + (di + 1) * 3 + (dj + 1)][...]

        base = pb0 + C + 1 + 9 * C
        col_in = refs[base : base + C]
        desc_in = refs[base + C : base + 2 * C]
        outs = refs[base + 2 * C :]
        count_ref = outs[0]
        intra_refs = outs[1 : 1 + C]
        bg_refs = outs[1 + C : 1 + 2 * C]
        colors = outs[1 + 2 * C : 1 + 3 * C]
        descs = outs[1 + 3 * C : 1 + 4 * C]

        bg = _apply_pending_stage(
            C, N, ctrl_ref[...], own_vals, pend_blk,
            col_in, desc_in, colors, descs, interp,
        )
        for c in range(C):
            bg_refs[c][...] = bg[c]

        def thr_of(v):
            raw = (v.astype(jnp.float32) * rel + offset) / div
            return jnp.clip(jnp.rint(raw), 0.0, 255.0).astype(jnp.int32)

        px, nb = [], []
        for c in range(C):
            p = get_blk(c, 0, 0)
            views = _nb_views(partial(get_blk, c), interp)
            ibits = [(jnp.abs(views[k] - p) > thr_of(p)) for k in range(16)]
            intra_refs[c][...] = _pack16(jnp.stack(ibits))
            px.append(p)
            nb.append(views)

        def body(j, count):
            s_cols, cd = [], []
            for c in range(C):
                s_col = colors[c][j].astype(jnp.int32)
                s_cols.append(s_col)
                cd.append(jnp.abs(px[c] - s_col))
            dd = []
            for c in range(C):
                s_col = s_cols[c]
                s_desc = descs[c][j].astype(jnp.int32) & 0xFFFF
                sthr = thr_of(s_col)
                bits = [(jnp.abs(nb[c][k] - s_col) > sthr) for k in range(16)]
                inter = _pack16(jnp.stack(bits))
                dd.append(_popcount16(inter ^ s_desc))
            good = (cd[0] <= c_sc) & (dd[0] <= d_sc)
            for c in range(1, C):
                good &= (cd[c] <= c_sc) & (dd[c] <= d_sc)
            if C > 1:
                good &= (sum(cd) <= c_tot) & (sum(dd) <= d_tot)
            return count + (good & (count < req)).astype(jnp.int32)

        def w_cond(carry):
            j, count = carry
            return (j < N) & jnp.any(count < req)

        def w_body(carry):
            j, count = carry
            return j + 1, body(j, count)

        _, count = jax.lax.while_loop(
            w_cond, w_body, (jnp.int32(0), jnp.zeros((BH, BW), jnp.int32))
        )
        count_ref[...] = count

    return kernel


@partial(
    jax.jit,
    static_argnames=(
        "rel", "offset", "div", "c_sc", "d_sc", "c_tot", "d_tot", "req",
        "interpret", "row_ext",
    ),
)
def consensus_lobster_pallas(
    planes,
    colors,
    descs,
    pend_ctrl,
    pend_vals,
    rel: float,
    offset: float,
    div: float,
    c_sc: int,
    d_sc: int,
    c_tot: int,
    d_tot: int,
    req: int,
    interpret: bool = False,
    row_ext: int = 0,
):
    """Fused LOBSTER consensus + deferred bank update; thresholds are
    compile-time constants (config scalars). Tensor args are C-tuples (same
    layouts as ``consensus_pallas``; banks donated/aliased; ``row_ext`` is
    the same spatial-sharding contract). Returns
    (count [H, W] i32, intra C-tuple of i32 descriptors, bg_sum C-tuple of
    i32 post-apply color sums, colors, descs)."""
    C = len(planes)
    N = colors[0].shape[0]
    if row_ext:
        H, W = planes[0].shape[0] - 2 * row_ext, planes[0].shape[1]
    else:
        H, W = planes[0].shape
    ph, pw = (-H) % BH, (-W) % BW
    assert not row_ext or row_ext >= BH + ph, (row_ext, BH, ph)

    def pad2(a):
        return jnp.pad(a.astype(jnp.int32), ((0, ph), (0, pw)))

    def pad3(a):
        return jnp.pad(a, ((0, 0), (0, ph), (0, pw)))

    Hp, Wp = H + ph, W + pw
    if row_ext:
        E = row_ext
        plane_views = tuple(
            pb for p in planes for pb in (_ext_plane_blocks(p, E, Hp, Wp),) * 9
        )
        pend_views = tuple(
            pb
            for v in pend_vals
            for pb in (_ext_plane_blocks(_interior_rep_cols(v), E, Hp, Wp),) * 9
        )
        own_pend = tuple(v[E : E + H] for v in pend_vals)
    else:
        plane_views = tuple(
            pb for p in planes for pb in (_pad_plane_blocks(p, Hp, Wp),) * 9
        )
        pend_views = tuple(
            pb
            for v in pend_vals
            for pb in (_pad_plane_blocks(interior_rep(v), Hp, Wp),) * 9
        )
        own_pend = pend_vals
    args = (
        plane_views
        + tuple(pad2(v) for v in own_pend)
        + (pad2(pend_ctrl),)
        + pend_views
        + tuple(pad3(c) for c in colors)  # u8, native
        + tuple(pad3(d) for d in descs)  # u16, native
    )
    grid = (Hp // BH, Wp // BW)
    spec2 = pl.BlockSpec((BH, BW), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    spec_bank = pl.BlockSpec(
        (N, BH, BW), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
    )
    kernel = _make_lobster_kernel(
        C, N, rel, offset, div, c_sc, d_sc, c_tot, d_tot, req, interpret
    )
    n_bank_in = 9 * C + C + 1 + 9 * C
    n_map_out = 1 + 2 * C
    out_shape = (
        [jax.ShapeDtypeStruct((Hp, Wp), jnp.int32)] * n_map_out
        + [jax.ShapeDtypeStruct((N, Hp, Wp), colors[0].dtype)] * C
        + [jax.ShapeDtypeStruct((N, Hp, Wp), descs[0].dtype)] * C
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=(
            _plane_block_specs() * C
            + [spec2] * (C + 1)
            + _plane_block_specs() * C
            + [spec_bank] * (2 * C)
        ),
        out_specs=[spec2] * n_map_out + [spec_bank] * (2 * C),
        out_shape=out_shape,
        input_output_aliases={n_bank_in + k: n_map_out + k for k in range(2 * C)},
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)
    count = outs[0][:H, :W]
    intra = tuple(o[:H, :W] for o in outs[1 : 1 + C])
    bg_sum = tuple(o[:H, :W] for o in outs[1 + C : n_map_out])
    new_colors = tuple(o[:, :H, :W] for o in outs[n_map_out : n_map_out + C])
    new_descs = tuple(o[:, :H, :W] for o in outs[n_map_out + C :])
    return count, intra, bg_sum, new_colors, new_descs
