"""Pallas TPU kernel: fused SuBSENSE/LOBSTER sample-consensus.

The consensus is the hot inner loop of the LBSP family
(``pl/BackgroundSubtractorSuBSENSE.cpp:332-358``): for every pixel, walk the
N=50 background samples computing an L1 color distance plus an LBSP
descriptor distance (intra XOR-popcount + a 16-neighbor inter-frame
descriptor built against the *sample's* color and threshold), and count
"good" samples until 2 are found, tracking the minimal distances.

The XLA formulation (lax.scan over the bank axis) round-trips its [H, W]
carries and bank slices through HBM on every sample. This kernel instead
tiles the image plane over a grid and holds a tile's entire [N, bh, bw]
color/desc banks in VMEM, fusing the whole N-sample walk into one pass —
bank bytes cross HBM exactly once.

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

from tracking_tpu.ops import lbsp
from tracking_tpu.ops.pallas_fill import _roll

BH, BW = 16, 256


def _popcount16(v):
    v = v - ((v >> 1) & 0x5555)
    v = (v & 0x3333) + ((v >> 2) & 0x3333)
    v = (v + (v >> 4)) & 0x0F0F
    return (v + (v >> 8)) & 0x1F


def _pack16(bits):
    """[16, bh, bw] bool → i32 packed."""
    acc = jnp.zeros(bits.shape[1:], jnp.int32)
    for k in range(16):
        acc = acc | (bits[k].astype(jnp.int32) << k)
    return acc


def _thr_closed_form(v, delta, rel, div, hi_const):
    base = jnp.clip(jnp.rint(v.astype(jnp.float32) * rel / div), 0.0, 255.0)
    lo = jnp.ceil(v.astype(jnp.float32) * rel / 4.0)
    return jnp.clip(
        base + delta, jnp.minimum(base, lo), jnp.maximum(base, hi_const)
    ).astype(jnp.int32)


def _nb_views(get_blk, interp):
    """16 LBSP neighbor views of the center tile, V_k(y, x) = P(y+dy_k, x+dx_k).

    ``get_blk(di, dj)`` returns the i32 tile at block offset (di, dj) ∈
    {−1, 0, 1}². Each view is a roll of the center block with the wrapped
    rows/columns replaced (iota masks) by identically-rolled neighbor
    blocks — pure vector ops, no HBM traffic, no unaligned lane slicing
    (which trips Mosaic layout bugs; see pallas_fill)."""
    i0 = jax.lax.broadcasted_iota(jnp.int32, (BH, BW), 0)
    i1 = jax.lax.broadcasted_iota(jnp.int32, (BH, BW), 1)
    views = []
    for dx, dy in lbsp.OFFSETS:
        def roll2(b):
            return _roll(_roll(b, -dy, 0, interp), -dx, 1, interp)

        def rowres(dj):
            c_ = roll2(get_blk(0, dj))
            if dy < 0:
                return jnp.where(i0 < -dy, roll2(get_blk(-1, dj)), c_)
            if dy > 0:
                return jnp.where(i0 >= BH - dy, roll2(get_blk(1, dj)), c_)
            return c_

        v = rowres(0)
        if dx < 0:
            v = jnp.where(i1 < -dx, rowres(-1), v)
        elif dx > 0:
            v = jnp.where(i1 >= BW - dx, rowres(1), v)
        views.append(v)
    return views


def _pad_plane_blocks(p, Hp, Wp):
    """u8 [H, W] → [Hp+2BH, Wp+2BW] edge-padded (alignment padding is also
    edge-mode so neighbor views clamp exactly like ops.lbsp.neighbor_stack
    even when H/W are not block multiples)."""
    H, W = p.shape
    return jnp.pad(p, ((BH, Hp - H + BH), (BW, Wp - W + BW)), mode="edge")


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


def _make_kernel(C, N, rel, div, hi_const, gray_mode, min_cd, desc_off, interp):
    """Kernel body closure. Refs order:
    [plane blocks×9×C, colors×C, descs×C, delta, R, unstable, req]
    outputs [count, min_desc, min_sum, intra×C].

    The R(x)-dependent thresholds are computed per-tile from R and the old
    unstable mask (``BackgroundSubtractorSuBSENSE.cpp:327-328``) instead of
    arriving as precomputed maps — saves two full-map materializations per
    frame. The vector ``1 << floor(R+0.5)`` uses the f32-exponent bit trick
    (Mosaic has no vector shift-by-vector)."""

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
        intra_refs = outs[3:]

        delta = delta_ref[0, 0].astype(jnp.float32)
        R = r_ref[...]
        unstable = unst_ref[...]  # i32 0/1
        required = req_ref[...]

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
            intra_refs[c][...] = d
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
                intra_d = _popcount16(intra[c] ^ s_desc)
                inter_d = _popcount16(inter ^ s_desc)
                dd.append((intra_d + inter_d) // 2)
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
        count_ref[...] = count
        mind_ref[...] = mind
        mins_ref[...] = mins

    return kernel


@partial(
    jax.jit,
    static_argnames=("rel", "div", "hi_const", "min_cd", "desc_off", "interpret"),
)
def consensus_pallas(
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
    """Fused consensus. All tensor args are C-tuples:
    planes [H, W] u8, colors/descs [N, H, W] u8/u16; R [H, W] f32; unstable
    [H, W] bool/int; lut_delta scalar i32; required is a scalar or [H, W]
    i32 map (the subsenseShrink per-pixel offset); min_cd/desc_off the
    config threshold constants (thresholds are derived in-kernel). Returns
    (count, min_desc, min_sum, intra) i32 [H, W]; intra is a C-tuple of the
    16-bit intra-frame LBSP descriptors (i32)."""
    C = len(planes)
    N = colors[0].shape[0]
    H, W = planes[0].shape
    ph, pw = (-H) % BH, (-W) % BW

    def pad2(a):
        return jnp.pad(a.astype(jnp.int32), ((0, ph), (0, pw)))

    def pad3(a):
        return jnp.pad(a, ((0, 0), (0, ph), (0, pw)))

    Hp, Wp = H + ph, W + pw
    # one input entry per block view (same device buffer 9×, no copies)
    plane_views = tuple(
        pb for p in planes for pb in (_pad_plane_blocks(p, Hp, Wp),) * 9
    )
    args = (
        plane_views
        + tuple(pad3(c) for c in colors)  # u8, native
        + tuple(pad3(d.astype(jnp.int16)) for d in descs)  # u16→i16 bitcast-safe
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

    kernel = _make_kernel(
        C, N, rel, div, hi_const, C == 1, min_cd, desc_off, interpret
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    count, mind, mins = (o[:H, :W] for o in outs[:3])
    intra = tuple(o[:H, :W] for o in outs[3:])
    return count, mind, mins, intra


def _make_lobster_kernel(
    C, N, rel, offset, div, c_sc, d_sc, c_tot, d_tot, req, interp
):
    """LOBSTER variant (``BackgroundSubtractorLOBSTER.cpp:191-262``): fixed
    scalar thresholds, descriptor distance = inter-frame hamming only (no
    intra average, no min tracking). Refs: [plane blocks×9×C, colors×C,
    descs×C] → [count, intra×C] (intra is not used by the match but is
    needed by the caller's bank updates and carried state).

    i16 in-kernel arithmetic was tried and rejected: this Mosaic/v5e
    toolchain cannot legalize i16 vector absi/maxsi/cmpi, so everything
    stays i32 in-register (banks are still u8/u16 in VMEM)."""

    def kernel(*refs):
        def get_blk(c, di, dj):
            return refs[9 * c + (di + 1) * 3 + (dj + 1)][...].astype(jnp.int32)

        base = 9 * C
        colors = refs[base : base + C]
        descs = refs[base + C : base + 2 * C]
        count_ref = refs[base + 2 * C]
        intra_refs = refs[base + 2 * C + 1 :]

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
        "interpret",
    ),
)
def consensus_lobster_pallas(
    planes,
    colors,
    descs,
    rel: float,
    offset: float,
    div: float,
    c_sc: int,
    d_sc: int,
    c_tot: int,
    d_tot: int,
    req: int,
    interpret: bool = False,
):
    """Fused LOBSTER consensus; thresholds are compile-time constants (config
    scalars). Tensor args are C-tuples (same layouts as ``consensus_pallas``).
    Returns (count [H, W] i32, intra C-tuple of i32 descriptors)."""
    C = len(planes)
    N = colors[0].shape[0]
    H, W = planes[0].shape
    ph, pw = (-H) % BH, (-W) % BW

    def pad3(a):
        return jnp.pad(a, ((0, 0), (0, ph), (0, pw)))

    Hp, Wp = H + ph, W + pw
    plane_views = tuple(
        pb for p in planes for pb in (_pad_plane_blocks(p, Hp, Wp),) * 9
    )
    args = (
        plane_views
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
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=_plane_block_specs() * C + [spec_bank] * (2 * C),
        out_specs=[spec2] * (1 + C),
        out_shape=[jax.ShapeDtypeStruct((Hp, Wp), jnp.int32)] * (1 + C),
        interpret=interpret,
    )(*args)
    count = outs[0][:H, :W]
    intra = tuple(o[:H, :W] for o in outs[1:])
    return count, intra
