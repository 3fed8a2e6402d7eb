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
color/desc banks plus the [16, bh, bw] neighbor stack in VMEM, fusing the
whole N-sample walk into one pass — bank bytes cross HBM exactly once.

Layouts: the [N, H, W] banks stay u8/u16 end-to-end (widening 414 MB of
banks to i32 outside the kernel cost more than the kernel itself); they are
cast per-tile inside VMEM. Small [H, W] planes are i32. Tiles are
(bh=32, bw=256) — u8's minimal sublane tiling.

Per-channel inputs (C ≤ 3 static unroll, one kernel invocation per channel
triple): the early-exit "count < required" gating matches the reference's
semantics exactly (later samples never update the mins once satisfied).
Outputs: good-sample count, min total desc dist, min total sum dist.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


def _make_kernel(C, N, rel, div, hi_const, gray_mode, min_cd, desc_off):
    """Kernel body closure. Refs order:
    [planes×C, nb×C, intra×C, colors×C, descs×C, delta, R, unstable, req]
    outputs [count, min_desc, min_sum].

    The R(x)-dependent thresholds are computed per-tile from R and the old
    unstable mask (``BackgroundSubtractorSuBSENSE.cpp:327-328``) instead of
    arriving as precomputed maps — saves two full-map materializations per
    frame. The vector ``1 << floor(R+0.5)`` uses the f32-exponent bit trick
    (Mosaic has no vector shift-by-vector)."""

    def kernel(*refs):
        planes = refs[0:C]
        nbs = refs[C : 2 * C]
        intras = refs[2 * C : 3 * C]
        colors = refs[3 * C : 4 * C]
        descs = refs[4 * C : 5 * C]
        delta_ref = refs[5 * C]
        r_ref = refs[5 * C + 1]
        unst_ref = refs[5 * C + 2]
        req_ref = refs[5 * C + 3]
        count_ref, mind_ref, mins_ref = refs[5 * C + 4 :]

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
        px = [planes[c][...] for c in range(C)]
        nb = [nbs[c][...] for c in range(C)]
        intra = [intras[c][...] for c in range(C)]

        if C == 3:
            tot_color_thr = color_thr * 3
            tot_desc_thr = desc_thr * 3
            sc_color_thr = tot_color_thr // 2

        count = jnp.zeros((BH, BW), jnp.int32)
        mind = jnp.full((BH, BW), 16 * C, jnp.int32)
        mins = jnp.full((BH, BW), 255 * C, jnp.int32)

        def body(j, carry):
            count, mind, mins = carry
            cd, dd = [], []
            for c in range(C):
                s_col = colors[c][j].astype(jnp.int32)
                s_desc = descs[c][j].astype(jnp.int32) & 0xFFFF
                cdist = jnp.abs(px[c] - s_col)
                sthr = _thr_closed_form(s_col, delta, rel, div, hi_const)
                bits = [
                    (jnp.abs(nb[c][k] - s_col) > sthr) for k in range(16)
                ]
                inter = _pack16(jnp.stack(bits))
                intra_d = _popcount16(intra[c] ^ s_desc)
                inter_d = _popcount16(inter ^ s_desc)
                cd.append(cdist)
                dd.append((intra_d + inter_d) // 2)
            if C == 1:
                sum_d = jnp.minimum((dd[0] // 4) * (255 // 16) + cd[0], 255)
                good = (cd[0] <= color_thr) & (dd[0] <= desc_thr) & (sum_d <= color_thr)
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
                good = sc_ok & (tot_desc <= tot_desc_thr) & (tot_sum <= tot_color_thr)
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
    nb_stacks,
    intra_descs,
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
    planes [H, W] u8, nb_stacks [16, H, W] i16, intra_descs [H, W] u16,
    colors/descs [N, H, W] u8/u16; R [H, W] f32; unstable [H, W] bool/int;
    lut_delta scalar i32; required is a scalar or [H, W] i32 map (the
    subsenseShrink per-pixel offset); min_cd/desc_off the config threshold
    constants (thresholds are derived in-kernel). Returns
    (count, min_desc, min_sum) i32 [H, W]."""
    C = len(planes)
    N = colors[0].shape[0]
    H, W = planes[0].shape
    ph, pw = (-H) % BH, (-W) % BW

    def pad2(a):
        return jnp.pad(a.astype(jnp.int32), ((0, ph), (0, pw)))

    def pad3(a):
        return jnp.pad(a, ((0, 0), (0, ph), (0, pw)))

    args = (
        tuple(pad2(p) for p in planes)
        + tuple(pad3(n.astype(jnp.int32)) for n in nb_stacks)
        + tuple(pad2(i) for i in intra_descs)
        + tuple(pad3(c) for c in colors)  # u8, native
        + tuple(pad3(d.astype(jnp.int16)) for d in descs)  # u16→i16 bitcast-safe
        + (lut_delta.astype(jnp.int32).reshape(1, 1),)
        + (jnp.pad(R.astype(jnp.float32), ((0, ph), (0, pw))), pad2(unstable))
        + (pad2(jnp.broadcast_to(jnp.asarray(required, jnp.int32), (H, W))),)
    )

    Hp, Wp = H + ph, W + pw
    grid = (Hp // BH, Wp // BW)

    def tile2(i, j):
        return (i, j)

    def tile3(i, j):
        return (0, i, j)

    spec2 = pl.BlockSpec((BH, BW), tile2, memory_space=pltpu.VMEM)
    spec_nb = pl.BlockSpec((16, BH, BW), tile3, memory_space=pltpu.VMEM)
    spec_bank = pl.BlockSpec((N, BH, BW), tile3, memory_space=pltpu.VMEM)
    spec_scalar = pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)

    in_specs = (
        [spec2] * C + [spec_nb] * C + [spec2] * C + [spec_bank] * C
        + [spec_bank] * C + [spec_scalar, spec2, spec2, spec2]
    )
    out_shape = [jax.ShapeDtypeStruct((Hp, Wp), jnp.int32)] * 3
    out_specs = [spec2] * 3

    kernel = _make_kernel(C, N, rel, div, hi_const, C == 1, min_cd, desc_off)
    count, mind, mins = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    return count[:H, :W], mind[:H, :W], mins[:H, :W]


def _make_lobster_kernel(C, N, rel, offset, div, c_sc, d_sc, c_tot, d_tot, req):
    """LOBSTER variant (``BackgroundSubtractorLOBSTER.cpp:191-262``): fixed
    scalar thresholds, descriptor distance = inter-frame hamming only (no
    intra average, no min tracking). Refs: [planes×C, nb×C, colors×C,
    descs×C] → [count].

    i16 in-kernel arithmetic was tried and rejected: this Mosaic/v5e
    toolchain cannot legalize i16 vector absi/maxsi/cmpi, so everything
    stays i32 in-register (banks are still u8/u16 in VMEM)."""

    def kernel(*refs):
        planes = refs[0:C]
        nbs = refs[C : 2 * C]
        colors = refs[2 * C : 3 * C]
        descs = refs[3 * C : 4 * C]
        count_ref = refs[4 * C]

        px = [planes[c][...] for c in range(C)]
        nb = [nbs[c][...] for c in range(C)]

        def body(j, count):
            cd, dd = [], []
            for c in range(C):
                s_col = colors[c][j].astype(jnp.int32)
                s_desc = descs[c][j].astype(jnp.int32) & 0xFFFF
                cdist = jnp.abs(px[c] - s_col)
                raw = (s_col.astype(jnp.float32) * rel + offset) / div
                sthr = jnp.clip(jnp.rint(raw), 0.0, 255.0).astype(jnp.int32)
                bits = [(jnp.abs(nb[c][k] - s_col) > sthr) for k in range(16)]
                inter = _pack16(jnp.stack(bits))
                cd.append(cdist)
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
    nb_stacks,
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
    Returns the good-sample count [H, W] i32."""
    C = len(planes)
    N = colors[0].shape[0]
    H, W = planes[0].shape
    ph, pw = (-H) % BH, (-W) % BW

    def pad2(a):
        return jnp.pad(a.astype(jnp.int32), ((0, ph), (0, pw)))

    def pad3(a):
        return jnp.pad(a, ((0, 0), (0, ph), (0, pw)))

    args = (
        tuple(pad2(p) for p in planes)
        + tuple(pad3(n.astype(jnp.int32)) for n in nb_stacks)
        + tuple(pad3(c) for c in colors)  # u8, native
        + tuple(pad3(d) for d in descs)  # u16, native
    )
    Hp, Wp = H + ph, W + pw
    grid = (Hp // BH, Wp // BW)
    spec2 = pl.BlockSpec((BH, BW), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    spec_nb = pl.BlockSpec((16, BH, BW), lambda i, j: (0, i, j), memory_space=pltpu.VMEM)
    spec_bank = pl.BlockSpec((N, BH, BW), lambda i, j: (0, i, j), memory_space=pltpu.VMEM)
    kernel = _make_lobster_kernel(
        C, N, rel, offset, div, c_sc, d_sc, c_tot, d_tot, req
    )
    count = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec2] * C + [spec_nb] * C + [spec_bank] * C + [spec_bank] * C,
        out_specs=[spec2],
        out_shape=[jax.ShapeDtypeStruct((Hp, Wp), jnp.int32)],
        interpret=interpret,
    )(*args)[0]
    return count[:H, :W]
