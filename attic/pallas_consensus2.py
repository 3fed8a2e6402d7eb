"""Consensus v2 TPU kernel: read-only sample-consensus walk with on-demand
grouped bank DMA.

v1 (ops/pallas_consensus.py) fuses the deferred bank writes and the
background-image sum into the consensus kernel, so every bank byte crosses
HBM twice per frame (828 MB at N=50 color 720p ≈ 1.01 ms at v5e peak — the
measured 2.16 ms required=0 kernel floor is dominated by it, PERF.md). The
v2 model (bgs/lbsp_family._apply_updates_global) moves the ≤3 slot writes
into XLA dynamic-slice updates and carries the background sum incrementally,
which leaves the kernel a *pure reader* — and a reader only needs the slots
the walk actually visits:

- the sample banks stay in HBM (``memory_space=ANY``); the kernel copies
  them tile-by-tile into VMEM scratch in GROUPS of G slots with explicit
  ``make_async_copy`` double-buffering (group g+1 is in flight while group
  g is walked, and group 0's copy overlaps the intra-descriptor preamble);
- the existing tile-level early exit now also stops the *DMA*: a background
  tile that satisfies its consensus inside group 0 never fetches the other
  N−G slots (previously their bytes crossed HBM regardless);
- ROI-zeroed ``required`` tiles (the 2-px border, 43 % of 720p tiles) fetch
  exactly one group.

Exactness: identical walk math to v1's kernel (same closed-form LBSP
thresholds, packed-XOR popcount distances, per-sample early-exit
granularity); skipped groups could only have updated dead lanes — the same
argument as v1's tile-level early exit. Reference semantics:
``BackgroundSubtractorSuBSENSE.cpp:293-436`` (grayscale loop; the per-pixel
``while(nGoodSamplesCount<nRequiredBGSamples ...)``).

Outputs (count, min_desc, min_sum, intra) feed the same fused feedback
stage as v1; bank updates and the bg image happen in XLA (see
lbsp_family).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tracking_tpu.ops.pallas_consensus import (
    BH,
    BW,
    _nb_views,
    _pack16,
    _pad_plane_blocks,
    _plane_block_specs,
    _popcount32,
    _thr_closed_form,
)


def _group_size(N: int) -> int:
    """Largest divisor of N that is ≤ 10 (static DMA slice size; a divisor
    avoids a separate tail-copy call site)."""
    for g in range(10, 0, -1):
        if N % g == 0:
            return g
    return 1


def _make_walk_kernel(C, N, G, rel, div, hi_const, gray_mode, min_cd, desc_off, interp):
    """Kernel closure. Ref order:
    inputs  [plane blocks×9×C, delta(SMEM), R, unstable, required,
             colors_hbm×C (ANY), descs_hbm×C (ANY)]
    outputs [count, min_desc, min_sum, intra×C]
    scratch [col_scr×C (2,G,BH,BW u8), desc_scr×C (2,G,BH,BW u16),
             sems (2, 2C)]
    """
    Gn = N // G

    def kernel(*refs):
        def get_blk(c, di, dj):
            return refs[9 * c + (di + 1) * 3 + (dj + 1)][...].astype(jnp.int32)

        base = 9 * C
        delta_ref = refs[base]
        r_ref = refs[base + 1]
        unst_ref = refs[base + 2]
        req_ref = refs[base + 3]
        col_hbm = refs[base + 4 : base + 4 + C]
        desc_hbm = refs[base + 4 + C : base + 4 + 2 * C]
        outs = refs[base + 4 + 2 * C : base + 4 + 2 * C + 3 + C]
        count_ref, mind_ref, mins_ref = outs[:3]
        intra_refs = outs[3 : 3 + C]
        scratch = refs[base + 4 + 2 * C + 3 + C :]
        col_scr = scratch[:C]
        desc_scr = scratch[C : 2 * C]
        sems = scratch[2 * C]

        i = pl.program_id(0)
        j = pl.program_id(1)
        row0 = i * BH
        col0 = j * BW

        def group_copies(g, buf):
            """The 2C copy descriptors for slot group g into buffer buf."""
            out = []
            for c in range(C):
                out.append(
                    pltpu.make_async_copy(
                        col_hbm[c].at[
                            pl.ds(g * G, G), pl.ds(row0, BH), pl.ds(col0, BW)
                        ],
                        col_scr[c].at[buf],
                        sems.at[buf, 2 * c],
                    )
                )
                out.append(
                    pltpu.make_async_copy(
                        desc_hbm[c].at[
                            pl.ds(g * G, G), pl.ds(row0, BH), pl.ds(col0, BW)
                        ],
                        desc_scr[c].at[buf],
                        sems.at[buf, 2 * c + 1],
                    )
                )
            return out

        def start_group(g, buf):
            for dma in group_copies(g, buf):
                dma.start()

        def wait_group(g, buf):
            for dma in group_copies(g, buf):
                dma.wait()

        # group 0 in flight while the intra/view preamble computes
        start_group(0, 0)

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

        def slot_body(buf, k, carry):
            count, mind, mins = carry
            s_cols, cd = [], []
            for c in range(C):
                s_col = col_scr[c][buf, k].astype(jnp.int32)
                s_cols.append(s_col)
                cd.append(jnp.abs(px[c] - s_col))
            dd = []
            for c in range(C):
                s_col = s_cols[c]
                s_desc = desc_scr[c][buf, k].astype(jnp.int32) & 0xFFFF
                sthr = _thr_closed_form(s_col, delta, rel, div, hi_const)
                bits = [(jnp.abs(nb[c][kk] - s_col) > sthr) for kk in range(16)]
                inter = _pack16(jnp.stack(bits))
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

        count0 = jnp.zeros((BH, BW), jnp.int32)
        mind0 = jnp.full((BH, BW), 16 * C, jnp.int32)
        mins0 = jnp.full((BH, BW), 255 * C, jnp.int32)

        # outer: groups (DMA double-buffered); inner: slots, both with the
        # same per-sample early-exit granularity as v1
        def g_cond(carry):
            g, count, _, _ = carry
            return (g < Gn) & jnp.any(count < required)

        def g_body(carry):
            g, count, mind, mins = carry
            buf = jax.lax.rem(g, 2)
            wait_group(g, buf)

            @pl.when(g + 1 < Gn)
            def _():
                start_group(g + 1, 1 - buf)

            def k_cond(c2):
                k, count, _, _ = c2
                return (k < G) & jnp.any(count < required)

            def k_body(c2):
                k, count, mind, mins = c2
                count, mind, mins = slot_body(buf, k, (count, mind, mins))
                return k + 1, count, mind, mins

            _, count, mind, mins = jax.lax.while_loop(
                k_cond, k_body, (jnp.int32(0), count, mind, mins)
            )
            return g + 1, count, mind, mins

        g_final, count, mind, mins = jax.lax.while_loop(
            g_cond, g_body, (jnp.int32(0), count0, mind0, mins0)
        )

        # cleanup: iteration g starts group g+1 speculatively; on exit at
        # g_final the copy for g_final (started by iteration g_final−1, or
        # the pre-loop start(0)) has no waiter yet
        @pl.when(g_final < Gn)
        def _():
            wait_group(g_final, jax.lax.rem(g_final, 2))

        count_ref[...] = count
        mind_ref[...] = mind
        mins_ref[...] = mins

    return kernel


@partial(
    jax.jit,
    static_argnames=("rel", "div", "hi_const", "min_cd", "desc_off", "interpret"),
)
def consensus_walk_pallas(
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
    """Read-only consensus walk (v2). Tensor args are C-tuples: planes
    [H, W] u8; colors/descs [N, H, W] u8/u16 (read-only — stay in HBM, DMA'd
    in slot groups on demand); R [H, W] f32; unstable [H, W] bool/int;
    required scalar or [H, W] i32; lut_delta scalar i32.
    Returns (count, min_desc, min_sum, intra): i32 [H, W] maps (intra a
    C-tuple of 16-bit intra-frame LBSP descriptors)."""
    C = len(planes)
    N = colors[0].shape[0]
    G = _group_size(N)
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
        + (lut_delta.astype(jnp.int32).reshape(1, 1),)
        + (jnp.pad(R.astype(jnp.float32), ((0, ph), (0, pw))), pad2(unstable))
        + (pad2(jnp.broadcast_to(jnp.asarray(required, jnp.int32), (H, W))),)
        + tuple(pad3(c) for c in colors)
        + tuple(pad3(d) for d in descs)
    )

    grid = (Hp // BH, Wp // BW)
    spec2 = pl.BlockSpec((BH, BW), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    spec_scalar = pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)
    spec_any = pl.BlockSpec(memory_space=pltpu.ANY)

    in_specs = (
        _plane_block_specs() * C
        + [spec_scalar, spec2, spec2, spec2]
        + [spec_any] * (2 * C)
    )
    out_shape = [jax.ShapeDtypeStruct((Hp, Wp), jnp.int32)] * (3 + C)
    out_specs = [spec2] * (3 + C)

    kernel = _make_walk_kernel(
        C, N, G, rel, div, hi_const, C == 1, min_cd, desc_off, interpret
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=(
            [pltpu.VMEM((2, G, BH, BW), colors[0].dtype) for _ in range(C)]
            + [pltpu.VMEM((2, G, BH, BW), descs[0].dtype) for _ in range(C)]
            + [pltpu.SemaphoreType.DMA((2, 2 * C))]
        ),
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)
    count, mind, mins = (o[:H, :W] for o in outs[:3])
    intra = tuple(o[:H, :W] for o in outs[3 : 3 + C])
    return count, mind, mins, intra
