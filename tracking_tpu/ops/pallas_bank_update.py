"""Pallas TPU kernel: in-place SuBSENSE/LOBSTER bank writes.

The stochastic model updates write ≤ 2 slots per pixel per frame
(self/cooldown resample + neighbor spread,
``BackgroundSubtractorSuBSENSE.cpp:360-405``), yet the XLA formulation
(`jnp.where` over the [N, H, W] banks) re-materializes every bank — ~414 MB
copied per frame at 720p color. This kernel applies both writes through
``input_output_aliases`` on the donated banks: each bank tile is read into
VMEM, select-updated, and written back to the same HBM buffer — no copy.

Banks stay in their native dtypes (u8 colors, u16 descs). The picked
neighbor values (which need cross-tile context) are precomputed outside as
[H, W] planes; the kernel is tile-local. Write precedence matches the
sequential reference: the neighbor-spread (second loop) wins on a same-slot
collision.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BH, BW = 16, 256


def _make_kernel(C, N):
    """refs: [m1 u8, slot1 i32, mn u8, slotn i32,
              own×C u8, own_desc×C u16, nbv×C u8, nbv_desc×C u16,
              colors×C, descs×C (aliased outputs)]"""

    def kernel(*refs):
        m1 = refs[0][...] != 0
        slot1 = refs[1][...]
        mn = refs[2][...] != 0
        slotn = refs[3][...]
        own = [refs[4 + c][...] for c in range(C)]
        own_d = [refs[4 + C + c][...] for c in range(C)]
        nbv = [refs[4 + 2 * C + c][...] for c in range(C)]
        nbv_d = [refs[4 + 3 * C + c][...] for c in range(C)]
        n_in = 4 + 4 * C
        col_in = refs[n_in : n_in + C]
        desc_in = refs[n_in + C : n_in + 2 * C]
        col_out = refs[n_in + 2 * C : n_in + 3 * C]
        desc_out = refs[n_in + 3 * C : n_in + 4 * C]

        def body(j, _):
            w1 = m1 & (slot1 == j)
            w2 = mn & (slotn == j)
            for c in range(C):
                cur = col_in[c][j]
                col_out[c][j] = jnp.where(w2, nbv[c], jnp.where(w1, own[c], cur))
                curd = desc_in[c][j]
                desc_out[c][j] = jnp.where(w2, nbv_d[c], jnp.where(w1, own_d[c], curd))
            return 0

        jax.lax.fori_loop(0, N, body, 0)

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def bank_update_pallas(
    m1, slot1, mn, slotn, own, own_desc, nbv, nbv_desc, colors, descs,
    interpret: bool = False,
):
    """Apply self+spread writes in place (banks aliased).

    m1/mn: [H, W] bool; slot1/slotn: [H, W] i32; own/nbv: C-tuples of [H, W]
    u8; own_desc/nbv_desc: C-tuples of [H, W] u16; colors/descs: C-tuples of
    [N, H, W] u8/u16 banks. Returns updated (colors, descs)."""
    C = len(own)
    N = colors[0].shape[0]
    H, W = m1.shape
    ph, pw = (-H) % BH, (-W) % BW

    def pad2(a):
        return jnp.pad(a, ((0, ph), (0, pw)))

    def pad3(a):
        return jnp.pad(a, ((0, 0), (0, ph), (0, pw)))

    args = (
        (
            pad2(m1.astype(jnp.uint8)),
            pad2(slot1.astype(jnp.int32)),
            pad2(mn.astype(jnp.uint8)),
            pad2(slotn.astype(jnp.int32)),
        )
        + tuple(pad2(x) for x in own)
        + tuple(pad2(x) for x in own_desc)
        + tuple(pad2(x) for x in nbv)
        + tuple(pad2(x) for x in nbv_desc)
        + tuple(pad3(x) for x in colors)
        + tuple(pad3(x) for x in descs)
    )

    Hp, Wp = H + ph, W + pw
    grid = (Hp // BH, Wp // BW)
    spec2 = pl.BlockSpec((BH, BW), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    spec_bank = pl.BlockSpec(
        (N, BH, BW), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
    )

    n_plane = 4 + 4 * C
    in_specs = [spec2] * n_plane + [spec_bank] * (2 * C)
    out_shape = [jax.ShapeDtypeStruct((N, Hp, Wp), colors[0].dtype)] * C + [
        jax.ShapeDtypeStruct((N, Hp, Wp), descs[0].dtype)
    ] * C
    out_specs = [spec_bank] * (2 * C)
    aliases = {n_plane + k: k for k in range(2 * C)}

    outs = pl.pallas_call(
        _make_kernel(C, N),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases=aliases,
        interpret=interpret,
    )(*args)
    if ph or pw:
        outs = [o[:, :H, :W] for o in outs]
    return tuple(outs[:C]), tuple(outs[C:])
