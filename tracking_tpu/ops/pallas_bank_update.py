"""Pallas TPU kernel: in-place SuBSENSE/LOBSTER bank writes with in-kernel
neighbor-spread picks.

The stochastic model updates write ≤ 2 slots per pixel per frame
(self/cooldown resample + neighbor spread,
``BackgroundSubtractorSuBSENSE.cpp:360-405``), yet the XLA formulation
(`jnp.where` over the [N, H, W] banks) re-materializes every bank — ~414 MB
copied per frame at 720p color. This kernel applies both writes through
``input_output_aliases`` on the donated banks: each bank tile is read into
VMEM, select-updated, and written back to the same HBM buffer — no copy.

The neighbor-spread *pick* (destination p receives source q = p − offset's
frame color/descriptor when q's own spread draw fired) is ALSO fused here:
the fire masks and the packed color|desc source words are passed as 9
shifted-block views (the pallas_consensus halo trick) and the 3×3/5×5
random-offset selection runs over VMEM tiles — replacing the XLA
select-chain stage (59 shifted full-map reads over 7 arrays, ~1.3 ms at
720p) and its intermediate materializations.

Layouts/conventions:
- banks stay native u8/u16; the picked values travel as one i32
  ``plane | intra << 8`` word per channel (halves the number of views).
- offsets use ONE unified index into the 24-entry 5×5 pattern
  (``RandUtils.h:52-81``); the 3×3 draw is pre-mapped to its 5×5 index
  outside. 3×3 wins on (rare) same-pixel collisions, matching the
  sequential reference's write order.
- sources are clamped into the 2-px ROI interior exactly like the XLA
  ``_pick_neighbor``/``_shift_clamped`` path: the wrapper replicates the
  ROI-interior border outward before padding, so plain shifted views
  reproduce the clamp.
- write precedence matches the sequential reference: the neighbor spread
  (second loop) wins over the self write on a same-slot collision.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tracking_tpu.ops.pallas_consensus import _pad_plane_blocks, _plane_block_specs
from tracking_tpu.ops.pallas_fill import _roll

BH, BW = 16, 256

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
    """Map a 3×3 offset draw (0..8) to its unified 5×5 index — an 8-way
    select chain (a table gather over [H, W] indices costs ~25 ms)."""
    out = jnp.zeros_like(o3)
    for k, u in enumerate(NB3_IN_NB5):
        out = jnp.where(o3 == k, u, out)
    return out


def _view(get_blk, dx, dy, interp):
    """Tile view V(p) = P(p − (dx, dy)) from the 9-block neighborhood
    (single-offset version of pallas_consensus._nb_views)."""
    sy, sx = -dy, -dx  # V(y, x) = P(y + sy, x + sx)
    i0 = jax.lax.broadcasted_iota(jnp.int32, (BH, BW), 0)
    i1 = jax.lax.broadcasted_iota(jnp.int32, (BH, BW), 1)

    def roll2(b):
        return _roll(_roll(b, -sy, 0, interp), -sx, 1, interp)

    def rowres(dj):
        c_ = roll2(get_blk(0, dj))
        if sy < 0:
            return jnp.where(i0 < -sy, roll2(get_blk(-1, dj)), c_)
        if sy > 0:
            return jnp.where(i0 >= BH - sy, roll2(get_blk(1, dj)), c_)
        return c_

    v = rowres(0)
    if sx < 0:
        v = jnp.where(i1 < -sx, rowres(-1), v)
    elif sx > 0:
        v = jnp.where(i1 >= BW - sx, rowres(1), v)
    return v


def _make_kernel(C, N, interp):
    """refs: [upd1 u8, slot1 i32, u3 i32, u5 i32, slot3 i32, slot5 i32,
              fires blocks×9 (u8: bit0=3×3 fire, bit1=5×5 fire),
              packed blocks×9×C (i32: plane | intra<<8),
              colors×C, descs×C (aliased outputs)]"""

    def kernel(*refs):
        upd1 = refs[0][...] != 0
        slot1 = refs[1][...]
        u3 = refs[2][...]
        u5 = refs[3][...]
        slot3 = refs[4][...]
        slot5 = refs[5][...]
        own = [refs[6 + c][...] for c in range(C)]

        def fire_blk(di, dj):
            return refs[6 + C + (di + 1) * 3 + (dj + 1)][...].astype(jnp.int32)

        def packed_blk(c, di, dj):
            return refs[15 + C + 9 * c + (di + 1) * 3 + (dj + 1)][...]

        base = 15 + C + 9 * C
        col_in = refs[base : base + C]
        desc_in = refs[base + C : base + 2 * C]
        col_out = refs[base + 2 * C : base + 3 * C]
        desc_out = refs[base + 3 * C : base + 4 * C]

        # -- spread pick: fire tests, then one unified value pick ------------
        f = jnp.bool_(False)
        ok3 = jnp.full((BH, BW), f)
        ok5 = jnp.full((BH, BW), f)
        for k, (dx, dy) in enumerate(NB5):
            fv = _view(fire_blk, dx, dy, interp)
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
                nbv[c] = jnp.where(sel, _view(partial(packed_blk, c), dx, dy, interp), nbv[c])
        nb_col = [(v & 0xFF).astype(col_in[0].dtype) for v in nbv]
        nb_desc = [((v >> 8) & 0xFFFF).astype(desc_in[0].dtype) for v in nbv]

        own_col = [(v & 0xFF).astype(col_in[0].dtype) for v in own]
        own_desc = [((v >> 8) & 0xFFFF).astype(desc_in[0].dtype) for v in own]

        # -- in-place slot writes --------------------------------------------
        def body(j, _):
            w1 = upd1 & (slot1 == j)
            w2 = okn & (slotn == j)
            for c in range(C):
                cur = col_in[c][j]
                col_out[c][j] = jnp.where(w2, nb_col[c], jnp.where(w1, own_col[c], cur))
                curd = desc_in[c][j]
                desc_out[c][j] = jnp.where(w2, nb_desc[c], jnp.where(w1, own_desc[c], curd))
            return 0

        jax.lax.fori_loop(0, N, body, 0)

    return kernel


def _interior_rep(a, border: int = 2):
    """Replicate the ROI-interior edge outward (``_shift_clamped`` parity)."""
    return jnp.pad(a[border:-border, border:-border], border, mode="edge")


@partial(jax.jit, static_argnames=("interpret",))
def bank_update_pallas(
    upd1, slot1, fires, u3, u5, slot3, slot5, planes, intras, colors, descs,
    interpret: bool = False,
):
    """Apply self+spread writes in place (banks aliased), picking spread
    values in-kernel.

    upd1: [H, W] bool self-write mask; slot1 its slot. fires: [H, W] u8
    source fire bits (bit0 = 3×3 spread fired, bit1 = 5×5). u3/u5: the
    destination's offset draws as unified 5×5 indices (u3 pre-mapped via
    :func:`nb3_to_nb5_idx`). slot3/slot5: spread slot draws. planes/intras:
    C-tuples of [H, W] u8/u16 current-frame values. colors/descs: C-tuples
    of [N, H, W] u8/u16 banks (donated). Returns updated (colors, descs)."""
    C = len(planes)
    N = colors[0].shape[0]
    H, W = upd1.shape
    ph, pw = (-H) % BH, (-W) % BW
    Hp, Wp = H + ph, W + pw

    def pad2(a):
        return jnp.pad(a, ((0, ph), (0, pw)))

    def pad3(a):
        return jnp.pad(a, ((0, 0), (0, ph), (0, pw)))

    own_packed = tuple(
        planes[c].astype(jnp.int32) | (intras[c].astype(jnp.int32) << 8)
        for c in range(C)
    )
    packed = tuple(_interior_rep(x) for x in own_packed)
    fires_rep = _interior_rep(fires.astype(jnp.uint8))

    args = (
        (
            pad2(upd1.astype(jnp.uint8)),
            pad2(slot1.astype(jnp.int32)),
            pad2(u3.astype(jnp.int32)),
            pad2(u5.astype(jnp.int32)),
            pad2(slot3.astype(jnp.int32)),
            pad2(slot5.astype(jnp.int32)),
        )
        + tuple(pad2(x) for x in own_packed)
        + tuple(pb for pb in (_pad_plane_blocks(fires_rep, Hp, Wp),) * 9)
        + tuple(
            pb for c in range(C) for pb in (_pad_plane_blocks(packed[c], Hp, Wp),) * 9
        )
        + tuple(pad3(x) for x in colors)
        + tuple(pad3(x) for x in descs)
    )

    grid = (Hp // BH, Wp // BW)
    spec2 = pl.BlockSpec((BH, BW), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    spec_bank = pl.BlockSpec(
        (N, BH, BW), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
    )

    n_plane = 6 + C + 9 + 9 * C
    in_specs = (
        [spec2] * (6 + C)
        + _plane_block_specs() * (1 + C)
        + [spec_bank] * (2 * C)
    )
    out_shape = [jax.ShapeDtypeStruct((N, Hp, Wp), colors[0].dtype)] * C + [
        jax.ShapeDtypeStruct((N, Hp, Wp), descs[0].dtype)
    ] * C
    out_specs = [spec_bank] * (2 * C)
    aliases = {n_plane + k: k for k in range(2 * C)}

    outs = pl.pallas_call(
        _make_kernel(C, N, interpret),
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
