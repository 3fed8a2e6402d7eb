"""Pallas TPU kernel: DPTexture windowed LBP histograms + intersection.

Fuses the hot middle of DPTextureBGS (``package_bgs/dp/TextureBGS.h:46-54``:
``Histogram`` → ``ProximityMeasure``/``BgsCompare``) into one VMEM-resident
pass: per-channel 64-bin histograms of 6-bit LBP codes over the 11×11 region
window, plus the histogram-intersection proximity against the model. The XLA
formulation (``bgs/texture.py:_region_hist``) materializes 64 one-hot planes
×3 channels through two u8 reduce_window chains — ~700 MB of HBM
intermediates per frame that this kernel keeps in registers, plus the
[3, 64, H, W] widened min/sum of the proximity pass.

Layout: counts for 4 bins ride one i32 word as SWAR byte lanes (window
counts ≤ 121 < 128, so byte lanes never carry and the high bit stays free
for the borrow trick). Per packed word the kernel does 4 compares to build
the packed one-hot, prefix-doubled shifted adds for the 11-wide row/column
window sums (5 adds instead of 10 each), a borrow-free SWAR byte min against
the packed model, and a byte-pair accumulate for the intersection sum —
~4× fewer VPU ops than unpacked i32 per-bin arithmetic.

Out-of-image positions use a sentinel code 255 (> 63): they match no bin,
which reproduces the XLA path's zero-padded one-hot exactly (code 0 inside
the image is a real bin and must keep contributing).

Grid: (row tiles, channel); the channel axis is minor so the [TH, W]
proximity output block stays VMEM-resident and accumulates across the three
channel steps. Bit-exact vs the XLA path (tests/test_pallas_texture.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH = 16  # output rows per grid step
REGION_R = 5
K = 2 * REGION_R + 1  # 11
NUM_BINS = 64
NWORDS = NUM_BINS // 4

# plain ints (jnp scalars would be captured consts under pallas_call)
_HI = -2139062144  # 0x80808080 as int32
_ONE = 0x01010101
_M8 = 0x00FF00FF


def _roll(a, k, axis, interp):
    """Circular shift toward lower indices by k (k ≥ 0). pltpu.roll on
    hardware, jnp.roll in interpret mode (no interpret rule for pltpu.roll).
    Wrapped garbage is confined to rows ≥ TH + 6 / lanes ≥ W + 10 of the
    band, outside every slice the kernel keeps (see the band geometry
    notes in texture_prox_cur_pallas)."""
    kk = (-k) % a.shape[axis]
    if interp:
        return jnp.roll(a, kk, axis)
    return pltpu.roll(a, kk, axis)


def _win11(v, axis, interp):
    """y[i] = Σ_{d=0..10} v[i+d] via prefix doubling: 5 adds, 5 rolls."""
    s2 = v + _roll(v, 1, axis, interp)
    s4 = s2 + _roll(s2, 2, axis, interp)
    s8 = s4 + _roll(s4, 4, axis, interp)
    return s8 + _roll(s2, 8, axis, interp) + _roll(v, 10, axis, interp)


def _make_kernel(wp, interp):
    def kernel(band_ref, model_ref, prox_ref, cur_ref):
        c = pl.program_id(1)
        band = band_ref[0, 0].astype(jnp.int32)  # [TH+16, WB]
        acc16 = jnp.zeros((TH, wp), jnp.int32)  # byte-pair sums in 16-bit lanes
        for w in range(NWORDS):
            # packed one-hot: byte lane k ← (code == 4w+k)
            v = (band == 4 * w).astype(jnp.int32)
            for k in (1, 2, 3):
                v = v + ((band == 4 * w + k).astype(jnp.int32) << (8 * k))
            r11 = _win11(v, 0, interp)[:TH]  # row window, keep output rows
            cnt = _win11(r11, 1, interp)[:, :wp]  # col window, drop halo lanes
            # packed model bytes for the same 4 bins
            mp = model_ref[0, 4 * w].astype(jnp.int32)
            for k in (1, 2, 3):
                mp = mp + (model_ref[0, 4 * w + k].astype(jnp.int32) << (8 * k))
            # SWAR byte min (all bytes ≤ 121, high bits clear): borrow-free
            # per-byte a≥b via (a|0x80)−b, mask to 0xFF lanes, select.
            d = (mp | _HI) - cnt
            ge = jax.lax.shift_right_logical(d, 7) & _ONE  # 1 where model ≥ cur
            msk = ge * 255
            mn = (cnt & msk) | (mp & ~msk)
            acc16 = acc16 + (mn & _M8) + (jax.lax.shift_right_logical(mn, 8) & _M8)
            for k in range(4):
                cur_ref[0, 4 * w + k] = (
                    jax.lax.shift_right_logical(cnt, 8 * k) & 255
                ).astype(jnp.uint8)
        ch_prox = (acc16 & 0xFFFF) + jax.lax.shift_right_logical(acc16, 16)

        @pl.when(c == 0)
        def _():
            prox_ref[...] = ch_prox

        @pl.when(c != 0)
        def _():
            prox_ref[...] = prox_ref[...] + ch_prox

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def texture_prox_cur_pallas(codes, model, interpret: bool = False):
    """codes [3, H, W] u8 (LBP codes, 2-px border already zeroed), model
    [3, 64, H, W] u8 → (prox [H, W] i32, cur [3, 64, H, W] u8).

    prox = Σ_{ch, bin} min(model, cur) — the histogram-intersection sum of
    ``TextureBGS.cpp:90-134``; cur = the 11×11 windowed histograms."""
    _, H, W = codes.shape
    hp = (-H) % TH
    wp = (-W) % 128
    Hp, Wp = H + hp, W + wp
    nr = Hp // TH
    wb = Wp + 128  # band lanes: Wp + 10 halo cols, rounded to the lane tile

    # Sentinel-padded code plane: bands of TH+16 rows slide over it at
    # stride TH; band row r+5 / col x+5 is image row/col r/x of the tile.
    padded = jnp.full((3, Hp + 16, wb), 255, jnp.uint8)
    padded = jax.lax.dynamic_update_slice(padded, codes, (0, 5, 5))
    bands = jnp.stack([padded[:, r * TH : r * TH + TH + 16] for r in range(nr)])

    model_p = jnp.pad(model, ((0, 0), (0, 0), (0, hp), (0, wp)))

    grid = (nr, 3)
    band_spec = pl.BlockSpec(
        (1, 1, TH + 16, wb), lambda i, c: (i, c, 0, 0), memory_space=pltpu.VMEM
    )
    bank_spec = pl.BlockSpec(
        (1, NUM_BINS, TH, Wp), lambda i, c: (c, 0, i, 0), memory_space=pltpu.VMEM
    )
    prox_spec = pl.BlockSpec((TH, Wp), lambda i, c: (i, 0), memory_space=pltpu.VMEM)

    prox, cur = pl.pallas_call(
        _make_kernel(Wp, interpret),
        grid=grid,
        in_specs=[band_spec, bank_spec],
        out_specs=[prox_spec, bank_spec],
        out_shape=[
            jax.ShapeDtypeStruct((Hp, Wp), jnp.int32),
            jax.ShapeDtypeStruct((3, NUM_BINS, Hp, Wp), jnp.uint8),
        ],
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(bands, model_p)
    return prox[:H, :W], cur[:, :, :H, :W]
