"""Pallas TPU kernel: fused GMG histogram step (find / decide / update).

The XLA formulation (bgs/gmg.py) is ~20 elementwise/reduce passes over the
[K=64, H, W] color+weight banks — cumsum, masked sums, shift-selects and the
normalization each break fusion, so ~5 GB of state traffic flows through HBM
per 720p frame (measured 6.5 ms ≈ 154 fps end-to-end). Here the whole list
update runs per tile in VMEM: banks cross HBM exactly once per direction
(472 MB read + 472 MB write ≈ 1.2 ms at the v5e HBM peak).

Formula-for-formula identical to bgs/gmg.py with two deliberate deviations:

- ``upto_first`` comes from a min-reduced first-find index instead of an
  axis-0 cumsum (same value — ``found`` is one-hot per pixel; Mosaic has no
  cheap major-axis cumsum);
- sums that can carry more than one nonzero term (the normalization
  ``total``) may differ from XLA by reassociation ulps — exactly the
  tolerance bgs/gmg.py already documents for its own tree reductions. The
  one-hot sums (``w_match``, ``front_w``) are exact in any order (adding
  exact zeros), so decisions match XLA's bit-for-bit between norm events.

Colors travel as i32 bitcasts (u32 vector compares are equality-only here;
the 0xFFFFFFFF empty sentinel is -1). Banks are donated/aliased like the
SuBSENSE consensus banks.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BH, BW = 16, 256


def _make_kernel(K: int, lr: float, prior: float, thr: float, init_frames: int):
    def kernel(
        t_ref, code_ref, nf_ref, colors_ref, weights_ref,
        fg_ref, nf_out, colors_out, weights_out,
    ):
        # Mosaic: no i1 vector logic ("unsupported target bitwidth for
        # truncation") — every mask is i32 0/1 (& | * on 0/1 are the logical
        # ops, as in the fill/CC raster kernels); comparisons appear only as
        # direct `where` predicates.
        t = t_ref[0, 0]
        training_i = (t < init_frames).astype(jnp.int32)  # scalar
        end_train_i = (t == init_frames - 1).astype(jnp.int32)
        tf = training_i.astype(jnp.float32)

        code = code_ref[...]  # [BH, BW] i32 (bitcast u32 codes)
        nf = nf_ref[...]
        colors = colors_ref[...]  # [K, BH, BW] i32
        weights = weights_ref[...]
        kidx = jax.lax.broadcasted_iota(jnp.int32, (K, BH, BW), 0)

        found = (colors == code[None]).astype(jnp.int32) * (
            nf[None] > kidx
        ).astype(jnp.int32)
        # first-find index (K where none): found is one-hot per pixel
        fi = jnp.min(jnp.where(found != 0, kidx, K), axis=0)
        upto_first = (kidx <= fi[None]).astype(jnp.int32)
        has = (fi < K).astype(jnp.int32)

        # inference (bgs/gmg.py:106-110) — w_match is a one-hot sum: exact
        w_match = jnp.sum(jnp.where(found != 0, weights, 0.0), axis=0)
        post = (w_match * prior) / (
            w_match * prior + (1.0 - w_match) * (1.0 - prior)
        )
        is_fg = (1 - training_i) * ((1.0 - post) > thr).astype(jnp.int32)
        fg_ref[...] = is_fg * 255

        # histogram update (bgs/gmg.py:112-139)
        insert_w = tf * 1.0 + (1.0 - tf) * lr
        dec = weights * (tf + (1.0 - tf) * (1.0 - lr))
        front_w = insert_w + jnp.sum(jnp.where(found != 0, dec, 0.0), axis=0)
        full = (nf >= K).astype(jnp.int32)
        use_front = has | full
        appended = 1 - use_front
        row0 = (kidx == 0).astype(jnp.int32)
        prev_c = jnp.concatenate([colors[:1], colors[:-1]], axis=0)
        prev_w = jnp.concatenate([dec[:1], dec[:-1]], axis=0)
        shift = jnp.where(
            row0 != 0,
            use_front[None],
            (has[None] & upto_first) | ((1 - has) & full)[None],
        )
        src_c = jnp.where(row0 != 0, code[None], prev_c)
        src_w = jnp.where(row0 != 0, front_w[None], prev_w)
        new_colors = jnp.where(shift != 0, src_c, colors)
        new_weights = jnp.where(shift != 0, src_w, dec)
        at_append = appended[None] * (nf[None] == kidx).astype(jnp.int32)
        new_colors = jnp.where(at_append != 0, code[None], new_colors)
        new_weights = jnp.where(at_append != 0, front_w, new_weights)
        nf1 = nf + appended

        do_norm = (appended * (1 - training_i)) | end_train_i
        total = jnp.sum(
            jnp.where(nf1[None] > kidx, new_weights, 0.0), axis=0
        )
        new_weights = jnp.where(
            do_norm[None] != 0,
            new_weights / jnp.maximum(total, 1e-20)[None],
            new_weights,
        )

        nf_out[...] = nf1
        colors_out[...] = new_colors
        weights_out[...] = new_weights

    return kernel


@partial(
    jax.jit,
    static_argnames=("lr", "prior", "thr", "init_frames", "interpret"),
)
def gmg_step_pallas(
    code, nf, colors, weights, t,
    *, lr: float, prior: float, thr: float, init_frames: int,
    interpret: bool = False,
):
    """One fused GMG step. code [H, W] u32, nf [H, W] i32, colors [K, H, W]
    u32, weights [K, H, W] f32, t scalar i32. Returns (fg_raw [H, W] i32
    0/255 pre-median, nf1, new_colors, new_weights)."""
    K, H, W = colors.shape
    ph, pw = (-H) % BH, (-W) % BW
    Hp, Wp = H + ph, W + pw

    pad2 = lambda a, v=0: jnp.pad(a, ((0, ph), (0, pw)), constant_values=v)
    pad3 = lambda a, v=0: jnp.pad(
        a, ((0, 0), (0, ph), (0, pw)), constant_values=v
    )

    args = (
        jnp.asarray(t, jnp.int32).reshape(1, 1),
        # padded pixels: code -1 (sentinel mismatch), nf 0 (empty list) —
        # their lists stay empty and fg is sliced away
        pad2(code.view(jnp.int32) if code.dtype == jnp.uint32 else code, -1),
        pad2(nf),
        pad3(colors.view(jnp.int32)),
        pad3(weights),
    )

    grid = (Hp // BH, Wp // BW)
    spec2 = pl.BlockSpec((BH, BW), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    spec_bank = pl.BlockSpec(
        (K, BH, BW), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
    )
    spec_scalar = pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)

    fg, nf1, new_colors, new_weights = pl.pallas_call(
        _make_kernel(K, lr, prior, thr, init_frames),
        grid=grid,
        in_specs=[spec_scalar, spec2, spec2, spec_bank, spec_bank],
        out_specs=[spec2, spec2, spec_bank, spec_bank],
        out_shape=[
            jax.ShapeDtypeStruct((Hp, Wp), jnp.int32),
            jax.ShapeDtypeStruct((Hp, Wp), jnp.int32),
            jax.ShapeDtypeStruct((K, Hp, Wp), jnp.int32),
            jax.ShapeDtypeStruct((K, Hp, Wp), jnp.float32),
        ],
        input_output_aliases={3: 2, 4: 3},
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)
    return (
        fg[:H, :W],
        nf1[:H, :W],
        new_colors[:, :H, :W].view(jnp.uint32),
        new_weights[:, :H, :W],
    )
