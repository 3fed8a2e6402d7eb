"""Pallas TPU kernel: fused MultiLayerBGS per-pixel frame update.

One VMEM-resident pass over the whole per-pixel model update of
``package_bgs/jmo/CMultiLayerBGS.cpp:375-800`` (layer removal, per-mode
texture/color distances, the match / no-match / seed branch blend, displaced
-layer compaction, the weight sort network and bg_num re-scan). The XLA
formulation (``bgs/multilayer.py:_ml_update`` on full maps) re-materializes
the ~440 B/pixel mode state between fusions — ~7 ms/frame at 720p against a
~1 ms read-once/write-once HBM floor; this kernel streams every state leaf
through VMEM tiles exactly once per frame (the DPTexture playbook,
``ops/pallas_texture.py``, applied to the jmo model).

The kernel body IS ``_ml_update`` — the same function object the XLA path
calls, applied to [TH, TW] tiles read from the block refs (every op in it
is pointwise over pixels, so tiling is exact and the two paths are
bit-identical; tests/test_pallas_multilayer.py gates this on real frames).

Grid: (row tiles, col tiles); all state leaves block their trailing two
dims and keep the mode/feature axes whole. Learn-phase scalars that can be
traced (the ``detectAfter`` rate flip) ride SMEM; ``learn`` itself is a
static Python bool (it changes the traced graph).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH = 16  # f32/i32 sublane tile

# (state-leaf name, A-dict short name, #leading feature axes under the mode
# axis) — must stay in sync with bgs/multilayer.py's _LEAF_SPEC/VEC
_LEAVES = (
    ("weight", "w", 0),
    ("max_weight", "mw", 0),
    ("bg_int", "bi", 1),
    ("min_int", "mini", 1),
    ("max_int", "maxi", 1),
    ("bg_pattern", "bp", 1),
    ("bg_layer", "layer", 0),
    ("layer_time", "layt", 0),
    ("first_time", "ft", 0),
    ("last_time", "lt", 0),
    ("freq", "fq", 0),
)


def _pick_tw(wp: int) -> int:
    for tw in (640, 512, 384, 256, 128):
        if wp % tw == 0:
            return tw
    return 128


def _make_kernel(update, cfg, learn, M):
    def kernel(sf_ref, si_ref, *refs):
        nin = 2 + len(_LEAVES) + 2  # n, bg_num, leaves, cf, pat
        ins, outs = refs[:nin], refs[nin:]
        n_ref, bgn_ref = ins[0], ins[1]
        leaf_refs = ins[2 : 2 + len(_LEAVES)]
        cf_ref, pat_ref = ins[-2], ins[-1]
        A = {
            short: [ref[m] for m in range(M)]
            for ref, (_, short, _) in zip(leaf_refs, _LEAVES)
        }
        lr, wlr, imw = sf_ref[0], sf_ref[1], sf_ref[2]
        frame_idx = si_ref[0]
        A, n, bg_num, dist = update(
            cfg, A, n_ref[...], bgn_ref[...], cf_ref[...], pat_ref[...],
            lr, wlr, imw, frame_idx, learn,
        )
        outs[0][...] = n
        outs[1][...] = bg_num
        for out, (_, short, _) in zip(outs[2 : 2 + len(_LEAVES)], _LEAVES):
            for m in range(M):
                out[m] = A[short][m]
        outs[-1][...] = dist

    return kernel


def multilayer_step_pallas(
    update,
    cfg,
    state,
    cf,
    cur_pat,
    lr,
    wlr,
    imw,
    frame_idx,
    learn: bool,
    interpret: bool = False,
):
    """Run ``update`` (= bgs.multilayer._ml_update) tiled over the image.

    state: the MultiLayer state pytree (its per-mode leaves + n/bg_num);
    cf [C, H, W] f32, cur_pat [L, H, W] f32; lr/wlr/imw/frame_idx may be
    traced scalars. Returns (maps dict of new state leaves, out_dist)."""
    M = cfg.max_mode_num
    H, W = state["n"].shape
    hp, wp = (-H) % TH, (-W) % 128
    Hp, Wp = H + hp, W + wp
    TW = _pick_tw(Wp)
    grid = (Hp // TH, Wp // TW)

    def padded(x):
        pad = [(0, 0)] * (x.ndim - 2) + [(0, hp), (0, wp)]
        return jnp.pad(x, pad) if (hp or wp) else x

    def spec(x):
        nlead = x.ndim - 2
        return pl.BlockSpec(
            x.shape[:nlead] + (TH, TW),
            lambda i, j, _n=nlead: (0,) * _n + (i, j),
            memory_space=pltpu.VMEM,
        )

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    sf = jnp.stack(
        [jnp.float32(lr), jnp.float32(wlr), jnp.float32(imw)]
    )
    si = jnp.reshape(jnp.int32(frame_idx), (1,))

    arrays = (
        [padded(state["n"]), padded(state["bg_num"])]
        + [padded(state[leaf]) for leaf, _, _ in _LEAVES]
        + [padded(cf), padded(cur_pat)]
    )
    out_arrays = arrays[: 2 + len(_LEAVES)]
    out_shape = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in out_arrays] + [
        jax.ShapeDtypeStruct((Hp, Wp), jnp.float32)
    ]
    out_specs = [spec(a) for a in out_arrays] + [
        pl.BlockSpec((TH, TW), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    ]

    results = pl.pallas_call(
        _make_kernel(update, cfg, learn, M),
        grid=grid,
        in_specs=[smem, smem] + [spec(a) for a in arrays],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(sf, si, *arrays)

    def crop(x):
        return x[..., :H, :W] if (hp or wp) else x

    maps = {"n": crop(results[0]), "bg_num": crop(results[1])}
    for r, (leaf, _, _) in zip(results[2 : 2 + len(_LEAVES)], _LEAVES):
        maps[leaf] = crop(r)
    return maps, crop(results[-1])
