"""Pallas TPU kernel: fused FGD Bayes-table phase.

One VMEM-resident pass over the whole per-pixel table phase of the FGD
model (OpenCV legacy ``CV_BG_MODEL_FGD``; see bgs/fgd.py): exact-match of
the quantized color / co-occurrence keys against both tables, the
top-N1-by-P Bayes classification, the foreground-absorption relabel, and
the decay + reinforce/replace update of every entry. The XLA formulation
(``bgs/fgd.py:_tables_phase`` on full maps) re-materializes the ~585 B/px
of table state between fusions — this kernel streams the state through
VMEM tiles once per frame in each direction (the playbook of
ops/pallas_texture.py and ops/pallas_multilayer.py).

The kernel body IS ``_tables_phase`` — the same function object the XLA
path calls, applied to [TH, TW] tiles with ``in_kernel=True`` selecting
Mosaic-lowerable formulations (unrolled first-match/argmin, i32 key
compares) whose exact boolean/integer semantics match the vectorized XLA
forms — so the two paths are bit-identical (tests/test_pallas_fgd.py).

A/B VERDICT (round 5, 720p motion window, table phase w/o post-proc):
the kernel measured 6.81 ms vs the XLA formulation's ~3.8 — a REGRESSION,
kept opt-in only. Mosaic has no u8 vector compares, so the ~315 per-pixel
key compares run i32-widened at 1/4 lane density, which outweighs the
saved inter-fusion state traffic; XLA already fuses the whole elementwise
table DAG into a handful of passes. TRACKING_TPU_FGD=pallas opts in;
the default stays the XLA path.

Tiles are (32, 128) — the u8 key slabs set the sublane tile; f16 stats
(16, 128) and i32/u8 maps divide it evenly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os
TH = int(os.environ.get("FGD_TH", "32"))  # u8 sublane tile
TW = int(os.environ.get("FGD_TW", "128"))

# state leaves streamed through the kernel, in signature order
_LEAVES = ("ct_key", "ct_P", "ct_Pb", "cc_key", "cc_P", "cc_Pb", "fg_age")


def _make_kernel(phase, cfg):
    def kernel(sfirst_ref, *refs):
        n_in = len(_LEAVES) + 3  # leaves, ckey, cckey, changed
        ins, outs = refs[:n_in], refs[n_in:]
        st = {name: ref[...] for name, ref in zip(_LEAVES, ins)}
        ckey = ins[len(_LEAVES)][...]
        cckey = ins[len(_LEAVES) + 1][...]
        changed = ins[len(_LEAVES) + 2][...] != 0  # i32 (u8/bf16 compares unsupported)
        first = sfirst_ref[0] != 0
        out, is_bg, lab_bg = phase(cfg, st, ckey, cckey, changed, first, in_kernel=True)
        for i, name in enumerate(_LEAVES):
            outs[i][...] = out[name]
        outs[len(_LEAVES)][...] = is_bg.astype(jnp.int32)
        outs[len(_LEAVES) + 1][...] = lab_bg.astype(jnp.int32)

    return kernel


def fgd_tables_pallas(
    phase, cfg, state, ckey, cckey, changed, first, interpret: bool = False
):
    """Run ``phase`` (= bgs.fgd._tables_phase) tiled over the image.

    state: the FGD state pytree (its _TABLE_LEAVES are streamed); ckey
    [C, H, W] u8, cckey [2C, H, W] u8, changed [H, W] bool, first traced
    scalar bool. Returns (updates dict, is_bg bool, lab_bg bool)."""
    H, W = changed.shape
    hp, wp = (-H) % TH, (-W) % TW
    Hp, Wp = H + hp, W + wp
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

    arrays = (
        [padded(state[k]) for k in _LEAVES]
        + [padded(ckey), padded(cckey), padded(changed.astype(jnp.int32))]
    )
    out_arrays = arrays[: len(_LEAVES)]
    mask_shape = jax.ShapeDtypeStruct((Hp, Wp), jnp.int32)
    out_shape = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in out_arrays] + [
        mask_shape,
        mask_shape,
    ]
    mask_spec = pl.BlockSpec((TH, TW), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    out_specs = [spec(a) for a in out_arrays] + [mask_spec, mask_spec]

    sfirst = jnp.reshape(jnp.int32(first), (1,))
    results = pl.pallas_call(
        _make_kernel(phase, cfg),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [spec(a) for a in arrays],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(sfirst, *arrays)

    def crop(x):
        return x[..., :H, :W] if (hp or wp) else x

    updates = {k: crop(r) for k, r in zip(_LEAVES, results)}
    is_bg = crop(results[len(_LEAVES)]) != 0
    lab_bg = crop(results[len(_LEAVES) + 1]) != 0
    return updates, is_bg, lab_bg
