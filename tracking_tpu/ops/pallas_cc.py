"""Pallas TPU kernel: connected-component min-label propagation by raster.

The XLA ``label_components`` (ops/cc.py) converges via pointer-jumping label
compressions — [H, W]-sized gathers, ~25 ms each on this TPU — measuring
~37 ms/frame at 720p, which made blob tracking 8× slower than the entire
BGS step. This kernel is the min-plus twin of the flood-fill raster kernel
(ops/pallas_fill.py): a TPU core executes grid steps sequentially, so a
raster-ordered grid propagates minimum labels across tiles in one pass,
each tile converging locally in VMEM with 4-direction masked min-scans
(log-depth doubling) plus a 3×3 neighbor-min for diagonal coupling.

Exactness: labels only decrease and the fixed point (per-component minimum
pixel index) is unique, so forward+backward passes repeated to a fixed
point by an outer ``lax.while_loop`` give EXACTLY the XLA result — the
parity test asserts array equality. Tile-corner-only diagonal adjacency is
deliberately not carried across tiles within a pass; the outer fixed-point
loop resolves it (costs one extra round on adversarial masks).

The min-scan is the (m, v) min-plus transform of cc._masked_min_scan:
y_j = fg_j ? min(lab_j, y_{j−1}) : big, composed by prefix doubling with
saturating adds (all values ≤ big = H·W, far from i32 overflow).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BH, BW = 64, 256


def _shift(a, k, axis, fill, interp):
    """Shift by k (±) along axis with constant fill (static k).

    Roll + iota mask instead of jnp.pad: lane-dim pads lower to
    tpu.concatenate, which trips a Mosaic layout bug ("result/input offset
    mismatch") when the kernel is compiled inside larger programs.
    pltpu.roll has no interpret rule, hence the jnp.roll fallback."""
    kk = k % a.shape[axis]  # pltpu.roll requires a non-negative shift
    r = jnp.roll(a, kk, axis) if interp else pltpu.roll(a, kk, axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, a.shape, axis)
    if k >= 0:
        return jnp.where(idx < k, fill, r)
    return jnp.where(idx >= a.shape[axis] + k, fill, r)


def _masked_min_scan(lab, m, big, axis, sign, interp):
    """y_j = min over i⪯j (same fg run) of lab_i; sign=+1 forward, −1 bwd.

    (m, v) min-plus prefix doubling: m = 0 on fg / big off; compose
    (m1,v1)∘(m2,v2) = (min(m1+m2,big), min(min(v1+m2,big), v2))."""
    P, V = m, jnp.minimum(lab + m, big)
    n = lab.shape[axis]
    k = 1
    while k < n:
        Ps = _shift(P, sign * k, axis, big, interp)
        Vs = _shift(V, sign * k, axis, big, interp)
        V = jnp.minimum(jnp.minimum(Vs + P, big), V)
        P = jnp.minimum(Ps + P, big)
        k *= 2
    return V


def _neighbor_min(lab, big, conn8, interp):
    out = lab
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            if not conn8 and dy != 0 and dx != 0:
                continue
            out = jnp.minimum(
                out, _shift(_shift(lab, dy, 0, big, interp), dx, 1, big, interp)
            )
    return out


def _local_converge(lab, m, big, conn8, interp):
    """Iterate sweeps until the tile is stable. lab: i32 labels (big off-fg)."""

    def body(state):
        lab, _ = state
        new = lab
        for axis in (1, 0):
            for sign in (1, -1):
                new = jnp.minimum(
                    new, _masked_min_scan(new, m, big, axis, sign, interp)
                )
        new = jnp.minimum(
            new, jnp.minimum(_neighbor_min(new, big, conn8, interp) + m, big)
        )
        return new, jnp.any(new != lab)

    def cond(state):
        return state[1]

    lab, _ = jax.lax.while_loop(cond, body, (lab, jnp.bool_(True)))
    return lab


def _make_kernel(big, conn8, interp):
    def kernel(first_ref, lab_in, lab_out, bot_row, right_col):
        i = pl.program_id(0)
        j = pl.program_id(1)
        first = first_ref[0, 0]
        lab = lab_in[...]
        # fg encoded in the labels: off-fg pixels carry `big`
        m = jnp.where(lab >= big, big, 0)

        # boundary injection from already-processed neighbors; scratch is
        # garbage before its first writer → gate by adding big (identity
        # for min) when out of range. For 8-connectivity the carried row /
        # column also couples through ±1 shifts.
        # multiplicative gating: scratch garbage may be negative, so zero it
        # out before adding the out-of-range sentinel
        g_t = (i > 0).astype(jnp.int32)
        g_l = (j > 0).astype(jnp.int32)
        top = jnp.minimum(bot_row[j][0, :] * g_t + (1 - g_t) * big, big)
        left = jnp.minimum(
            jnp.min(right_col[...], axis=1) * g_l + (1 - g_l) * big, big
        )
        top2d = top[None, :]
        cand_t = top2d
        left2d = left[:, None]
        cand_l = left2d
        if conn8:
            cand_t = jnp.minimum(
                cand_t,
                jnp.minimum(
                    _shift(top2d, 1, 1, big, interp),
                    _shift(top2d, -1, 1, big, interp),
                ),
            )
            cand_l = jnp.minimum(
                cand_l,
                jnp.minimum(
                    _shift(left2d, 1, 0, big, interp),
                    _shift(left2d, -1, 0, big, interp),
                ),
            )
        row0 = jax.lax.broadcasted_iota(jnp.int32, (BH, BW), 0) == 0
        col0 = jax.lax.broadcasted_iota(jnp.int32, (BH, BW), 1) == 0
        inj_t = jnp.where(row0, jnp.broadcast_to(cand_t, (BH, BW)), big)
        inj_l = jnp.where(col0, jnp.broadcast_to(cand_l, (BH, BW)), big)
        lab = jnp.minimum(lab, jnp.minimum(jnp.minimum(inj_t, inj_l) + m, big))

        # Injection-skip (exact): except on the very first pass, every tile
        # enters already locally converged (its convergence ran when it was
        # last visited and nothing else wrote it since), so if the boundary
        # injection lowered no pixel the sweep would be the identity — skip
        # it. Turns the fixed-point-confirm round into injection-only work.
        # On the first pass only non-empty tiles need converging (an all-bg
        # tile is all `big` = already at its fixed point).
        changed = ((first != 0) & jnp.any(m == 0)) | jnp.any(lab != lab_in[...])
        lab = jax.lax.cond(
            changed,
            lambda l: _local_converge(l, m, big, conn8, interp),
            lambda l: l,
            lab,
        )

        lab_out[...] = lab
        bot_row[j] = jnp.broadcast_to(lab[BH - 1 :, :], (8, BW))
        lane = jax.lax.broadcasted_iota(jnp.int32, (BH, BW), 1)
        last_col = jnp.min(jnp.where(lane == BW - 1, lab, big), axis=1, keepdims=True)
        right_col[...] = jnp.broadcast_to(last_col, (BH, 128))

    return kernel


def _raster_pass(lab, big, conn8, interpret, first):
    Hp, Wp = lab.shape
    grid = (Hp // BH, Wp // BW)
    spec = pl.BlockSpec((BH, BW), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    spec_scalar = pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)
    return pl.pallas_call(
        _make_kernel(big, conn8, interpret),
        grid=grid,
        in_specs=[spec_scalar, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((Wp // BW, 8, BW), jnp.int32),
            pltpu.VMEM((BH, 128), jnp.int32),
        ],
        input_output_aliases={1: 0},
        interpret=interpret,
    )(jnp.asarray(first, jnp.int32).reshape(1, 1), lab)


@partial(jax.jit, static_argnames=("connectivity", "interpret"))
def label_components_pallas(
    mask: jnp.ndarray, connectivity: int = 8, interpret: bool = False
) -> jnp.ndarray:
    """Exact equivalent of cc.label_components (bg = −1, labels = component
    min pixel index), via sequential tile-raster min propagation."""
    H, W = mask.shape
    big = H * W
    conn8 = connectivity == 8
    ph, pw = (-H) % BH, (-W) % BW
    fg = jnp.pad(mask > 0, ((0, ph), (0, pw)))
    iota = jax.lax.broadcasted_iota(jnp.int32, fg.shape, 0) * (W + pw) + (
        jax.lax.broadcasted_iota(jnp.int32, fg.shape, 1)
    )
    # label space uses the PADDED width so iota stays row-major-consistent;
    # converted back at the end
    bigp = (H + ph) * (W + pw)
    lab = jnp.where(fg, iota, bigp)

    def round_(lab, it):
        lab = _raster_pass(lab, bigp, conn8, interpret, (it == 0).astype(jnp.int32))
        lab = jnp.flip(
            _raster_pass(jnp.flip(lab, (0, 1)), bigp, conn8, interpret, 0),
            (0, 1),
        )
        return lab

    def at_fixed_point(lab):
        """Exact global fixed-point test, in plain XLA (~no cost next to a
        raster pass): labels are at the fixed point iff no fg pixel has a
        connected neighbor with a smaller label — every in-kernel sweep
        (run min-scans included) only moves labels between adjacent fg
        pixels, so the neighbor condition implies nothing can decrease.
        Replaces the old confirm-by-identical-round, which re-dispatched
        two full raster passes per frame just to observe no change."""
        m = jnp.where(lab >= bigp, bigp, 0)
        best = lab
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if (dy == 0 and dx == 0) or (not conn8 and dy != 0 and dx != 0):
                    continue
                s = jnp.roll(lab, (dy, dx), (0, 1))
                iy = jax.lax.broadcasted_iota(jnp.int32, lab.shape, 0)
                ix = jax.lax.broadcasted_iota(jnp.int32, lab.shape, 1)
                oob = jnp.zeros_like(lab, jnp.bool_)
                if dy > 0:
                    oob |= iy < dy
                elif dy < 0:
                    oob |= iy >= lab.shape[0] + dy
                if dx > 0:
                    oob |= ix < dx
                elif dx < 0:
                    oob |= ix >= lab.shape[1] + dx
                best = jnp.minimum(best, jnp.where(oob, bigp, s))
        return ~jnp.any(jnp.minimum(best + m, bigp) < lab)

    def body(state):
        lab, _, it = state
        new = round_(lab, it)
        return new, ~at_fixed_point(new), it + 1

    def cond(state):
        return state[1] & (state[2] < 64)

    lab, _, _ = jax.lax.while_loop(
        cond, body, (lab, jnp.bool_(True), jnp.zeros((), jnp.int32))
    )
    lab = lab[:H, :W]
    # padded-width linear index → true row-major index over [H, W]
    y, x = lab // (W + pw), lab % (W + pw)
    out = y * W + x
    return jnp.where(lab >= bigp, -1, out)


@partial(jax.jit, static_argnames=("big", "connectivity", "interpret"))
def label_fixpoint_pallas(
    fg: jnp.ndarray,
    lab0: jnp.ndarray,
    big: int,
    connectivity: int = 8,
    interpret: bool = False,
):
    """Min-label fixpoint from ARBITRARY initial labels (cc.label_fixpoint's
    TPU twin, used by the spatially-sharded CC in parallel/spatial.py where
    label values are global row-major indices over the full image and
    boundary rows arrive freshly injected from neighbor shards).

    ``lab0``: [H, W] i32, any row-major-order-consistent values < ``big``;
    background must carry ``big``. Every raster pass runs with first=1 on
    the opening pass — injected labels make tiles enter locally UNconverged,
    which the in-kernel injection-skip (tuned for self-seeded iota labels)
    must not skip. Returns ``(labels, converged)`` — labels with background
    still at ``big``, and a bool that is False iff the 64-round cap was hit
    while labels were still changing (pathological spiral components); the
    sharded caller folds ``~converged`` into its psum'd ``changed`` flag so
    a capped local pass forces another global round instead of silently
    ending with wrong labels.
    """
    H, W = fg.shape
    conn8 = connectivity == 8
    ph, pw = (-H) % BH, (-W) % BW
    fgp = jnp.pad(fg > 0, ((0, ph), (0, pw)))
    lab = jnp.where(fgp, jnp.pad(lab0, ((0, ph), (0, pw)), constant_values=big), big)

    def round_(lab, it):
        lab = _raster_pass(lab, big, conn8, interpret, (it == 0).astype(jnp.int32))
        lab = jnp.flip(
            _raster_pass(jnp.flip(lab, (0, 1)), big, conn8, interpret, 0),
            (0, 1),
        )
        return lab

    def at_fixed_point(lab):
        m = jnp.where(lab >= big, big, 0)
        best = lab
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if (dy == 0 and dx == 0) or (not conn8 and dy != 0 and dx != 0):
                    continue
                s = jnp.roll(lab, (dy, dx), (0, 1))
                iy = jax.lax.broadcasted_iota(jnp.int32, lab.shape, 0)
                ix = jax.lax.broadcasted_iota(jnp.int32, lab.shape, 1)
                oob = jnp.zeros_like(lab, jnp.bool_)
                if dy > 0:
                    oob |= iy < dy
                elif dy < 0:
                    oob |= iy >= lab.shape[0] + dy
                if dx > 0:
                    oob |= ix < dx
                elif dx < 0:
                    oob |= ix >= lab.shape[1] + dx
                best = jnp.minimum(best, jnp.where(oob, big, s))
        return ~jnp.any(jnp.minimum(best + m, big) < lab)

    def body(state):
        lab, _, it = state
        new = round_(lab, it)
        return new, ~at_fixed_point(new), it + 1

    def cond(state):
        return state[1] & (state[2] < 64)

    lab, still_changing, _ = jax.lax.while_loop(
        cond, body, (lab, jnp.bool_(True), jnp.zeros((), jnp.int32))
    )
    return lab[:H, :W], ~still_changing
