"""Exact integer min-cut on a 4-connected grid (Boykov–Kolmogorov parity).

Replaces the ICM relaxation in bgs/lbp_mrf.py with the reference's EXACT
semantics: ``ck/MotionDetection.cpp:1279-1321`` builds a grid graph with
``set_tweights(v, 1, (short)(8·(1−rate)))`` and unit 4-neighbor edges, runs
BK max-flow (``ck/maxflow.cpp``) and labels ``what_segment(v) == SINK`` as
foreground. Two facts make an exact TPU twin tractable:

- every capacity is a small INTEGER (the reference truncates the sink
  weight to ``short``), so arithmetic is exact in i32;
- BK cancels parallel terminal edges (``graph.cpp:72``:
  ``tr_cap = cap_source − cap_sink``), so only ``tr_cap > 0`` nodes carry
  source capacity — the preflow is small and local.

Algorithm: lock-step parallel push–relabel with global relabeling.
Phase 1 routes all routable excess to t (heights = exact residual
distance-to-t, recomputed by an iterated 4-neighbor relaxation; trapped
nodes freeze at h = n). Phase 2 returns trapped excess to s the same way
with distance-to-s heights. The answer is then the canonical cut BK
reports: ``what_segment(v) == SOURCE`` iff v is reachable from s in the
final max-flow residual (``maxflow.cpp:510`` — the source search tree is
maximal at termination; free nodes default to SINK), computed here as a
residual BFS fixpoint from the unsaturated source edges. The
source-reachable set of a max flow is flow-independent, so this matches
BK's labeling wherever the min cut is unique-side (the minimal source
set IS unique).

Validated against ``scipy.sparse.csgraph.maximum_flow`` + residual BFS on
random instances (tests/test_mincut.py) and against the compiled
reference oracle via the LbpMrf golden test.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# direction order: (dy, dx) for up, down, left, right
_DIRS = ((-1, 0), (1, 0), (0, -1), (0, 1))


def _nbr(a, dy, dx, fill):
    """Value at (y+dy, x+dx), constant-filled outside the grid."""
    H, W = a.shape
    out = jnp.roll(a, (-dy, -dx), (0, 1))
    iy = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    ok = jnp.ones(a.shape, bool)
    if dy > 0:
        ok &= iy < H - dy
    elif dy < 0:
        ok &= iy >= -dy
    if dx > 0:
        ok &= ix < W - dx
    elif dx < 0:
        ok &= ix >= -dx
    return jnp.where(ok, out, fill)


_BIG = jnp.int32(2**30)


def _shift_fill(a, k, axis, reverse, fill):
    """a shifted k positions along the scan direction (element i reads
    i−k in scan order), constant-filled at the entering edge."""
    shift = k if not reverse else -k
    out = jnp.roll(a, shift, axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, a.shape, axis)
    n = a.shape[axis]
    ok = (idx >= k) if not reverse else (idx < n - k)
    return jnp.where(ok, out, fill)


def _seg_min_scan(vals, reset, axis, reverse):
    """Segmented running min along ``axis``: out[i] = vals[i] where
    reset[i], else min(carry, vals[i]).

    Log-depth doubling over roll+iota-masked shifts — NOT
    jax.lax.associative_scan, whose slice/concat lowering measured ~6×
    slower end-to-end on the TPU at 720p (911 vs 151 ms/frame LbpMrf).
    Invariant: f_k[i] = min vals[j] for j in [max(seg_start_i, i−2^k+1), i],
    b_k[i] = ∃ reset in (i−2^k, i]."""
    f = vals
    b = reset
    k = 1
    n = vals.shape[axis]
    while k < n:
        fs = _shift_fill(f, k, axis, reverse, _BIG)
        bs = _shift_fill(b, k, axis, reverse, True)
        f = jnp.where(b, f, jnp.minimum(f, fs))
        b = b | bs
        k *= 2
    return f


def _line_pass(d, open_step, axis, reverse, inf):
    """One whole-line relaxation: f[i] = min(d[i], f[prev] + 1) along the
    scan direction, with the +1 chain broken wherever ``open_step`` is
    False (the step edge into i is missing). The linear-shift trick
    (g = d ∓ index) turns the +1-per-step min-plus recurrence into a plain
    segmented min-scan — log depth instead of one while-loop round per
    distance level."""
    idx = jax.lax.broadcasted_iota(jnp.int32, d.shape, axis)
    sgn = -1 if reverse else 1
    g = d - sgn * idx
    out = _seg_min_scan(g, ~open_step, axis, reverse)
    return jnp.minimum(d, jnp.minimum(out + sgn * idx, inf))


def _dist_via(seed_d, opens, inf):
    """Exact shortest-path distance d(v) = min(seed_d(v), 1 + min over
    open step edges into v of d(prev)) by alternating 4-direction
    whole-line sweeps (each a log-depth segmented scan) to a fixed point.
    ``opens``: (from-up, from-down, from-left, from-right) step masks in
    _DIRS order. Converges in O(path spiral depth) sweeps — the per-level
    4-neighbor relaxation this replaces cost one while-loop round per
    distance LEVEL, which at 720p (diameter ~1300) made the global
    relabel the whole cost of the LbpMrf min-cut on sparse-sink frames
    (round 5: 270 → ~4 ms/frame)."""

    def body(state):
        d, _ = state
        nd = _line_pass(d, opens[2], 1, False, inf)
        nd = _line_pass(nd, opens[3], 1, True, inf)
        nd = _line_pass(nd, opens[0], 0, False, inf)
        nd = _line_pass(nd, opens[1], 0, True, inf)
        return nd, jnp.any(nd != d)

    def cond(state):
        return state[1]

    d, _ = jax.lax.while_loop(cond, body, (seed_d, jnp.bool_(True)))
    return jnp.minimum(d, inf)


def _dist_to(seed_d, res, inf):
    """Exact residual distance toward a terminal: d(v) improves through
    v's OUTGOING residual edges (d(v) = d(nbr_i) + 1 where res[i](v) > 0,
    _DIRS order)."""
    opens = tuple(r > 0 for r in res)
    return _dist_via(seed_d, opens, inf)


def _push_phase(e, h, rterm, res, n, target_h1):
    """One lock-step push round toward the current height function.

    ``rterm``: residual of the terminal edge (v→t in phase 1, v→s in
    phase 2) — admissible when h == 1. Returns updated (e, rterm, res,
    pushed_any). Pushes drain a frozen per-round budget sequentially over
    the ≤5 out-edges; received flow only enters next round's excess."""
    active = (e > 0) & (h < n)
    budget = jnp.where(active, e, 0)
    recv = [jnp.zeros_like(e) for _ in range(4)]
    new_res = list(res)

    # terminal edge first
    amt = jnp.where(active & (h == target_h1) & (rterm > 0),
                    jnp.minimum(budget, rterm), 0)
    rterm = rterm - amt
    budget = budget - amt
    sent = amt

    for i, (dy, dx) in enumerate(_DIRS):
        hn = _nbr(h, dy, dx, n + 1)
        adm = active & (new_res[i] > 0) & (h == hn + 1)
        amt = jnp.where(adm, jnp.minimum(budget, new_res[i]), 0)
        new_res[i] = new_res[i] - amt
        budget = budget - amt
        sent = sent + amt
        recv[i] = amt

    # reverse residuals grow where the opposite direction received flow;
    # incoming excess = sum of neighbor sends pointed at me
    inc = jnp.zeros_like(e)
    for i, (dy, dx) in enumerate(_DIRS):
        # my neighbor in direction i pushed toward me via its direction j
        # where j is the opposite of i
        j = i ^ 1  # up<->down, left<->right in _DIRS order
        got = _nbr(recv[j], dy, dx, 0)
        new_res[i] = new_res[i] + got
        inc = inc + got

    e2 = e - sent + inc
    return e2, rterm, tuple(new_res), jnp.any(sent > 0)


def _relabel(e, h, rterm, res, n, target_h1):
    """Jacobi relabel: active nodes with no admissible edge rise to
    1 + min residual-neighbor height (terminal edge offers height
    target_h1 − 1 + 1). Heights only increase; capped at n."""
    active = (e > 0) & (h < n)
    best = jnp.where(rterm > 0, jnp.full_like(h, target_h1), n)
    adm = (rterm > 0) & (h == target_h1)
    for i, (dy, dx) in enumerate(_DIRS):
        hn = _nbr(h, dy, dx, n)
        best = jnp.minimum(best, jnp.where(res[i] > 0, hn + 1, n))
        adm = adm | ((res[i] > 0) & (h == hn + 1))
    newh = jnp.where(active & ~adm, jnp.maximum(h, jnp.minimum(best, n)), h)
    return newh


def _drain(e, rterm, res, seed_d, n, max_outer):
    """Route as much excess as possible into the terminal whose residual
    edge map is ``rterm`` (seeded distances ``seed_d``). Lock-step
    push/relabel with periodic exact global relabeling."""

    def outer_cond(state):
        return state[3] & (state[4] < max_outer)

    def outer_body(state):
        e, rterm, res, _, it = state
        h = _dist_to(seed_d(rterm), res, n)
        alive = jnp.any((e > 0) & (h < n))

        def run(args):
            e, h, rterm, res = args

            def inner(carry, _):
                e, h, rterm, res = carry
                e, rterm, res, _p = _push_phase(e, h, rterm, res, n, 1)
                h = _relabel(e, h, rterm, res, n, 1)
                return (e, h, rterm, res), 0

            (e, h, rterm, res), _ = jax.lax.scan(
                inner, (e, h, rterm, res), None, length=8
            )
            return e, rterm, res

        e, rterm, res = jax.lax.cond(
            alive, run, lambda a: (a[0], a[2], a[3]), (e, h, rterm, res)
        )
        return e, rterm, res, alive, it + 1

    e, rterm, res, _, _ = jax.lax.while_loop(
        outer_cond,
        outer_body,
        (e, rterm, res, jnp.bool_(True), jnp.zeros((), jnp.int32)),
    )
    return e, rterm, res


@partial(jax.jit, static_argnames=())
def grid_mincut_sink_mask(tr_cap, e_up, e_left):
    """BK-parity min cut on a 4-connected grid.

    ``tr_cap`` [H, W] i32: net terminal capacity (cap_source − cap_sink,
    already cancelled as BK does). ``e_up``/``e_left`` [H, W] bool/i32:
    1 where the (unit, bidirectional) edge to (y−1, x) / (y, x−1) exists.

    Returns FG [H, W] bool — True where ``what_segment == SINK`` (not
    reachable from s in the final residual).
    """
    H, W = tr_cap.shape
    n = jnp.int32(H * W + 2)

    rs0 = jnp.maximum(tr_cap, 0)  # source→v capacity
    rt = jnp.maximum(-tr_cap, 0)  # v→sink residual
    e_up = e_up.astype(jnp.int32)
    e_left = e_left.astype(jnp.int32)
    # residuals in _DIRS order: up, down, left, right
    res = (
        e_up,
        _nbr(e_up, 1, 0, 0),  # my down edge = neighbor-below's up edge
        e_left,
        _nbr(e_left, 0, 1, 0),
    )

    # Orientation matters enormously for the lock-step solver: excess
    # should live on the SMALLER terminal side so it drains a step or two
    # into the abundant opposite terminal, instead of routing the large
    # side's units toward sparse sinks over long distances (round-5 LbpMrf
    # at 720p measured ~130-900 ms/frame with the fixed orientation; the
    # all-FG warm-up frames are the mirrored pathology). Both orientations
    # compute the same max flow, and the canonical source-reachable cut is
    # flow-independent, so the result is identical
    # (tests/test_mincut.py re-validates vs scipy) — pick per instance by
    # total terminal capacity. The reversed graph G' (source = G's t;
    # symmetric unit grid edges, so res_G(u→v) = res_G'(v→u)) reuses the
    # same drain machinery with the terminal roles swapped.
    seed1 = lambda rterm: jnp.where(rterm > 0, 1, n)

    def run(e0, rterm1, back0):
        e, r1_rem, res2 = _drain(
            e0, rterm1, res, seed1, n, max_outer=4 * H * W
        )
        e, r2_rem, res2 = _drain(e, back0, res2, seed1, n, max_outer=4 * H * W)
        return r1_rem, r2_rem, res2

    def fwd(_):
        # excess from s (BG side): drain to t, refund to s. back_after =
        # the final forward flow f(s→v); residual s-edge = rs0 − it.
        # G's residual u→v sits at u (direction toward v) → reachability
        # reads the NEIGHBOR's edge.
        _, back_after, res2 = run(rs0, rt, rs0)
        rs = rs0 - back_after
        opens = tuple(
            _nbr(res2[i ^ 1], dy, dx, 0) > 0
            for i, (dy, dx) in enumerate(_DIRS)
        )
        return rs, opens

    def rev(_):
        # excess from G's t (FG side) on G': drain to G's s, refund to t.
        # G's s-residual = undrained rs_rem; G's edge u→v read at v is
        # res_G'(v→u) = v's OWN direction-i residual.
        rs_rem, _, res2 = run(rt, rs0, rt)
        return rs_rem, tuple(r > 0 for r in res2)

    rs_fin, opens_in = jax.lax.cond(
        jnp.sum(rt) <= jnp.sum(rs0), rev, fwd, operand=None
    )

    # canonical cut: S = reachable from G's s in G's residual
    # (maxflow.cpp:510) — line-sweep reachability (reach ⇔ finite
    # distance).
    seed = jnp.where(rs_fin > 0, 0, n)
    s_reach = _dist_via(seed, opens_in, n) < n
    return ~s_reach
