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


def _dist_to(seed_d, res, inf):
    """Exact residual shortest-path distance: d(v) = min(seed_d(v),
    1 + min over residual out-edges res[i] (v→nbr_i) of d(nbr_i)).

    ``res``: tuple of 4 [H, W] i32 residuals in _DIRS order. Iterated
    4-neighbor relaxation to a fixed point (bounded by H·W rounds; real
    grids converge in the max finite distance)."""

    def body(state):
        d, _ = state
        nd = d
        for i, (dy, dx) in enumerate(_DIRS):
            cand = 1 + _nbr(d, dy, dx, inf)
            nd = jnp.minimum(nd, jnp.where(res[i] > 0, cand, inf))
        nd = jnp.minimum(nd, inf)
        return nd, jnp.any(nd != d)

    def cond(state):
        return state[1]

    d, _ = jax.lax.while_loop(cond, body, (seed_d, jnp.bool_(True)))
    return d


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

    # saturating preflow from s
    e = rs0
    back_s = rs0  # v→s refund residual (= flow pushed out of s so far)

    # phase 1: drain to t (distance-to-t seeds: h=1 where rt>0)
    seed_t = lambda rterm: jnp.where(rterm > 0, 1, n)
    e, rt, res = _drain(e, rt, res, seed_t, n, max_outer=4 * H * W)

    # phase 2: return trapped excess to s (always routable)
    seed_s = lambda rterm: jnp.where(rterm > 0, 1, n)
    e, back_s, res = _drain(e, back_s, res, seed_s, n, max_outer=4 * H * W)
    # back_s now holds the FINAL forward flow f(s→v); the s→v residual is
    # the refunded remainder
    rs = rs0 - back_s

    # canonical cut: S = reachable from s in the residual (maxflow.cpp:510)
    def bfs_cond(state):
        s, _ = state
        return state[1]

    def bfs_body(state):
        s, _ = state
        ns = s
        for i, (dy, dx) in enumerate(_DIRS):
            # I become reachable if my neighbor in direction i is reachable
            # and ITS residual edge pointing at me (direction opposite of
            # i, indexed j at the neighbor) is > 0
            j = i ^ 1
            ns = ns | (_nbr(s, dy, dx, False) & (_nbr(res[j], dy, dx, 0) > 0))
        return ns, jnp.any(ns != s)

    s_reach = rs > 0
    s_reach, _ = jax.lax.while_loop(bfs_cond, bfs_body, (s_reach, jnp.bool_(True)))
    return ~s_reach
