"""Exact grid min-cut (ops/mincut.py) vs scipy maximum_flow + residual BFS.

The oracle mirrors what BK's ``what_segment`` reports (``maxflow.cpp:510``):
SOURCE iff reachable from s in the final max-flow residual; the
source-reachable set of a maximum flow is flow-independent, so any exact
max-flow solver yields the same canonical partition.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from tracking_tpu.ops.mincut import grid_mincut_sink_mask


def _oracle_sink_mask(tr_cap, e_up, e_left):
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import maximum_flow

    H, W = tr_cap.shape
    n = H * W
    s, t = n, n + 1

    def nid(y, x):
        return y * W + x

    rows, cols, caps = [], [], []

    def add(u, v, c):
        if c > 0:
            rows.append(u)
            cols.append(v)
            caps.append(int(c))

    for y in range(H):
        for x in range(W):
            v = nid(y, x)
            if tr_cap[y, x] > 0:
                add(s, v, tr_cap[y, x])
            elif tr_cap[y, x] < 0:
                add(v, t, -tr_cap[y, x])
            if e_up[y, x] and y > 0:
                add(v, nid(y - 1, x), 1)
                add(nid(y - 1, x), v, 1)
            if e_left[y, x] and x > 0:
                add(v, nid(y, x - 1), 1)
                add(nid(y, x - 1), v, 1)

    # scipy needs a single capacity per (u, v); sum duplicates
    m = csr_matrix(
        (caps, (rows, cols)), shape=(n + 2, n + 2), dtype=np.int32
    )
    m.sum_duplicates()
    res = maximum_flow(m, s, t)
    residual = m - res.flow  # residual capacity of every directed edge
    # BFS from s over positive-residual edges
    reach = np.zeros(n + 2, bool)
    stack = [s]
    reach[s] = True
    indptr, indices, data = residual.indptr, residual.indices, residual.data
    # also traverse reverse edges of pushed flow: residual(v->u) includes
    # m[v,u] - flow[v,u]; flow[u,v] > 0 adds residual v->u, which equals
    # -flow[v,u] entry... build explicit residual adjacency instead
    from collections import defaultdict

    radj = defaultdict(list)
    mm = m.tocoo()
    f = res.flow.tocoo()
    cap = {}
    for u, v, c in zip(mm.row, mm.col, mm.data):
        cap[(u, v)] = cap.get((u, v), 0) + c
    flw = {}
    for u, v, c in zip(f.row, f.col, f.data):
        flw[(u, v)] = c
    edges = set(cap) | set(flw)
    for (u, v) in edges:
        r = cap.get((u, v), 0) - flw.get((u, v), 0)
        if r > 0:
            radj[u].append(v)
    while stack:
        u = stack.pop()
        for v in radj[u]:
            if not reach[v]:
                reach[v] = True
                stack.append(v)
    return ~reach[:n].reshape(H, W)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_mincut_matches_scipy_random(seed):
    rng = np.random.default_rng(seed)
    H, W = 14, 18
    # tr_cap = 1 - T with T ~ the LbpMrf distribution {0..8}, mixed regions
    T = rng.integers(0, 9, (H, W))
    # carve coherent blobs so the cut has structure
    T[rng.integers(2, H - 2) :, :] //= 2
    tr_cap = (1 - T).astype(np.int32)
    has = np.zeros((H, W), bool)
    has[1:, 1:] = True
    want = _oracle_sink_mask(tr_cap, has, has)
    got = np.asarray(
        grid_mincut_sink_mask(jnp.asarray(tr_cap), jnp.asarray(has), jnp.asarray(has))
    )
    np.testing.assert_array_equal(got, want)


def test_mincut_uniform_cases():
    H, W = 8, 10
    has = np.zeros((H, W), bool)
    has[1:, 1:] = True
    # all-source: everything reachable -> no FG
    tr = np.ones((H, W), np.int32)
    got = np.asarray(grid_mincut_sink_mask(jnp.asarray(tr), jnp.asarray(has), jnp.asarray(has)))
    assert not got.any()
    # all-sink: nothing reachable -> all FG
    tr = np.full((H, W), -3, np.int32)
    got = np.asarray(grid_mincut_sink_mask(jnp.asarray(tr), jnp.asarray(has), jnp.asarray(has)))
    assert got.all()
