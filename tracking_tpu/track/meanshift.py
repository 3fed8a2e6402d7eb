"""Mean-shift blob localization (MS/MSFG/MSPF tracker-registry parity).

The reference's tracker registry (``trackingMain.cpp:49-68``) offers
mean-shift variants from OpenCV legacy: plain MS on color histograms, MSFG
(FG-mask-weighted histograms), and MSPF (particle filter around mean-shift).
The default CCMSPF tracker runs connected-component association and falls
back to mean-shift particle filtering only for colliding blobs.

TPU-native equivalents, all jit/vmap-safe with static shapes:

- :func:`meanshift_refine` — iterative centroid refinement of a fixed-size
  window over a weight image (the FG mask, or a histogram backprojection):
  k iterations of windowed first moments via ``dynamic_slice`` per track
  (K ≤ 64 tiny windows, vmapped).
- :func:`backproject` — color-histogram backprojection (8×8×8 RGB bins) of
  a template histogram onto a frame, the MS weight image (kept gather-free:
  one [512]-bin one-hot contraction).
- :func:`particle_refine` — MSPF-style stochastic refinement: P candidate
  windows jittered around the prediction, scored by windowed weight mass,
  winner's centroid refined by mean-shift.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

WIN = 32  # static refinement window size (pixels)


def _window_sum(weight, cy, cx):
    """[WIN, WIN] window of `weight` centered at (cy, cx), clamped."""
    h, w = weight.shape
    y0 = jnp.clip(cy.astype(jnp.int32) - WIN // 2, 0, h - WIN)
    x0 = jnp.clip(cx.astype(jnp.int32) - WIN // 2, 0, w - WIN)
    win = jax.lax.dynamic_slice(weight, (y0, x0), (WIN, WIN))
    return win, y0, x0


def meanshift_refine(weight: jnp.ndarray, cy, cx, iters: int = 5):
    """Refine one center over a weight image. Returns (cy, cx, mass)."""
    ys = jnp.arange(WIN, dtype=jnp.float32)
    xs = jnp.arange(WIN, dtype=jnp.float32)

    def body(_, c):
        cy, cx = c
        win, y0, x0 = _window_sum(weight, cy, cx)
        wf = win.astype(jnp.float32)
        m = jnp.sum(wf)
        my = jnp.sum(wf * ys[:, None]) / jnp.maximum(m, 1e-6)
        mx = jnp.sum(wf * xs[None, :]) / jnp.maximum(m, 1e-6)
        ok = m > 0
        return (
            jnp.where(ok, y0.astype(jnp.float32) + my, cy),
            jnp.where(ok, x0.astype(jnp.float32) + mx, cx),
        )

    cy, cx = jax.lax.fori_loop(0, iters, body, (cy * 1.0, cx * 1.0))
    win, _, _ = _window_sum(weight, cy, cx)
    return cy, cx, jnp.sum(win.astype(jnp.float32))


def meanshift_refine_batch(weight: jnp.ndarray, cys, cxs, iters: int = 5):
    """vmapped refinement for a [K] batch of centers."""
    return jax.vmap(lambda y, x: meanshift_refine(weight, y, x, iters))(cys, cxs)


def meanshift_refine_batch_sharded(ctx, weight_own: jnp.ndarray, cys, cxs,
                                   iters: int = 5):
    """Row-sharded twin of :func:`meanshift_refine_batch`, BIT-EXACT vs the
    unsharded refinement over the gathered mask.

    ``weight_own`` is this shard's [h_loc, W] slab of the (binary, 0/1 f32)
    FG weight image; ``ctx`` is a ``parallel.spatial.SpatialCtx``. Each
    iteration computes the WIN×WIN window's first moments as per-shard
    partial sums over the owned rows, combined with ONE `psum` of a
    [3, K] table per iteration (6 tiny collective rounds total) — no [H, W]
    data ever crosses ICI, which is what lets the CCMSPF collision resolver
    (``trackingMain.cpp:633``) run inside the sharded tracked pipeline.

    Exactness argument: the weight is binary, so the window mass and the
    ``w·y`` / ``w·x`` moment sums are integer-valued with magnitude
    < WIN²·WIN < 2²⁴ — exactly representable in f32 regardless of the
    summation split, so the psum of per-shard partials equals the unsharded
    window sum bit-for-bit, and every downstream divide/compare sees
    identical operands. Each global row is owned by exactly one shard, so
    no contribution is double-counted."""
    h_loc, w = weight_own.shape
    H = ctx.H
    # zero-pad so any WIN-row slice around the slab is in range; padding rows
    # never contribute (the ownership mask below zeroes them)
    padded = jnp.pad(weight_own, ((WIN, WIN), (0, 0)))
    ys = jnp.arange(WIN, dtype=jnp.float32)
    xs = jnp.arange(WIN, dtype=jnp.float32)
    i_win = jnp.arange(WIN)

    def partial_moments(cy, cx):
        y0 = jnp.clip(cy.astype(jnp.int32) - WIN // 2, 0, H - WIN)
        x0 = jnp.clip(cx.astype(jnp.int32) - WIN // 2, 0, w - WIN)
        ls = y0 - ctx.row0 + WIN  # window start in padded-local coords
        ls_c = jnp.clip(ls, 0, h_loc + WIN)
        win = jax.lax.dynamic_slice(padded, (ls_c, x0), (WIN, WIN))
        # row i of the slice is global row row0 - WIN + ls_c + i; count it
        # iff it is the intended window row y0+i AND this shard owns it
        gi = ctx.row0 - WIN + ls_c + i_win
        own = (gi == y0 + i_win) & (gi >= ctx.row0) & (gi < ctx.row0 + h_loc)
        wf = win * own[:, None].astype(win.dtype)
        m = jnp.sum(wf)
        sy = jnp.sum(wf * ys[:, None])
        sx = jnp.sum(wf * xs[None, :])
        return m, sy, sx, y0, x0

    def body(_, c):
        cy, cx = c
        m_p, sy_p, sx_p, y0, x0 = jax.vmap(partial_moments)(cy, cx)
        m, sy, sx = jax.lax.psum(jnp.stack([m_p, sy_p, sx_p]), ctx.axis)
        my = sy / jnp.maximum(m, 1e-6)
        mx = sx / jnp.maximum(m, 1e-6)
        ok = m > 0
        return (
            jnp.where(ok, y0.astype(jnp.float32) + my, cy),
            jnp.where(ok, x0.astype(jnp.float32) + mx, cx),
        )

    cys, cxs = jax.lax.fori_loop(0, iters, body, (cys * 1.0, cxs * 1.0))
    m_p, _, _, _, _ = jax.vmap(partial_moments)(cys, cxs)
    mass = jax.lax.psum(m_p, ctx.axis)
    return cys, cxs, mass


@partial(jax.jit, static_argnames=("bins",))
def backproject(frame_u8: jnp.ndarray, hist: jnp.ndarray, bins: int = 8):
    """[H, W, 3] u8 + [bins³] template histogram → [H, W] weight image.

    Gather-free: the per-pixel bin code contracts against a one-hot of the
    histogram (512 fused select-adds — VPU-friendly, no scatter/gather)."""
    q = frame_u8.astype(jnp.int32) >> (8 - 3)  # 8 bins/channel
    code = (q[..., 0] * bins + q[..., 1]) * bins + q[..., 2]
    out = jnp.zeros(frame_u8.shape[:2], jnp.float32)
    for b in range(bins**3):
        out = out + jnp.where(code == b, hist[b], 0.0)
    return out


def color_histogram(frame_u8: jnp.ndarray, mask: jnp.ndarray, bins: int = 8):
    """FG-weighted color histogram (MSFG semantics): [bins³] normalized."""
    q = frame_u8.astype(jnp.int32) >> (8 - 3)
    code = (q[..., 0] * bins + q[..., 1]) * bins + q[..., 2]
    wt = (mask > 0).astype(jnp.float32)
    hist = jnp.zeros(bins**3, jnp.float32).at[code.reshape(-1)].add(wt.reshape(-1))
    return hist / jnp.maximum(jnp.sum(hist), 1e-6)


def particle_refine(weight: jnp.ndarray, key, cy, cx, n_particles: int = 16,
                    sigma: float = 6.0, iters: int = 3):
    """MSPF-style: jitter candidates, pick the heaviest window, mean-shift it."""
    ky, kx = jax.random.split(key)
    dy = jax.random.normal(ky, (n_particles,)) * sigma
    dx = jax.random.normal(kx, (n_particles,)) * sigma
    cys = cy + dy
    cxs = cx + dx

    def mass(y, x):
        win, _, _ = _window_sum(weight, y, x)
        return jnp.sum(win.astype(jnp.float32))

    masses = jax.vmap(mass)(cys, cxs)
    best = jnp.argmax(masses)
    return meanshift_refine(weight, cys[best], cxs[best], iters)


def window_color_hist(frame_u8, fg_f, cy, cx, bins: int = 8):
    """FG-weighted color histogram of the WIN×WIN window at (cy, cx) —
    the template captured at track birth (legacy MS/MSFG trackers build
    their model from the blob's pixels). [bins³] normalized; a tiny
    ``1e-3`` floor keeps templates defined on empty-FG windows."""
    h, w = fg_f.shape
    y0 = jnp.clip(cy.astype(jnp.int32) - WIN // 2, 0, h - WIN)
    x0 = jnp.clip(cx.astype(jnp.int32) - WIN // 2, 0, w - WIN)
    fwin = jax.lax.dynamic_slice(frame_u8, (y0, x0, 0), (WIN, WIN, 3))
    wt = jax.lax.dynamic_slice(fg_f, (y0, x0), (WIN, WIN)) + 1e-3
    q = fwin.astype(jnp.int32) >> (8 - 3)
    code = (q[..., 0] * bins + q[..., 1]) * bins + q[..., 2]
    hist = jnp.zeros(bins**3, jnp.float32).at[code.reshape(-1)].add(wt.reshape(-1))
    return hist / jnp.maximum(jnp.sum(hist), 1e-6)


def meanshift_color_refine(frame_u8, fg_f, hist, cy, cx, use_fg: bool,
                           iters: int = 5, bins: int = 8):
    """Mean-shift over the per-track color backprojection, computed only
    inside the WIN window per iteration (a full-image backprojection per
    track would be K× the whole frame). use_fg multiplies the FG mask in
    (MSFG semantics); plain MS tracks on color alone. Returns (cy, cx,
    mass). The [bins³]-table lookup is a tiny-table gather (≤ WIN² indices
    per track — not an [H, W] gather)."""
    h, w = fg_f.shape
    ys = jnp.arange(WIN, dtype=jnp.float32)
    xs = jnp.arange(WIN, dtype=jnp.float32)

    def weight_window(cy, cx):
        y0 = jnp.clip(cy.astype(jnp.int32) - WIN // 2, 0, h - WIN)
        x0 = jnp.clip(cx.astype(jnp.int32) - WIN // 2, 0, w - WIN)
        fwin = jax.lax.dynamic_slice(frame_u8, (y0, x0, 0), (WIN, WIN, 3))
        q = fwin.astype(jnp.int32) >> (8 - 3)
        code = (q[..., 0] * bins + q[..., 1]) * bins + q[..., 2]
        wt = jnp.take(hist, code)
        if use_fg:
            wt = wt * jax.lax.dynamic_slice(fg_f, (y0, x0), (WIN, WIN))
        return wt, y0, x0

    def body(_, c):
        cy, cx = c
        wt, y0, x0 = weight_window(cy, cx)
        m = jnp.sum(wt)
        my = jnp.sum(wt * ys[:, None]) / jnp.maximum(m, 1e-6)
        mx = jnp.sum(wt * xs[None, :]) / jnp.maximum(m, 1e-6)
        ok = m > 1e-6
        return (
            jnp.where(ok, y0.astype(jnp.float32) + my, cy),
            jnp.where(ok, x0.astype(jnp.float32) + mx, cx),
        )

    cy, cx = jax.lax.fori_loop(0, iters, body, (cy * 1.0, cx * 1.0))
    wt, _, _ = weight_window(cy, cx)
    return cy, cx, jnp.sum(wt)


def particle_color_refine(frame_u8, fg_f, hist, key, cy, cx, use_fg: bool,
                          n_particles: int = 16, sigma: float = 6.0,
                          iters: int = 3, bins: int = 8):
    """MSPF: jitter candidate centers, keep the heaviest backprojection
    window, refine it by mean-shift (cvCreateBlobTrackerMSPF semantics)."""
    h, w = fg_f.shape
    ky, kx = jax.random.split(key)
    cys = cy + jax.random.normal(ky, (n_particles,)) * sigma
    cxs = cx + jax.random.normal(kx, (n_particles,)) * sigma

    def mass(y, x):
        y0 = jnp.clip(y.astype(jnp.int32) - WIN // 2, 0, h - WIN)
        x0 = jnp.clip(x.astype(jnp.int32) - WIN // 2, 0, w - WIN)
        fwin = jax.lax.dynamic_slice(frame_u8, (y0, x0, 0), (WIN, WIN, 3))
        q = fwin.astype(jnp.int32) >> (8 - 3)
        code = (q[..., 0] * bins + q[..., 1]) * bins + q[..., 2]
        wt = jnp.take(hist, code)
        if use_fg:
            wt = wt * jax.lax.dynamic_slice(fg_f, (y0, x0), (WIN, WIN))
        return jnp.sum(wt)

    masses = jax.vmap(mass)(cys, cxs)
    best = jnp.argmax(masses)
    return meanshift_color_refine(
        frame_u8, fg_f, hist, cys[best], cxs[best], use_fg, iters, bins
    )
