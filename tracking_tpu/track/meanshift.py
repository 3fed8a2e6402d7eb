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
