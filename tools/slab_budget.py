"""Per-shard slab cost measurement for the multi-chip budget (PERF.md).

Multi-chip hardware is not reachable from this host (one tunneled v5e chip),
so the spatial-sharding budget is built from single-chip measurements of the
flagship BGS step at SLAB heights H/S for S in {1, 2, 4, 8} x 720p width —
the per-shard compute+HBM cost of a row-sharded step, minus the collectives
(halo exchange / psums are modeled from byte counts in PERF.md). The step at
a slab height is the same program a shard runs: owned-size banks, owned-size
state maps, the same Pallas kernels on fewer rows.

Timing protocol: T-frame lax.scan inside one jit, fetch-barriered, 27/T ms
floor subtracted (see tools/profile_stages.py).

Usage: python tools/slab_budget.py [heights...]
"""

import sys
import time

import cv2
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from __graft_entry__ import _flagship  # noqa: E402
from tracking_tpu.io.video import read_video  # noqa: E402
from tracking_tpu.runner.scan import make_step_fn  # noqa: E402

W, C = 1280, 3
T = 64
FLOOR = 27.0 / T
T0 = 65  # motion window (matches the distinct-content bench)


def frames_at(h):
    small = read_video("/root/reference/dataset/video.avi", max_frames=T0 + T)
    # resize to 720p, then take h rows CENTERED on the frame — a real shard
    # sees a slab of the full frame, and the center slab holds the video's
    # motion, so per-shard walk cost is measured at its worst-case shard
    # (conservative for the budget)
    full = np.stack([cv2.resize(f, (W, 720)) for f in small[T0 : T0 + T]])
    y0 = (720 - h) // 2
    return jnp.asarray(full[:, y0 : y0 + h])


def measure(body, state0, frames, label, reps=3):
    @jax.jit
    def run(state, frames):
        state, out = jax.lax.scan(body, state, frames)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    float(run(state0, frames))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(state0, frames))
        best = min(best, time.perf_counter() - t0)
    ms = best / T * 1e3 - FLOOR
    print(f"{label}: {ms:.3f} ms/frame", flush=True)
    return ms


def main():
    heights = [int(a) for a in sys.argv[1:]] or [720, 360, 180, 90]
    for h in heights:
        frames = frames_at(h)
        algo = _flagship()
        state0 = algo.init(h, W, C)
        state0 = jax.jit(algo.warm_start)(state0, frames[0])
        body = make_step_fn(algo)
        measure(body, state0, frames, f"BGS step @ {h}x{W} (slab S={720 // h})")

        # the sharded tracking tail components at this slab height:
        # CC labeling + blob moment contractions run per shard
        from tracking_tpu.ops.cc import extract_blobs

        @jax.jit
        def get_masks(state, frames):
            def b(s, f):
                s, m = body(s, f)
                return s, m

            _, masks = jax.lax.scan(b, state, frames)
            return masks

        masks = get_masks(state0, frames)

        def ebody(_, m):
            b = extract_blobs(m, max_blobs=64)
            return _, (b.area, b.cx)

        measure(ebody, jnp.zeros(()), masks, f"blob extraction @ {h}x{W}")


if __name__ == "__main__":
    main()
