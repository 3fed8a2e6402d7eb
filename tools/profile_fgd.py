"""Floor-corrected stage profile of the FGD step (the SWEEP-tail worst case).

Same protocol as tools/profile_stages.py: T-frame scan in one jit, fetch
barrier, 27/T ms floor subtracted. Stages are isolated by config knobs /
module stubs, measuring deltas.

Usage: python tools/profile_fgd.py
"""

import sys
import time

import cv2
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tracking_tpu.core.registry import get_algorithm  # noqa: E402
from tracking_tpu.io.video import read_video  # noqa: E402
from tracking_tpu.runner.scan import make_step_fn  # noqa: E402

H, W, C = 720, 1280, 3
T = 64
FLOOR = 27.0 / T
T0 = 65


def frames_720p():
    small = read_video("/root/reference/dataset/video.avi", max_frames=T0 + T)
    return jnp.asarray(
        np.stack([cv2.resize(f, (W, H)) for f in small[T0 : T0 + T]])
    )


def measure(algo, frames, label, reps=3):
    state0 = algo.init(H, W, C)
    state0 = jax.jit(algo.warm_start)(state0, frames[0])
    body = make_step_fn(algo)

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
    print(f"{label}: {ms:.3f} ms/frame  ({1000.0 / ms:.1f} fps)", flush=True)
    return ms


def main():
    frames = frames_720p()
    FGD = type(get_algorithm("FGD")())

    measure(get_algorithm("FGD")(), frames, "FGD full")
    measure(
        get_algorithm("FGD")(minArea=0.0), frames, "FGD w/o minArea CC gate"
    )
    measure(
        get_algorithm("FGD")(minArea=0.0, is_obj_without_holes=False),
        frames,
        "FGD w/o minArea+fill",
    )
    measure(
        get_algorithm("FGD")(
            minArea=0.0, is_obj_without_holes=False, perform_morphing=0
        ),
        frames,
        "FGD w/o all post-proc",
    )

    # classify-only vs update-only isolation via module stubs
    import tracking_tpu.bgs.fgd as F

    real_update = F._Table.update
    F._Table.update = lambda self, st, p, m, k, do, bg, a: None
    try:
        measure(
            get_algorithm("FGD")(
                minArea=0.0, is_obj_without_holes=False, perform_morphing=0
            ),
            frames,
            "FGD w/o post-proc + w/o table updates",
        )
    finally:
        F._Table.update = real_update


if __name__ == "__main__":
    main()
