"""MyBGS + shrinkBGS behavioral tests (USTC experimental components)."""

import jax.numpy as jnp
import numpy as np

from tracking_tpu.core.registry import get_algorithm
from tracking_tpu.runner import run_video


def test_mybgs_is_frame_difference(video_frames):
    import cv2

    frames = video_frames[:10, 40:88, 90:154]
    algo = get_algorithm("MyBGS")()
    _, masks = run_video(algo, jnp.asarray(frames))
    ours = np.asarray(masks)
    prev = frames[0]
    for t, f in enumerate(frames):
        diff = cv2.absdiff(prev, f)
        gray = cv2.cvtColor(diff, cv2.COLOR_BGR2GRAY)
        ref = np.where(gray > 15, 255, 0).astype(np.uint8)
        assert (ours[t] == ref).mean() > 0.999, t
        prev = f


def test_shrink_detects_appearing_object():
    rng = np.random.default_rng(1)
    bg = rng.integers(100, 130, (1, 40, 56, 3), np.uint8)
    frames = np.tile(bg, (60, 1, 1, 1))
    frames[45:, 10:30, 16:40] = 245
    algo = get_algorithm("shrinkBGS")()
    st, masks = run_video(algo, jnp.asarray(frames))
    m = np.asarray(masks)
    assert (m[46, 14:26, 20:36] == 255).mean() > 0.9
    # steady background stays mostly quiet before the object appears
    assert (m[40] > 0).mean() < 0.05
    # distance thresholds adapt downward toward observed Dmin
    assert float(np.asarray(st["dist_thr"]).mean()) < 15.0


def test_shrink_absorbs_static_change():
    # a persisting object is slowly absorbed through the xor/learn-step path
    rng = np.random.default_rng(2)
    bg = rng.integers(100, 130, (1, 24, 32, 3), np.uint8)
    frames = np.tile(bg, (120, 1, 1, 1))
    frames[40:, 6:18, 8:24] = 150  # small step, within relaxed thresholds
    algo = get_algorithm("shrinkBGS")()
    _, masks = run_video(algo, jnp.asarray(frames))
    m = np.asarray(masks)
    early = (m[45, 8:16, 10:22] > 0).mean()
    late = (m[115, 8:16, 10:22] > 0).mean()
    assert late <= early
