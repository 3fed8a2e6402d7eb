"""LbpMrf behavioral tests (texture histograms + MRF relaxation)."""

import jax.numpy as jnp
import numpy as np

from tracking_tpu.core.registry import get_algorithm
from tracking_tpu.runner import run_video


def test_lbpmrf_static_scene_stays_background():
    """Static scene: background from frame 3 on. Frames 1-2 are the
    reference's faithful warm-up artifact — the short-memcpy partial init
    leaves histogram bins 2+ zero (MotionDetection.cpp column-branch
    ``sizeof(CurrentHistogram2)``), so the first real intersections are
    gutted and the reference emits near-all-FG masks until the replace
    path installs full histograms (round 5; see bgs/lbp_mrf.py)."""
    rng = np.random.default_rng(0)
    frames = np.tile(rng.integers(60, 200, (1, 40, 60, 3), np.uint8), (8, 1, 1, 1))
    _, masks = run_video(get_algorithm("LbpMrf")(), jnp.asarray(frames))
    m = np.asarray(masks)
    assert m[0].sum() == 0
    assert m[3:].sum() == 0


def test_lbpmrf_detects_textured_object():
    rng = np.random.default_rng(1)
    bg = rng.integers(100, 140, (1, 60, 80, 3), np.uint8)
    frames = np.tile(bg, (40, 1, 1, 1))
    # textured object (texture histograms must change, not just intensity)
    obj = rng.integers(0, 255, (20, 30, 3), np.uint8)
    frames[30:, 20:40, 25:55] = obj
    _, masks = run_video(get_algorithm("LbpMrf")(), jnp.asarray(frames))
    m = np.asarray(masks)
    # detected on arrival; absorbed within ~2 frames by the warm-up learning
    # rate (life<100 ⇒ lr ≈ 0.7, faithful to MotionDetection.cpp:876-880)
    assert (m[30, 24:36, 30:50] > 0).mean() > 0.5
    assert (m[25] > 0).mean() < 0.02
    assert (m[35] > 0).mean() < 0.02


def test_lbpmrf_scene_cut_resets_model():
    rng = np.random.default_rng(2)
    a = np.tile(rng.integers(40, 90, (1, 40, 60, 3), np.uint8), (15, 1, 1, 1))
    b = np.tile(rng.integers(160, 250, (1, 40, 60, 3), np.uint8), (10, 1, 1, 1))
    frames = np.concatenate([a, b])
    _, masks = run_video(get_algorithm("LbpMrf")(), jnp.asarray(frames))
    m = np.asarray(masks)
    # the >80% change triggers a model reset: frames after the cut settle
    assert (m[20] > 0).mean() < 0.05
