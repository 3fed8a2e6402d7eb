"""SJN_MultiCueBGS behavioral tests (box-level verification pipeline)."""

import jax.numpy as jnp
import numpy as np

from tracking_tpu.core.registry import get_algorithm
from tracking_tpu.runner import run_video


def _frames_with_object(n=60, h=120, w=160, appear=40, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(80, 170, (1, h, w, 3), np.uint8)
    frames = np.tile(base, (n, 1, 1, 1))
    frames[appear:, 40:80, 50:110] = 230
    return frames


def test_multicue_trains_then_detects_object():
    frames = _frames_with_object()
    algo = get_algorithm("multicue")()
    st, masks = run_video(algo, jnp.asarray(frames))
    m = np.asarray(masks)
    # training phase (t ≤ 21) emits empty masks
    assert m[:21].sum() == 0
    # pre-appearance detection frames stay (almost) clean
    assert (m[35] > 128).mean() < 0.01
    # the appearing 40×60 object (passes the ≥5×5 box gate) is detected
    obj = m[appear] if (appear := 42) else None
    assert (m[42, 45:75, 55:105] > 128).mean() > 0.6
    # output is the bilinear-enlarged reduced map: soft edges allowed
    assert m.dtype == np.uint8


def test_multicue_small_specks_filtered():
    # a 2×2 speck fails both the 5×5-majority morphology and the box gate
    rng = np.random.default_rng(3)
    base = rng.integers(80, 170, (1, 120, 160, 3), np.uint8)
    frames = np.tile(base, (50, 1, 1, 1))
    frames[40:, 60:62, 80:82] = 255
    algo = get_algorithm("multicue")()
    _, masks = run_video(algo, jnp.asarray(frames))
    m = np.asarray(masks)
    assert (m[45] > 128).mean() < 1e-3


def test_multicue_codebooks_stay_compact_on_static_scene():
    frames = np.tile(
        np.full((1, 120, 160, 3), 120, np.uint8), (30, 1, 1, 1)
    )
    algo = get_algorithm("multicue")()
    st, _ = run_video(algo, jnp.asarray(frames))
    # a constant scene needs exactly one codeword per book
    assert int(np.asarray(st["tmodel"]["n"]).max()) == 1
    assert int(np.asarray(st["cmodel"]["n"]).max()) == 1


def test_multicue_smoke():
    """Fast-tier representative: the full MultiCue step compiles and runs
    on a tiny clip (training phase) with sane outputs/state. The behavioral
    suites above are medium/slow tier (their 120x160, 50-60 frame sims are
    the dominant cost of this module on the 1-core host)."""
    frames = _frames_with_object(n=3, h=24, w=32, appear=2)
    algo = get_algorithm("multicue")()
    st, masks = run_video(algo, jnp.asarray(frames))
    m = np.asarray(masks)
    assert m.shape == (3, 24, 32) and m.dtype == np.uint8
    assert m[:2].sum() == 0  # training phase emits empty masks
    assert int(st["t"]) == 3
