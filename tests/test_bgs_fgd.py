"""FGD (FG_0/FG_0S) behavioral tests — re-derived model, no in-repo oracle
(the reference links OpenCV legacy's cvbgfg_acmmm2003, outside the repo)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tracking_tpu.core.registry import get_algorithm


def _run(name, frames):
    algo = get_algorithm(name)()
    h, w = frames.shape[1:3]
    st = algo.init(h, w, 3)
    out = []
    for f in frames:
        st, fg, _bg = algo.step(st, jnp.asarray(f))
        out.append(np.asarray(fg))
    return np.stack(out), st


@pytest.mark.parametrize("name", ["FGD", "FG_0S"])
def test_fgd_static_scene_is_background(name):
    rng = np.random.default_rng(0)
    base = rng.integers(60, 200, (40, 56, 3), np.uint8)
    frames = np.repeat(base[None], 15, axis=0)
    fgs, _ = _run(name, frames)
    assert fgs[5:].mean() == 0.0


def test_fgd_detects_moving_object_and_recovers():
    rng = np.random.default_rng(1)
    base = rng.integers(60, 200, (40, 56, 3), np.uint8)
    frames = []
    for f in range(30):
        img = base.copy()
        if 10 <= f < 22:
            cx = 6 + 3 * (f - 10)
            img[12:26, cx : cx + 8] = (230, 30, 30)
        frames.append(img)
    fgs, _ = _run("FGD", np.stack(frames))
    moving = (fgs[15] > 0).mean()
    assert moving > 0.01  # object detected while present
    assert (fgs[-1] > 0).mean() < moving  # scene recovers after it leaves


def test_fgd_cooccurrence_absorbs_dynamic_background():
    """A strictly alternating two-state background (flicker) should be
    learned as background via the co-occurrence table."""
    rng = np.random.default_rng(2)
    a = rng.integers(60, 200, (32, 48, 3), np.uint8)
    b = np.clip(a.astype(np.int32) + 40, 0, 255).astype(np.uint8)
    frames = np.stack([a if f % 2 == 0 else b for f in range(140)])
    fgs, _ = _run("FGD", frames)
    # absorbed after the absorbFrames window + co-occurrence reinforcement
    assert (fgs[-8:] > 0).mean() < 0.05
    assert (fgs[5:13] > 0).mean() > 0.5  # initially flagged as change


def test_fgd_min_area_gate_drops_specks():
    rng = np.random.default_rng(3)
    base = rng.integers(60, 200, (40, 56, 3), np.uint8)
    frames = [base.copy() for _ in range(14)]
    img = base.copy()
    img[5, 5] = (255, 255, 255)  # 1-px speck
    img[20:32, 20:32] = (240, 20, 20)  # 144-px object
    frames.append(img)
    fgs, _ = _run("FGD", np.stack(frames))
    last = fgs[-1] > 0
    assert not last[5, 5]
    assert last[22:30, 22:30].mean() > 0.3
