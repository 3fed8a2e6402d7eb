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


def test_fgd_f16_statistics_track_f32():
    """The P/Pb Bayes statistics are stored f16 (HBM lever, fgd.STAT_DTYPE;
    round-5 dtype survey: bf16 rejected — it stalls the alpha2 absorption
    dynamic — and f32 exact but +1.4 ms/frame); the model is a
    re-derivation with behavioral gates, so the dtype is a free design
    choice — but pin that f16 decisions track an f32 run on dynamic
    content (agreement >= 0.995 over the clip, settled foreground count
    within 1%)."""
    rng = np.random.default_rng(3)
    base = rng.integers(0, 220, (40, 60, 3), np.uint8)
    frames = np.repeat(base[None], 50, axis=0).copy()
    for t in range(50):  # moving square + flickering background region
        frames[t, 10 + t % 20 : 18 + t % 20, 12:24] = 255
        frames[t, 30:36, 40:52] = 80 + 60 * (t % 2)

    import tracking_tpu.bgs.fgd as F

    masks16, _ = _run("FGD", frames)
    saved = F.FGD.STAT_DTYPE
    F.FGD.STAT_DTYPE = jnp.float32
    try:
        masks32, _ = _run("FGD", frames)
    finally:
        F.FGD.STAT_DTYPE = saved

    agree = (masks16 == masks32).mean()
    assert agree >= 0.995, agree
    n16 = (masks16[-1] > 0).sum()
    n32 = (masks32[-1] > 0).sum()
    assert abs(int(n16) - int(n32)) <= max(10, 0.01 * max(n16, n32)), (n16, n32)


def test_fgd_f16_long_horizon_real_content():
    """Long-horizon f16 drift gate on REAL content (ADVICE r3): f16's 11-bit
    mantissa drops decay/reinforce increments below ~P·2⁻¹¹, so drift is
    unbounded by the 50-frame synthetic gate above. Run the full reference
    video (374 frames, downscaled 2×) under f16 and f32 statistics and gate
    per-frame mask IoU over the settled tail — if f16 quantization ever
    compounds into decision flips at scale, this is where it shows.

    Measured on this content: pixel agreement 0.9970 over all 374 frames,
    mean settled-tail IoU ≥ 0.97, worst dense frame ≥ 0.90 — drift is real
    but bounded; gates are set at the same 0.995-agreement tolerance the
    short synthetic gate above uses (FGD has no compiled-C++ golden oracle
    — it is a re-derivation with behavioral gates throughout)."""
    import os

    from tests.conftest import REFERENCE
    from tracking_tpu.io.video import read_video

    path = os.path.join(REFERENCE, "dataset", "video.avi")
    if not os.path.exists(path):
        pytest.skip("reference video fixture not available")
    frames = read_video(path)[:, ::2, ::2]  # 374 × 88 × 160

    import tracking_tpu.bgs.fgd as F

    masks16, _ = _run("FGD", frames)
    saved = F.FGD.STAT_DTYPE
    F.FGD.STAT_DTYPE = jnp.float32
    try:
        masks32, _ = _run("FGD", frames)
    finally:
        F.FGD.STAT_DTYPE = saved

    # per-frame IoU over the settled tail (first 60 frames = learning phase)
    a = masks16[60:] > 0
    b = masks32[60:] > 0
    inter = (a & b).reshape(a.shape[0], -1).sum(1)
    union = (a | b).reshape(a.shape[0], -1).sum(1)
    iou = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
    # empty/sparse frames are noisy ratio-wise; gate the mean and the
    # worst dense frame separately
    assert iou.mean() >= 0.97, iou.mean()
    dense = union > 200
    if dense.any():
        assert iou[dense].min() >= 0.90, (iou[dense].min(), iou[dense].argmin())
    # global pixel agreement stays tight across the whole clip (same
    # tolerance as the short gate above; measured 0.9970)
    agree = (masks16 == masks32).mean()
    assert agree >= 0.995, agree
