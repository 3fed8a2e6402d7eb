"""DPTextureBGS vs numpy oracle; IMBS behavioral checks."""

import jax.numpy as jnp
import numpy as np

from tracking_tpu.core.registry import get_algorithm
from tracking_tpu.runner import run_video

R, TR, BINS, HYST, ALPHA = 5, 2, 64, 3, 0.05
B = R + TR


def np_lbp6(plane):
    h, w = plane.shape
    c = plane.astype(np.int32)
    p = np.pad(c, TR, mode="edge")
    code = np.zeros((h, w), np.int32)
    for dr, dc, bit in [(-2, 0, 1), (-1, -2, 2), (-1, 2, 4), (1, -2, 8), (1, 2, 16), (2, 0, 32)]:
        nb = p[TR + dr : TR + dr + h, TR + dc : TR + dc + w]
        code += np.where(c - nb + HYST >= 0, bit, 0)
    out = np.zeros((h, w), np.int32)
    out[TR : h - TR, TR : w - TR] = code[TR : h - TR, TR : w - TR]
    return out


def np_hist(code):
    h, w = code.shape
    onehot = (code[None] == np.arange(BINS)[:, None, None]).astype(np.int32)
    padded = np.pad(onehot, ((0, 0), (R, R), (R, R)))
    k = 2 * R + 1
    cs = padded.cumsum(1).cumsum(2)
    cs = np.pad(cs, ((0, 0), (1, 0), (1, 0)))
    cnt = cs[:, k:, k:] - cs[:, :-k, k:] - cs[:, k:, :-k] + cs[:, :-k, :-k]
    return cnt


def oracle_texture(frames):
    H, W = frames.shape[1:3]
    thr = 0.5 * (2 * R + 1) ** 2 * 3
    valid = np.zeros((H, W), bool)
    valid[B : H - B, B : W - B] = True
    model = None
    out = []
    for t, f in enumerate(frames):
        cur = np.stack([np_hist(np_lbp6(f[..., ch])) for ch in range(3)])
        if t == 0:
            model = np.where(valid[None, None], cur, 0).astype(np.float64)
        prox = np.minimum(model.astype(np.int32), cur).sum((0, 1))
        fg = np.where((prox < thr) & valid, 255, 0).astype(np.uint8)
        out.append(fg)
        p = max(H, W)
        padded = np.full((p, p), 255, np.uint8)
        padded[:H, :W] = fg
        upd = (padded.T[:H, :W] == 0) & valid
        blended = np.clip(np.rint(ALPHA * cur + (1 - ALPHA) * model), 0, 255)
        model = np.where(upd[None, None], blended, model)
    return np.stack(out)


def test_texture_matches_oracle(video_frames):
    crop = video_frames[:8, 40:88, 90:154]  # 48×64
    algo = get_algorithm("DPTextureBGS")()
    _, masks = run_video(algo, jnp.asarray(crop))
    ours = np.asarray(masks)
    ref = oracle_texture(crop)
    mismatch = (ours != ref).mean()
    assert mismatch < 1e-3, f"texture mismatch {mismatch:.2e}"


def test_imbs_builds_model_and_detects():
    # static background for the whole model-building phase, then an object
    # appears: must be labeled FOREGROUND (255) and survive area filtering.
    rng = np.random.default_rng(0)
    bg = rng.integers(100, 140, (1, 48, 64, 3), np.uint8)
    frames = np.tile(bg, (80, 1, 1, 1))
    frames[40:, 10:30, 20:44] = 250  # 20×24 object (area 480 ≥ minArea)
    algo = get_algorithm("imbs")(fps=2.0)  # sample every frame
    st, masks = run_video(algo, jnp.asarray(frames))
    m = np.asarray(masks)
    assert bool(st["model_ready"])
    assert set(np.unique(m)) <= {0, 80, 180, 255}
    obj = m[42, 12:28, 22:42]
    assert (obj == 255).mean() > 0.9, f"object not detected: {np.unique(obj)}"
    # background stays clean
    assert (m[42, :8] == 0).all()


def test_imbs_static_scene_stays_background():
    frames = np.tile(
        np.full((1, 24, 32, 3), 128, np.uint8), (80, 1, 1, 1)
    )
    algo = get_algorithm("imbs")(fps=2.0)
    st, masks = run_video(algo, jnp.asarray(frames))
    m = np.asarray(masks)
    assert bool(st["model_ready"])
    assert m[35:].sum() == 0
