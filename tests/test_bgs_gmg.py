"""GMG vs a sequential numpy oracle of OpenCV 2.4's bgfg_gmg semantics."""

import cv2
import jax.numpy as jnp
import numpy as np

from tracking_tpu.core.registry import get_algorithm
from tracking_tpu.runner import run_video


def oracle_gmg(frames, init_frames=20, decision=0.7, max_features=64,
               lr=0.025, levels=16, prior=0.8, smoothing=7):
    H, W = frames.shape[1:3]
    colors = [[[] for _ in range(W)] for _ in range(H)]
    weights = [[[] for _ in range(W)] for _ in range(H)]
    out = []
    for t, f in enumerate(frames):
        q = (f.astype(np.uint32) * levels) // 256
        code = np.zeros((H, W), np.uint32)
        for c in range(f.shape[-1]):
            code = code * levels + q[..., c]
        mask = np.zeros((H, W), np.uint8)
        training = t < init_frames
        for r in range(H):
            for cc in range(W):
                cs, ws = colors[r][cc], weights[r][cc]
                v = int(code[r, cc])
                try:
                    fi = cs.index(v)
                except ValueError:
                    fi = -1
                if not training:
                    w = ws[fi] if fi >= 0 else 0.0
                    post = w * prior / (w * prior + (1 - w) * (1 - prior))
                    if (1 - post) > decision:
                        mask[r, cc] = 255
                    ws[:] = [x * (1 - lr) for x in ws]
                    insert_w = lr
                else:
                    insert_w = 1.0
                grew = False
                if fi >= 0:
                    insert_w += ws[fi]
                    del cs[fi], ws[fi]
                    cs.insert(0, v), ws.insert(0, insert_w)
                elif len(cs) == max_features:
                    cs.pop(), ws.pop()
                    cs.insert(0, v), ws.insert(0, insert_w)
                else:
                    cs.append(v), ws.append(insert_w)
                    grew = True
                if (grew and not training) or t == init_frames - 1:
                    s = sum(ws)
                    if s > 0:
                        ws[:] = [x / s for x in ws]
        if smoothing > 0:
            mask = cv2.medianBlur(mask, smoothing)
        out.append(mask)
    return np.stack(out)


def test_gmg_matches_oracle(video_frames):
    crop = video_frames[:30, 60:84, 100:132]
    algo = get_algorithm("GMG")()
    _, masks = run_video(algo, jnp.asarray(crop))
    ours = np.asarray(masks)
    ref = oracle_gmg(crop)
    mismatch = (ours != ref).mean()
    assert mismatch < 1e-3, f"gmg mismatch {mismatch:.2e}"


def test_gmg_training_phase_empty(video_frames):
    crop = video_frames[:25, :32, :32]
    algo = get_algorithm("GMG")()
    _, masks = run_video(algo, jnp.asarray(crop))
    assert np.asarray(masks)[:20].sum() == 0
