"""KDE (Elgammal) vs a sequential numpy oracle of ae/NPBGSubtractor.cpp."""

import jax.numpy as jnp
import numpy as np

from tracking_tpu.bgs.kde import SEGMABINS, SEGMAMAX, SEGMAMIN, _C1N, _C2
from tracking_tpu.core.registry import get_algorithm
from tracking_tpu.runner import run_video

HISTBINS = 20


def np_sngnrn(f):
    b, g, r = f[..., 0].astype(int), f[..., 1].astype(int), f[..., 2].astype(int)
    s = 255.0 / (b + g + r + 30)
    out = np.empty_like(f)
    out[..., 0] = (b + g + r) // 3
    out[..., 1] = np.minimum(((g + 10) * s).astype(int), 255)
    out[..., 2] = np.minimum(((r + 10) * s).astype(int), 255)
    return out


def oracle_kde(frames, learn=10, S=50, th=1e-7, alpha=0.3):
    """Full-sum restatement of the subset color-ratio path + pair updates."""
    H, W = frames.shape[1:3]
    seq = np.zeros((S, H, W, 3), np.uint8)
    qtop = np.zeros((H, W), np.int32)
    hist = np.zeros((H, W, 3, HISTBINS), np.uint8)
    sd = np.zeros((H, W, 3), np.uint8)
    tb = np.zeros((2, H, W, 3), np.uint8)
    tbm = np.zeros((2, H, W), np.uint8)
    tb_top = tb_count = time_index = 0
    acc = np.zeros((H, W), np.int64)
    out = []
    for t, f in enumerate(frames):
        img = np_sngnrn(f)
        if t < learn:
            seq[t % S] = img
            out.append(np.zeros((H, W), np.uint8))
            continue
        if t == learn:
            d = np.minimum(
                np.abs(seq[: S - 1].astype(int) - seq[1:S].astype(int)), HISTBINS - 1
            )
            for k in range(HISTBINS):
                hist[..., k] = (d == k).sum(0)
            cum = np.cumsum(hist.astype(int), -1)
            mb = np.argmax(cum >= (S - 1) // 2, -1)
            x2 = np.take_along_axis(cum, mb[..., None], -1)[..., 0]
            hb = np.take_along_axis(hist.astype(int), mb[..., None], -1)[..., 0]
            x1 = x2 - hb
            v = 1.04 * (mb - (x2 - (S - 1) // 2) / np.maximum(x2 - x1, 1))
            v = np.maximum(v, SEGMAMIN)
            fac = (SEGMABINS - 1) / (SEGMAMAX - SEGMAMIN)
            sd = np.where(
                v >= SEGMAMAX, SEGMABINS - 1, np.floor((v - SEGMAMIN) * fac + 0.5)
            ).astype(np.uint8)
        # probability (full sum)
        g = seq.astype(np.float64)
        x = img.astype(np.float64)
        g0 = g[..., 0]
        near = g0 < 3.0 / alpha
        x1b = np.where(near, np.trunc(g0 - 3), np.trunc(g0 * (1 - alpha) + 0.5))
        x2b = np.where(near, np.trunc(g0 + 3), np.trunc(g0 * (1 + alpha) + 0.5))
        gate = (x1b < x[None, ..., 0]) & (x[None, ..., 0] < x2b)
        k2 = _C1N[sd[..., 1]] * np.exp(
            _C2[sd[..., 1]] * (g[..., 1] - x[None, ..., 1]) ** 2
        )
        k3 = _C1N[sd[..., 2]] * np.exp(
            _C2[sd[..., 2]] * (g[..., 2] - x[None, ..., 2]) ** 2
        )
        p = np.where(gate, k2 * k3, 0.0).mean(0)
        mask = np.where(p > th, 0, 255).astype(np.uint8)
        out.append(mask)
        # pair update
        nxt = (tb_top + 1) % 2
        if time_index % 2 == 0 and tb_count >= 2:
            ok = (tbm[tb_top] == 0) & (tbm[nxt] == 0)
            f1, f2 = tb[tb_top], tb[nxt]
            q1, q2 = qtop, (qtop + 1) % S
            for r in range(H):
                for c in range(W):
                    if not ok[r, c]:
                        continue
                    o1 = seq[q1[r, c], r, c].astype(int)
                    o2 = seq[q2[r, c], r, c].astype(int)
                    n1 = f1[r, c].astype(int)
                    n2 = f2[r, c].astype(int)
                    for ch in range(3):
                        badd = min(abs(n1[ch] - n2[ch]), HISTBINS - 1)
                        brem = min(abs(o1[ch] - o2[ch]), HISTBINS - 1)
                        hist[r, c, ch, badd] += 1  # u8 wrap faithful
                        hist[r, c, ch, brem] -= 1
                    seq[q1[r, c], r, c] = f1[r, c]
                    seq[q2[r, c], r, c] = f2[r, c]
            qtop = np.where(ok, (qtop + 2) % S, qtop)
        acc = np.where(mask > 0, acc + 1, 0)
        stored = np.where(acc > 500, 0, mask).astype(np.uint8)
        tb[tb_top] = img
        tbm[tb_top] = stored
        tb_top = nxt
        tb_count += 1
        time_index += 1
    return np.stack(out)


def test_kde_matches_oracle(video_frames):
    crop = video_frames[:25, 60:76, 100:124]  # 16×24, 25 frames
    algo = get_algorithm("KDE")()
    _, masks = run_video(algo, jnp.asarray(crop))
    ours = np.asarray(masks)
    ref = oracle_kde(crop)
    mismatch = (ours != ref).mean()
    assert mismatch < 1e-3, f"kde mismatch {mismatch:.2e}"


def test_kde_learning_phase_empty(video_frames):
    crop = video_frames[:12, :16, :16]
    algo = get_algorithm("KDE")()
    _, masks = run_video(algo, jnp.asarray(crop))
    assert np.asarray(masks)[:10].sum() == 0
