"""dp-family + sigma-delta vs numpy oracles (reference math cited inline)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tracking_tpu.core.registry import get_algorithm
from tracking_tpu.runner import run_video


def run_algo(name, frames, **cfg):
    algo = get_algorithm(name)(**cfg)
    _, masks = run_video(algo, jnp.asarray(frames))
    return np.asarray(masks)


def oracle_adaptive_median(frames, thr=40, sampling=7):
    """dp/AdaptiveMedianBGS.cpp:63-111 (high mask = 2*thr), wrapper :29-80"""
    median = frames[0].astype(np.int16).copy()
    out = []
    for t, f in enumerate(frames):
        fi = f.astype(np.int16)
        diff = np.abs(median - fi)
        bg = (diff <= 2 * thr).all(axis=-1)
        out.append(np.where(bg, 0, 255).astype(np.uint8))
        if t % sampling == 1:
            median = median + np.sign(fi - median)
    return np.stack(out)


def oracle_mean(frames, thr=2700, alpha=1e-6):
    """dp/MeanBGS.cpp:32-127"""
    mean = frames[0].astype(np.float32).copy()
    out = []
    for f in frames:
        ff = f.astype(np.float32)
        dist = ((ff - mean) ** 2).sum(axis=-1)
        out.append(np.where(dist > 2 * thr, 255, 0).astype(np.uint8))
        mean = alpha * mean + (1 - alpha) * ff
    return np.stack(out)


def oracle_wren(frames, thr=12.25, alpha=0.005):
    """dp/WrenGA.cpp:47-172"""
    mu = frames[0].astype(np.float32).copy()
    var = np.full(frames.shape[1:3], 36.0, np.float32)
    out = []
    for f in frames:
        ff = f.astype(np.float32)
        delta = mu - ff
        dist = (delta**2).sum(axis=-1)
        out.append(np.where(dist > 2 * thr * var, 255, 0).astype(np.uint8))
        mu = mu - alpha * delta
        var = np.clip(var + alpha * (dist - var), 4.0, 180.0)
    return np.stack(out)


def oracle_sigma_delta(frames, N=1, vmin=15, vmax=255):
    """bl/sdLaMa091.cpp:379-465 + wrapper SigmaDeltaBGS.cpp:20-55"""
    M = frames[0].astype(np.int32).copy()
    V = np.full(frames.shape[1:], vmin, np.int32)
    out = [np.zeros(frames.shape[1:3], np.uint8)]
    for f in frames[1:]:
        fi = f.astype(np.int32)
        M = M + np.sign(fi - M)
        O = np.abs(M - fi)
        V = np.clip((V + np.sign(N * O - V)) & 0xFF, vmin, vmax)
        seg = np.where(O < V, 0, 255).astype(np.uint8)
        out.append(seg[..., 0])
    return np.stack(out)


@pytest.mark.parametrize(
    "name,oracle",
    [
        ("DPAdaptiveMedianBGS", oracle_adaptive_median),
        ("DPMeanBGS", oracle_mean),
        ("DPWrenGABGS", oracle_wren),
        ("SigmaDeltaBGS", oracle_sigma_delta),
    ],
)
def test_matches_oracle(video_frames, name, oracle):
    frames = video_frames[:25]
    ours = run_algo(name, frames)
    ref = oracle(frames)
    mismatch = (ours != ref).mean()
    assert mismatch < 1e-3, f"{name}: {mismatch:.2e} pixels differ"
