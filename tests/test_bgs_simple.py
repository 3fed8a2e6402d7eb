"""Simple BGS family vs numpy oracles on real reference video frames.

The oracles re-state the reference C++ math (cited per algorithm) in numpy
with OpenCV numeric conventions; the JAX implementations must match
bit-exactly on deterministic algorithms.
"""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from tracking_tpu.core.registry import get_algorithm, list_algorithms
from tracking_tpu.runner import run_video


def cv_gray(img):
    return cv2.cvtColor(img, cv2.COLOR_BGR2GRAY) if img.ndim == 3 else img


def cv_u8(x):
    return np.clip(np.rint(x * 255.0), 0, 255).astype(np.uint8)


def thresh(img, t):
    return np.where(img > t, 255, 0).astype(np.uint8)


def run_algo(name, frames, **cfg):
    algo_cls = get_algorithm(name)
    algo = algo_cls(**cfg)
    _, masks = run_video(algo, jnp.asarray(frames))
    return np.asarray(masks)


# -- oracles ---------------------------------------------------------------

def oracle_framediff(frames, t=15):
    """FrameDifferenceBGS.cpp:29-61"""
    out = [np.zeros(frames.shape[1:3], np.uint8)]
    for i in range(1, len(frames)):
        d = cv2.absdiff(frames[i - 1], frames[i])
        out.append(thresh(cv_gray(d), t))
    return np.stack(out)


def oracle_staticdiff(frames, t=15):
    """StaticFrameDifferenceBGS.cpp:29-57"""
    bg = frames[0]
    return np.stack([thresh(cv_gray(cv2.absdiff(f, bg)), t) for f in frames])


def oracle_wmovmean(frames, t=15):
    """WeightedMovingMeanBGS.cpp:29-96"""
    out = [np.zeros(frames.shape[1:3], np.uint8) for _ in range(2)]
    for i in range(2, len(frames)):
        f = frames[i].astype(np.float32) / 255.0
        f1 = frames[i - 1].astype(np.float32) / 255.0
        f2 = frames[i - 2].astype(np.float32) / 255.0
        bg = cv_u8(f * 0.5 + f1 * 0.3 + f2 * 0.2)
        out.append(thresh(cv_gray(cv2.absdiff(frames[i], bg)), t))
    return np.stack(out)


def oracle_wmovvar(frames, t=15):
    """WeightedMovingVarianceBGS.cpp:30-117"""
    out = [np.zeros(frames.shape[1:3], np.uint8) for _ in range(2)]
    for i in range(2, len(frames)):
        f = frames[i].astype(np.float32) / 255.0
        f1 = frames[i - 1].astype(np.float32) / 255.0
        f2 = frames[i - 2].astype(np.float32) / 255.0
        mean = f * 0.5 + f1 * 0.3 + f2 * 0.2
        var = (
            0.5 * np.abs(f - mean) ** 2
            + 0.3 * np.abs(f1 - mean) ** 2
            + 0.2 * np.abs(f2 - mean) ** 2
        )
        out.append(thresh(cv_gray(cv_u8(np.sqrt(var))), t))
    return np.stack(out)


def oracle_adaptive(frames, alpha=0.05, t=15):
    """AdaptiveBackgroundLearning.cpp:30-83 (limit=-1 path)"""
    bg = frames[0].copy()
    out = []
    for f in frames:
        ff = f.astype(np.float32) / 255.0
        bf = bg.astype(np.float32) / 255.0
        diff = np.abs(ff - bf)
        bg = cv_u8(alpha * ff + (1 - alpha) * bf)
        out.append(thresh(cv_gray(cv_u8(diff)), t))
    return np.stack(out)


def oracle_adaptive_selective(frames, learning_frames=90, al=0.05, ad=0.05, t=25):
    """AdaptiveSelectiveBackgroundLearning.cpp:31-105"""
    bg = cv_gray(frames[0]).copy()
    counter = 0
    out = []
    for f in frames:
        g = cv_gray(f)
        ff = g.astype(np.float32) / 255.0
        bf = bg.astype(np.float32) / 255.0
        fg = thresh(cv_u8(np.abs(ff - bf)), t)
        fg = cv2.medianBlur(fg, 3)
        if learning_frames > 0 and counter <= learning_frames:
            bf = al * ff + (1 - al) * bf
            counter += 1
        else:
            upd = fg == 0
            bf = np.where(upd, ad * ff + (1 - ad) * bf, bf)
        bg = cv_u8(bf)
        out.append(fg)
    return np.stack(out)


# -- tests -----------------------------------------------------------------

def iou(a, b):
    a, b = a > 0, b > 0
    u = (a | b).sum()
    return 1.0 if u == 0 else (a & b).sum() / u


@pytest.mark.parametrize(
    "name,oracle",
    [
        ("FrameDifferenceBGS", oracle_framediff),
        ("StaticFrameDifferenceBGS", oracle_staticdiff),
        ("WeightedMovingMeanBGS", oracle_wmovmean),
        ("WeightedMovingVarianceBGS", oracle_wmovvar),
        ("AdaptiveBackgroundLearning", oracle_adaptive),
        ("AdaptiveSelectiveBackgroundLearning", oracle_adaptive_selective),
    ],
)
def test_matches_oracle(video_frames, name, oracle):
    frames = video_frames[:30]
    ours = run_algo(name, frames)
    ref = oracle(frames)
    assert ours.shape == ref.shape
    # Bit-exact up to f32 fusion differences right at the threshold boundary:
    # allow a vanishing fraction of boundary pixels to flip, gate IoU hard.
    mismatch = (ours != ref).mean()
    assert mismatch < 1e-3, f"{name}: {mismatch:.2e} pixels differ"
    score = iou(ours[2:], ref[2:])
    assert score > 0.995, f"{name}: IoU {score:.4f}"


def test_registry_lookup():
    algos = list_algorithms()
    assert "FrameDifferenceBGS" in algos
    assert get_algorithm(0).name == "FrameDifferenceBGS"
    assert get_algorithm("framediff").name == "FrameDifferenceBGS"


def test_streaming_chunks_equal_single_scan(video_frames):
    """State carried across chunks must reproduce the single-scan result."""
    algo = get_algorithm("AdaptiveBackgroundLearning")()
    frames = jnp.asarray(video_frames[:24])
    _, masks_all = run_video(algo, frames)
    state = None
    parts = []
    for i in range(0, 24, 8):
        state, m = run_video(algo, frames[i : i + 8], state=state)
        parts.append(np.asarray(m))
    np.testing.assert_array_equal(np.asarray(masks_all), np.concatenate(parts))


def test_grayscale_input_supported(video_frames):
    gray = np.stack([cv_gray(f) for f in video_frames[:8]])
    algo = get_algorithm("FrameDifferenceBGS")()
    _, masks = run_video(algo, jnp.asarray(gray))
    assert masks.shape == gray.shape
