"""lb family, VuMeter, PratiMediod, Eigenbackground vs numpy oracles."""

import jax.numpy as jnp
import numpy as np
import pytest

from tracking_tpu.core.registry import get_algorithm
from tracking_tpu.runner import run_video


def run_algo(name, frames, **cfg):
    algo = get_algorithm(name)(**cfg)
    _, masks = run_video(algo, jnp.asarray(frames))
    return np.asarray(masks)


# -- LBSimpleGaussian oracle (lb/BGModelGauss.cpp:125-198) ------------------

def oracle_lb_gauss(frames, sensitivity=66, noise_v=162, lr=18):
    thr = 100.0 * (sensitivity / 255.0) ** 2
    noise = 100.0 * (noise_v / 255.0)
    alpha = (lr / 255.0) ** 3
    mu = frames[0].astype(np.float64).copy()
    var = np.full_like(mu, 50.0)
    out = []
    for f in frames:
        src = f.astype(np.float64)
        d = src - mu
        d2 = (d * d / var).sum(-1)
        out.append(np.where(d2 < thr, 0, 255).astype(np.uint8))
        mu = mu + alpha * d
        var = np.minimum(var + alpha * ((src - mu) ** 2 - var), noise)
    return np.stack(out)


def test_lb_gauss_matches_oracle(video_frames):
    frames = video_frames[:25]
    ours = run_algo("LBSimpleGaussian", frames)
    ref = oracle_lb_gauss(frames)
    assert (ours != ref).mean() < 1e-3


# -- LBFuzzyGaussian oracle (lb/BGModelFuzzyGauss.cpp:129-210) --------------

def oracle_lb_fuzzy_gauss(frames, sens=72, bg_thr=162, lr=49, noise_v=195):
    thr = 100.0 * (sens / 255.0) ** 2
    thr_bg = bg_thr / 255.0
    alphamax = (lr / 255.0) ** 3
    noise = 100.0 * (noise_v / 255.0)
    mu = frames[0].astype(np.float64).copy()
    var = np.full_like(mu, 50.0)
    out = []
    for f in frames:
        src = f.astype(np.float64)
        d = src - mu
        d2 = (d * d / var).sum(-1)
        fuzzy = np.where(d2 < thr, d2 / thr, 1.0)
        alpha = alphamax * np.exp(-5.0 * fuzzy)
        mu = mu + alpha[..., None] * d
        var = np.maximum(var + alpha[..., None] * ((src - mu) ** 2 - var), noise)
        out.append(np.where(fuzzy >= thr_bg, 255, 0).astype(np.uint8))
    return np.stack(out)


def test_lb_fuzzy_gauss_matches_oracle(video_frames):
    frames = video_frames[:25]
    ours = run_algo("LBFuzzyGaussian", frames)
    ref = oracle_lb_fuzzy_gauss(frames)
    assert (ours != ref).mean() < 1e-3


# -- VuMeter oracle (av/TBackgroundVuMeter.cpp:260-319) ---------------------

def oracle_vumeter(frames, bin_size=8, alpha=0.995, thr=0.03, filt=False):
    import cv2

    bins = 256 // bin_size
    T, H, W = frames.shape[0], frames.shape[1], frames.shape[2]
    # CV_RGB2GRAY on BGR data (swapped weights)
    grays = np.stack(
        [cv2.cvtColor(f, cv2.COLOR_RGB2GRAY) for f in frames]
    )
    hist = np.zeros((bins, H, W), np.float32)
    bg = grays[0].copy()
    out = []
    for n, g in enumerate(grays):
        hist *= alpha
        bi = np.clip(g.astype(int) // bin_size, 0, bins - 1)
        yy, xx = np.mgrid[0:H, 0:W]
        hist[bi, yy, xx] += 1.0 - alpha
        cur = hist[bi, yy, xx]
        mask = np.where(cur < thr, 255, 0).astype(np.uint8)
        bgb = np.clip(bg.astype(int) // bin_size, 0, bins - 1)
        bgm = hist[bgb, yy, xx]
        bg = np.where(bgm < cur, g, bg)
        if n + 1 < 5:
            mask[:] = 0
        out.append(mask)
    return np.stack(out)


def test_vumeter_matches_oracle(video_frames):
    frames = video_frames[:30]
    ours = run_algo("VuMeter", frames, enableFilter=False)
    ref = oracle_vumeter(frames)
    assert (ours != ref).mean() < 1e-3


# -- behavioral gates for the heavier models --------------------------------

@pytest.mark.parametrize(
    "name", ["LBMixtureOfGaussians", "LBAdaptiveSOM", "LBFuzzyAdaptiveSOM"]
)
def test_lb_models_behave(video_frames, name):
    frames = video_frames[:40]
    masks = run_algo(name, frames)
    assert masks.shape == frames.shape[:3]
    # static scene: quiet after settling
    assert (masks[25:35] > 0).mean() < 0.3


def test_prati_mediod(video_frames):
    frames = video_frames[:40]
    masks = run_algo("DPPratiMediodBGS", frames)
    # empty until frame historySize (16)
    assert (masks[:16] > 0).sum() == 0
    assert (masks[20:35] > 0).mean() < 0.3


def test_eigenbackground(video_frames):
    frames = video_frames[:40]
    masks = run_algo("DPEigenbackgroundBGS", frames)
    # empty until frame historySize (20)
    assert (masks[:20] > 0).sum() == 0
    assert masks.shape == frames.shape[:3]
    # static scene reconstructs well
    assert (masks[25:35] > 0).mean() < 0.3


def oracle_prati_small(frames, thr=30, rate=5, S=16):
    """Direct restatement of dp/PratiMediodBGS.cpp on a small crop."""
    T, H, W, C = frames.shape
    buf = np.zeros((S, H, W, C), np.int32)
    dist = np.zeros((S, H, W), np.int64)
    count = 0
    pos = 0
    median = np.zeros((H, W, C), np.int32)
    med_dist = np.full((H, W), np.iinfo(np.int64).max, np.int64)
    out = []
    for t in range(T):
        f = frames[t].astype(np.int32)
        # subtract
        d = np.abs(f - median).max(-1)
        low = d > thr
        high = d > 2 * thr
        import scipy.ndimage as ndi

        near = ndi.maximum_filter(high.astype(np.uint8), size=3) > 0
        comb = high | (low & near)
        comb[0, :] = comb[-1, :] = False
        comb[:, 0] = comb[:, -1] = False
        out.append(np.where(comb & (t >= S), 255, 0).astype(np.uint8))
        # update
        if t % rate == 0:
            if count < S:
                dn = np.abs(buf[:count] - f[None]).max(-1)
                med_dist = np.full((H, W), np.iinfo(np.int64).max, np.int64)
                for s in range(count):
                    dist[s] += dn[s]
                    upd = dist[s] < med_dist
                    med_dist = np.where(upd, dist[s], med_dist)
                    median = np.where(upd[..., None], buf[s], median)
                new_sum = dn.sum(0) if count else np.zeros((H, W), np.int64)
                dist[count] = new_sum
                buf[count] = f
                wins = new_sum < med_dist
                median = np.where(wins[..., None], f, median)
                med_dist = np.where(wins, new_sum, med_dist)
                count += 1
                pos = 0
            else:
                old = buf[pos]
                d_old = np.abs(buf - old[None]).max(-1)
                dist -= d_old
                dn = np.abs(buf - f[None]).max(-1)
                med_dist = np.full((H, W), np.iinfo(np.int64).max, np.int64)
                for s in range(S):
                    dist[s] += dn[s]
                    upd = dist[s] < med_dist
                    med_dist = np.where(upd, dist[s], med_dist)
                    median = np.where(upd[..., None], buf[s], median)
                new_sum = dn.sum(0)
                wins = new_sum < med_dist
                median = np.where(wins[..., None], f, median)
                med_dist = np.where(wins, new_sum, med_dist)
                dist[pos] = new_sum
                buf[pos] = f
                pos = (pos + 1) % S
    return np.stack(out)


def test_prati_matches_oracle_crop(video_frames):
    crop = video_frames[:45, 60:92, 100:148]
    ours = run_algo("DPPratiMediodBGS", crop)
    ref = oracle_prati_small(crop)
    assert (ours != ref).mean() < 2e-3
