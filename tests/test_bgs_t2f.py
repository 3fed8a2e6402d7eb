"""tb family: T2FGMM UM/UV vs numpy oracle, T2FMRF HMM, fuzzy integrals."""

import jax.numpy as jnp
import numpy as np
import pytest

from tracking_tpu.core.registry import get_algorithm
from tracking_tpu.runner import run_video


def run_algo(name, frames, **cfg):
    algo = get_algorithm(name)(**cfg)
    _, masks = run_video(algo, jnp.asarray(frames))
    return np.asarray(masks)


# -- T2FGMM oracle: restatement of tb/T2FGMM.cpp:105-289 --------------------

def _h_um(px, mu, var, km):
    d = np.abs(mu - px)
    lo, hi = mu - km * var, mu + km * var
    far = 2 * km * d / var
    near = d * d / (2 * var * var) + km * d / var + km * km / 2
    return np.where((px < lo) | (px > hi), far, near)


def _h_uv(px, mu, var, kv):
    d = px - mu
    return (1 / (kv * kv) - kv * kv) * d * d / (2 * var)


def oracle_t2fgmm(frames, um=True, thr=9.0, alpha=0.01, km=1.5, kv=0.6, K=3):
    H, W = frames.shape[1:3]
    w = np.zeros((H, W, K), np.float32)
    var = np.zeros((H, W, K), np.float32)
    mu = np.zeros((H, W, K, 3), np.float32)
    n = np.zeros((H, W), np.int32)
    bg_thr, init_var = 0.75, 36.0
    out = []
    for f in frames:
        mask = np.zeros((H, W), np.uint8)
        for r in range(H):
            for c in range(W):
                px = f[r, c].astype(np.float32)
                nm = n[r, c]
                fits = bg_high = False
                s, bgG = 0.0, 0
                for i in range(nm):
                    if s < bg_thr:
                        bgG += 1
                        s += w[r, c, i]
                    else:
                        break
                total = 0.0
                for i in range(nm):
                    wt = w[r, c, i]
                    if not fits:
                        v = var[r, c, i]
                        hch = (
                            _h_um(px, mu[r, c, i], v, km)
                            if um
                            else _h_uv(px, mu[r, c, i], v, kv)
                        )
                        dist = float((hch * hch).sum())
                        if dist < 2 * thr * v and i < bgG:
                            bg_high = True
                        if dist < thr * v:
                            fits = True
                            k = alpha / wt
                            w[r, c, i] = (1 - alpha) * wt + alpha
                            mu[r, c, i] -= k * np.abs(mu[r, c, i] - px)
                            sn = v + k * (dist - v)
                            var[r, c, i] = min(max(sn, 4.0), 5 * init_var)
                            wt = w[r, c, i]
                        else:
                            wt = (1 - alpha) * wt
                            w[r, c, i] = wt
                    else:
                        wt = (1 - alpha) * wt
                        w[r, c, i] = wt
                    total += wt
                if total > 0:
                    w[r, c, :nm] /= total

                def _sort(nm):
                    sig = np.where(
                        np.arange(K) < nm,
                        w[r, c] / np.sqrt(np.maximum(var[r, c], 1e-12)),
                        -np.inf,
                    )
                    order = np.argsort(-sig, kind="stable")
                    w[r, c] = w[r, c][order]
                    var[r, c] = var[r, c][order]
                    mu[r, c] = mu[r, c][order]

                _sort(nm)
                if not fits:
                    nm = min(nm + 1, K)
                    pos = nm - 1
                    mu[r, c, pos] = px
                    var[r, c, pos] = init_var
                    w[r, c, pos] = 1.0 if nm == 1 else alpha
                    w[r, c, :nm] /= w[r, c, :nm].sum()
                    _sort(nm)
                n[r, c] = nm
                mask[r, c] = 0 if bg_high else 255
        out.append(mask)
    return np.stack(out)


@pytest.mark.parametrize("name,um", [("T2FGMM_UM", True), ("T2FGMM_UV", False)])
def test_t2fgmm_matches_oracle(video_frames, name, um):
    crop = video_frames[:15, 60:84, 100:132]  # 24×32 crop
    ours = run_algo(name, crop)
    ref = oracle_t2fgmm(crop, um=um)
    mismatch = (ours != ref).mean()
    assert mismatch < 5e-3, f"{name} mismatch {mismatch:.2e}"


def test_t2fmrf_mask_matches_t2fgmm_with_mrf_defaults(video_frames):
    # The GMM part of T2FMRF is identical; only km/kv defaults differ and the
    # HMM rides alongside without touching the emitted (high) mask.
    crop = video_frames[:12, 60:84, 100:132]
    mrf = run_algo("T2FMRF_UM", crop)
    gmm = run_algo("T2FGMM_UM", crop, km=2.0, kv=0.9)
    assert (mrf != gmm).mean() < 1e-6


def test_t2fmrf_hmm_adapts(video_frames):
    # A pixel observed as background drives Ab2b → 1 (T2FMRF.cpp:345-355).
    frames = np.tile(video_frames[:1], (30, 1, 1, 1))[:, :8, :8]
    algo = get_algorithm("T2FMRF_UM")()
    state, _ = run_video(algo, jnp.asarray(frames))
    ab2b = np.asarray(state["Ab2b"])
    # α=0.01 over ~29 BG observations: 0.7·0.99²⁹ + (1−0.99²⁹) ≈ 0.775
    assert (ab2b > 0.75).all() and (ab2b < 1.0).all()


def test_t2fmrf_apply_mrf_smooths(video_frames):
    crop = video_frames[:15, 40:104, 80:176]
    plain = run_algo("T2FMRF_UM", crop)
    smoothed = run_algo("T2FMRF_UM", crop, applyMRF=True)
    # ICM's doubleton prior suppresses isolated flips → no more FG islands.
    assert smoothed.shape == plain.shape
    assert (smoothed[-1] != plain[-1]).any() or plain[-1].sum() == 0


# -- Fuzzy integrals: vectorized numpy oracle -------------------------------

def _np_lbp(g):
    h, w = g.shape
    acc = np.zeros_like(g)
    for (dr, dc, wt) in [(-1, 1, 1), (0, 1, 2), (1, 1, 4), (-1, 0, 8),
                         (1, 0, 16), (-1, -1, 32), (0, -1, 64), (1, -1, 128)]:
        nb = np.roll(g, shift=(-dr, -dc), axis=(0, 1))
        acc += wt * (nb >= g)
    out = np.zeros_like(g)
    out[1:h - 1, 1:w - 1] = acc[1:h - 1, 1:w - 1] / 255.0
    out[0, 0] = (2 * (g[1, 0] >= g[0, 0]) + 4 * (g[0, 1] >= g[0, 0])
                 + 8 * (g[1, 1] >= g[0, 0])) / 255.0
    return out


def _np_ratio(a, b):
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(a == b, 1.0, np.where(a < b, a / b, b / a))


def _np_gray(f):
    return 0.114 * f[..., 0] + 0.587 * f[..., 1] + 0.299 * f[..., 2]


def oracle_fuzzy(frames, sugeno=True, frames_to_learn=10, alpha_learn=0.1,
                 alpha_update=0.01, thr=0.67):
    import cv2

    g = np.array([0.6, 0.3, 0.1], np.float32)
    bg = None
    out = []
    for t, f_u8 in enumerate(frames):
        f = f_u8.astype(np.float32) / 255.0
        if t == 0:
            bg = f.copy()
        if t <= frames_to_learn:
            if t > 0:
                bg = alpha_learn * f + (1 - alpha_learn) * bg
            out.append(np.zeros(f.shape[:2], np.uint8))
            continue
        htex = _np_ratio(_np_lbp(_np_gray(f)), _np_lbp(_np_gray(bg)))
        delta = _np_ratio(f, bg)
        hi = np.stack([htex, delta[..., 0], delta[..., 1]], -1)
        idx = np.argsort(-hi, axis=-1, kind="stable")
        hs = np.take_along_axis(hi, idx, -1)
        hperm = np.take_along_axis(hs, idx, -1)
        gi = g[idx]
        xixj = gi[..., 1] + gi[..., 2]
        if sugeno:
            integral = np.maximum.reduce([
                np.zeros_like(xixj),
                np.minimum(hperm[..., 0], 1.0),
                np.minimum(hperm[..., 1], xixj),
                np.minimum(hperm[..., 2], gi[..., 2]),
            ])
        else:
            integral = (hperm[..., 0] * (1 - xixj)
                        + hperm[..., 1] * (xixj - gi[..., 2])
                        + hperm[..., 2] * gi[..., 2])
        integral = cv2.medianBlur(integral.astype(np.float32), 3)
        out.append(np.where(integral > thr, 0, 255).astype(np.uint8))
        mn, mx = integral.min(), integral.max()
        beta = 1 - integral + (0.0 if mn == mx else mn * (integral - mx) / (mn - mx))
        blended = alpha_update * f + (1 - alpha_update) * bg
        bg = beta[..., None] * bg + (1 - beta[..., None]) * blended
    return np.stack(out)


@pytest.mark.parametrize(
    "name,sugeno", [("FuzzySugenoIntegral", True), ("FuzzyChoquetIntegral", False)]
)
def test_fuzzy_integral_matches_oracle(video_frames, name, sugeno):
    frames = video_frames[:25, 40:104, 80:176]
    ours = run_algo(name, frames)
    ref = oracle_fuzzy(frames, sugeno=sugeno)
    mismatch = (ours != ref).mean()
    assert mismatch < 5e-3, f"{name} mismatch {mismatch:.2e}"
