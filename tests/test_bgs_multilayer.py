"""MultiLayerBGS vs a sequential numpy oracle of jmo/CMultiLayerBGS.cpp."""

import jax.numpy as jnp
import numpy as np

from tracking_tpu.core.registry import get_algorithm
from tracking_tpu.runner import run_video

PI = 3.141592653589793
OFFS = [(2, 0), (1, -2), (-1, -2), (-2, 0), (-1, 2), (1, 2)]
M, L = 5, 6


class Mode:
    __slots__ = ("w", "mw", "bi", "mini", "maxi", "bp", "layer", "ft", "lt", "freq", "layt")

    def __init__(self):
        self.w = self.mw = 0.0
        self.bi = np.zeros(3)
        self.mini = np.zeros(3)
        self.maxi = np.zeros(3)
        self.bp = np.zeros(L)
        self.layer = 0
        self.ft = self.lt = self.freq = -1
        self.layt = -1


def shift_zero(img, dx, dy):
    h, w = img.shape
    out = np.zeros_like(img)
    ys0, ys1 = max(dy, 0), min(h + dy, h)
    xs0, xs1 = max(dx, 0), min(w + dx, w)
    src = img[ys0:ys1, xs0:xs1]
    out[max(-dy, 0) : max(-dy, 0) + src.shape[0], max(-dx, 0) : max(-dx, 0) + src.shape[1]] = src
    return out


def gauss_blur(x, k, sigma):
    import cv2

    return cv2.GaussianBlur(x.astype(np.float32), (k, k), sigma)


def oracle_ml(frames, lr=0.05, wlr=0.05, init_w=0.05, wuc=5.0, thr=0.2,
              upd_thr=0.2, tex_w=0.5, bg_pct=0.6, off=3.0, mna=10 / 180 * PI,
              sh=0.6, hl=1.2, k=9, sigma=3.0):
    H, W = frames.shape[1:3]
    modes = [[[] for _ in range(W)] for _ in range(H)]  # ordered lists
    bg_num = np.zeros((H, W), int)
    out = []
    min_sine = np.sin(mna)
    for t, f in enumerate(frames):
        fidx = t + 1
        gray = np.empty((H, W), np.float32)
        b, g, r = f[..., 0].astype(np.float64), f[..., 1].astype(np.float64), f[..., 2].astype(np.float64)
        y = (b * 9798 + g * 19235 + r * 3735 + (1 << 14)).astype(np.int64) >> 15
        gray = y.astype(np.float32)
        pat = np.stack(
            [(gray - shift_zero(gray, dx, dy) + off > 0).astype(np.float32) for dx, dy in OFFS]
        )
        dist_map = np.zeros((H, W), np.float32)
        first_frame = len(modes[0][0]) == 0
        for yy in range(H):
            for xx in range(W):
                ms = modes[yy][xx]
                cf = f[yy, xx].astype(np.float64)
                cp = pat[:, yy, xx]

                # RemoveBackgroundLayers (single) + renumber
                def remove(rem_idx_list):
                    removed_layers = [ms[i].layer for i in rem_idx_list if ms[i].layer > 0]
                    for i in sorted(rem_idx_list, reverse=True):
                        del ms[i]
                    for rl in removed_layers:
                        for mo in ms:
                            if mo.layer > rl:
                                mo.layer -= 1
                    if rem_idx_list:
                        ms.sort(key=lambda mo: -mo.w)
                        tot = sum(mo.w for mo in ms)
                        acc = 0.0
                        bgn = 0
                        for i, mo in enumerate(ms):
                            acc += mo.w
                            if acc > bg_pct * tot:
                                bgn = i + 1
                                break
                        bg_num[yy, xx] = bgn
                    layered = sorted([mo for mo in ms if mo.layer > 0], key=lambda mo: mo.layer)
                    for i, mo in enumerate(layered):
                        mo.layer = i + 1

                rem = [i for i, mo in enumerate(ms) if mo.layer > 0 and mo.w < 1e-4]
                remove(rem[:1])

                if not ms:
                    mo = Mode()
                    mo.bp = cp.copy()
                    mo.w = mo.mw = init_w
                    mo.ft = mo.lt = fidx
                    mo.freq = 1
                    mo.bi = cf.copy()
                    mo.mini = cf.copy()
                    mo.maxi = cf.copy()
                    ms.append(mo)
                    bg_num[yy, xx] = 1
                    dist_map[yy, xx] = 0.0
                    continue

                best, best_d = -1, 999.0
                for i, mo in enumerate(ms):
                    tex = np.mean(np.abs(cp - mo.bp) > 0.9)
                    lo = np.minimum(mo.mini, mo.bi * sh - 5.0)
                    hi = np.maximum(mo.maxi, mo.bi * hl + 5.0)
                    if ((cf > hi) | (cf < lo)).any():
                        col = 1.0
                    else:
                        dot = (mo.bi * cf).sum()
                        n1 = (mo.bi ** 2).sum()
                        n2 = (cf ** 2).sum()
                        org = 0.0 if n1 * n2 == 0 else np.sqrt(max(1 - dot * dot / (n1 * n2), 0))
                        nb = np.sqrt(n1)
                        if nb == 0:
                            noised = PI
                        else:
                            sa = max(off, 5.0) / nb
                            noised = mna if sa < min_sine else (PI if sa >= 1 else sa)
                        ang = max(org - noised, 0.0)
                        col = 1.0 - np.exp(-100.0 * ang * ang)
                    d = tex_w * tex + (1 - tex_w) * col
                    if d < best_d:
                        best_d, best = d, i

                updating = best_d < upd_thr
                if best >= bg_num[yy, xx] and ms[best].mw < 0.9:
                    best_d = max(best_d, thr * 2.5)
                dist_map[yy, xx] = best_d

                if not updating:
                    for mo in ms:
                        mo.w *= 1 - wlr / (1 + wuc * mo.mw)
                    mo = Mode()
                    mo.bp = cp.copy()
                    mo.w = mo.mw = init_w
                    mo.ft = mo.lt = fidx
                    mo.freq = 1
                    mo.bi = cf.copy()
                    mo.mini = cf.copy()
                    mo.maxi = cf.copy()
                    if len(ms) < M:
                        ms.append(mo)
                    else:
                        ms[M - 1] = mo
                else:
                    mo = ms[best]
                    mo.ft = max(min(mo.ft, fidx), 0)
                    mo.lt = fidx
                    mo.freq += 1
                    mo.bi = (1 - lr) * mo.bi + lr * cf
                    mo.mini = np.minimum(mo.mini, cf)
                    mo.maxi = np.maximum(mo.maxi, cf)
                    mo.bp = (1 - lr) * mo.bp + lr * cp
                    inc = wlr * (1 + wuc * mo.mw)
                    mo.w = (1 - inc) * mo.w + inc
                    mo.mw = max(mo.w, mo.mw)
                    if mo.layer > 0:
                        if mo.w > mo.mw * 0.2:
                            rem = [
                                i for i, m2 in enumerate(ms)
                                if m2.layer > mo.layer and m2.w < m2.mw * 0.9
                            ]
                            if rem:
                                remove(rem)
                    elif mo.mw > 0.9 and mo.layer == 0:
                        mo.layer = max(m2.layer for m2 in ms) + 1
                        mo.layt = fidx
                    for m2 in ms:
                        if m2 is not mo:
                            m2.w *= 1 - wlr / (1 + wuc * m2.mw)

                if len(ms) > 1:
                    ms.sort(key=lambda m2: -m2.w)
                    tot = sum(m2.w for m2 in ms)
                    acc = 0.0
                    for i, m2 in enumerate(ms):
                        acc += m2.w
                        if acc > bg_pct * tot:
                            bg_num[yy, xx] = i + 1
                            break
        if first_frame:
            out.append(np.zeros((H, W), np.uint8))
        else:
            sm = gauss_blur(dist_map, k, sigma)
            out.append(np.where(sm > thr, 255, 0).astype(np.uint8))
    return np.stack(out)


def test_multilayer_matches_oracle(video_frames):
    crop = video_frames[:20, 60:76, 100:124]  # 16×24
    algo = get_algorithm("MultiLayerBGS")()
    _, masks = run_video(algo, jnp.asarray(crop))
    ours = np.asarray(masks)
    ref = oracle_ml(crop)
    mismatch = (ours != ref).mean()
    assert mismatch < 5e-3, f"multilayer mismatch {mismatch:.2e}"


def test_multilayer_detects_appearing_object():
    rng = np.random.default_rng(0)
    bg = rng.integers(90, 150, (1, 32, 40, 3), np.uint8)
    frames = np.tile(bg, (40, 1, 1, 1))
    frames[30:, 8:24, 10:30] = 240
    algo = get_algorithm("MultiLayerBGS")()
    _, masks = run_video(algo, jnp.asarray(frames))
    m = np.asarray(masks)
    assert (m[31, 12:20, 14:26] == 255).mean() > 0.9
    assert (m[25] == 0).all()


def _steps(algo, st, frames):
    for f in frames:
        st, fg, _ = algo.step(st, jnp.asarray(f))
    return st, np.asarray(fg)


def test_multilayer_detect_mode_rates_and_freeze():
    """MLBGS_DETECT (MultiLayerBGS.cpp:173-186): detect rates 0.01/s and
    init weight 0.001 replace the LEARN values; disableLearning (honored
    only in DETECT, :100-107) freezes the model entirely."""
    bg = np.full((8, 10, 3), 120, np.uint8)
    novel = np.full((8, 10, 3), 240, np.uint8)

    learn = get_algorithm("MultiLayerBGS")()
    st_l = learn.init(8, 10, 3)
    st_l, _ = _steps(learn, st_l, [bg] * 5)

    # DETECT continues from the learned model with slow rates: a novel
    # frame appends a mode at detect_init_mode_weight (0.001), not 0.05
    detect = get_algorithm("MultiLayerBGS")(status="MLBGS_DETECT")
    st_d, _ = _steps(detect, dict(st_l), [novel])
    w = np.asarray(st_d["weight"][:, 0, 0])
    n = int(st_d["n"][0, 0])
    assert n == 2
    assert abs(sorted(w[:n])[0] - 0.001) < 1e-4, w

    # frozen model: disableLearning in DETECT leaves every model leaf alone
    frozen = get_algorithm("MultiLayerBGS")(
        status="MLBGS_DETECT", disableLearning=True
    )
    st_f, fg = _steps(frozen, dict(st_l), [novel])
    for key in ("weight", "bg_int", "bg_pattern", "n", "max_weight"):
        np.testing.assert_array_equal(
            np.asarray(st_f[key]), np.asarray(st_l[key]), err_msg=key
        )
    assert (fg == 255).all()  # still DETECTS the novel object


def test_multilayer_detect_after_switches_rates():
    """detectAfter=N flips LEARN->DETECT at frame N (MultiLayerBGS.cpp:
    201-218): a novel mode appended before the switch gets the LEARN init
    weight, after it the DETECT one."""
    bg = np.full((8, 10, 3), 120, np.uint8)
    novel = np.full((8, 10, 3), 240, np.uint8)
    algo = get_algorithm("MultiLayerBGS")(detectAfter=3)
    st = algo.init(8, 10, 3)
    # frames 1-3 = LEARN phase; novel at frame 2 -> init weight 0.05
    st, _ = _steps(algo, st, [bg, novel])
    w = np.asarray(st["weight"][:, 0, 0])
    assert abs(sorted(w[: int(st["n"][0, 0])])[0] - 0.05) < 5e-3, w
    # frames 4+ = DETECT phase; a second novel value -> init weight 0.001
    novel2 = np.full((8, 10, 3), 30, np.uint8)
    st, _ = _steps(algo, st, [bg, bg, novel2])
    n = int(st["n"][0, 0])
    w = np.asarray(st["weight"][:n, 0, 0])
    assert abs(sorted(w)[0] - 0.001) < 1e-4, w

    # combining detectAfter with disableLearning is rejected (static graph)
    import pytest as _pytest

    bad = get_algorithm("MultiLayerBGS")(detectAfter=3, disableLearning=True)
    with _pytest.raises(ValueError):
        bad.step(bad.init(8, 10, 3), jnp.asarray(bg))
