"""LbpMrf residue isolation: an f64 NumPy twin of the DLBP histogram
learning dynamics (VERDICT r4 #3).

The LbpMrf golden gate is the weakest deterministic one in the suite
(agreement 0.9736 / settled IoU 0.803 vs the compiled ck reference,
tests/test_golden_cpp.py). Round 4 removed the solver as a suspect (exact
BK-parity min-cut); the remaining attribution is accumulated f32-vs-float
drift in the histogram learning (``ck/MotionDetection.cpp:222-500`` /
``UpdateHUPixelData :806-950`` — intersection thresholds at the 0.75/0.95
knife edges feed replacement/background-set decisions that compound
frame-over-frame). This tool turns that attribution into an experiment:

- a THIRD implementation of the dynamics (sequentially independent NumPy,
  selectable dtype) runs the same clip;
- the integer-deterministic front end (Luv, gray, LBP codes) and back end
  (integer min-cut, hole fill, erode) are shared with the repo
  implementation — they are precision-free, so the twin isolates the
  learning dynamics;
- three-way agreement (oracle C float / repo XLA f32 / twin f64) is
  printed and written to LBPMRF_TWIN.json.

Interpretation: the dynamics are chaotic in the small — a single f32 ULP
on an intersection at the 0.75 knife edge flips a histogram replacement
whose effect never heals. So if the residue is precision drift, the twin
(a third rounding order) must sit at the SAME distance from both the
oracle and the repo as they sit from each other; all three pairwise
agreements clustering together proves no pairwise-systematic (semantic)
gap. A semantic bug in the repo dynamics would instead show up as
twin≈repo ≫ twin-vs-oracle (twin replicates the repo's equations) — and
twin(f32) run with XLA-matching rounding would pin it further.

Usage: python tools/lbpmrf_twin.py [N_frames] [dtype]
"""

import json
import os
import sys
import time

import cv2
import numpy as np

sys.path.insert(0, ".")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 130
DTYPE = np.dtype(sys.argv[2] if len(sys.argv) > 2 else "float64")
VIDEO = "/root/reference/dataset/video.avi"
ORACLE = os.path.join(os.path.dirname(__file__), "..", "tests", "oracle", "lbpmrf_oracle")

from tracking_tpu.bgs import lbp_mrf as L  # noqa: E402

AREA, BINS, NH = L.AREA, L.BINS, L.NH
SAMPLE_PX = L.SAMPLE_PX


def codes_of(frame):
    """Shared integer front end (repo's own jax fns — precision-free)."""
    import jax.numpy as jnp

    f3 = jnp.asarray(frame)
    luv = L._rgb2luv_u8(f3)
    gray = jnp.clip(
        jnp.rint(
            0.299 * luv[..., 0].astype(jnp.float32)
            + 0.587 * luv[..., 1].astype(jnp.float32)
            + 0.114 * luv[..., 2].astype(jnp.float32)
        ),
        0,
        255,
    )
    codes = L._lbp_special(gray.astype(jnp.uint8)) >> L.SHIFT
    blue = np.asarray(
        __import__("jax").image.resize(
            luv[..., 1].astype(jnp.float32), (24, 32), "bilinear"
        )
    )
    return np.asarray(codes), blue


def window_hist(codes, gh, gw):
    onehot = (codes[None] == np.arange(BINS)[:, None, None]).astype(DTYPE)
    acc = np.zeros((BINS, gh, gw), DTYPE)
    for dy in range(AREA):
        for dx in range(AREA):
            if L._MASK[dy, dx]:
                acc += onehot[:, dy : dy + gh, dx : dx + gw]
    return acc


def update_models(st, hist_now, fresh, full_fresh=None):
    """Mirror of bgs/lbp_mrf.py:_update_models (same quirks: highest-index
    intersection ties, 0→NH-1→1 min-weight visit order, single bubble pass
    + tail-cumulative background selection, short-memcpy partial fresh)."""
    h, w, bgf = st["hist"], st["weights"], st["bg_flag"]
    life = st["life"] + 1
    inter = np.sum(np.minimum(hist_now[None], h), axis=1) / SAMPLE_PX
    bg_rate = np.max(np.where(bgf, inter, -1.0), axis=0)
    bg_rate = np.maximum(bg_rate, 0.0)
    best = (NH - 1) - np.argmax(inter[::-1], axis=0)
    best_oh = np.arange(NH)[:, None, None] == best[None]
    replace = np.all(inter < L.PR_THRES, axis=0)

    min_i = np.zeros_like(best)
    min_w = w[0].copy()
    for i in range(NH - 1, 0, -1):
        better = w[i] < min_w
        min_i = np.where(better, i, min_i)
        min_w = np.minimum(min_w, w[i])
    min_oh = np.arange(NH)[:, None, None] == min_i[None]
    w_rep = np.where(min_oh, DTYPE.type(0.01), w)
    w_rep = w_rep / np.sum(w_rep, axis=0, keepdims=True)
    h_rep = np.where(min_oh[:, None], hist_now[None], h)
    bgf_rep = np.where(min_oh, False, bgf)

    lr = L.LRATE + np.where(life < 100, (100 - life).astype(DTYPE) / 100.0, 0.0)
    h_upd = np.where(
        best_oh[:, None], (1.0 - lr)[None, None] * h + lr[None, None] * hist_now[None], h
    )
    w_upd = lr[None] * best_oh.astype(DTYPE) + (1.0 - lr)[None] * w
    pos_w = [w_upd[i] for i in range(NH)]
    pos_i = [np.full_like(best, i) for i in range(NH)]
    for i in range(NH - 1, 0, -1):
        swap = pos_w[i] <= pos_w[i - 1]
        pos_w[i], pos_w[i - 1] = (
            np.where(swap, pos_w[i - 1], pos_w[i]),
            np.where(swap, pos_w[i], pos_w[i - 1]),
        )
        pos_i[i], pos_i[i - 1] = (
            np.where(swap, pos_i[i - 1], pos_i[i]),
            np.where(swap, pos_i[i], pos_i[i - 1]),
        )
    added = []
    cum = np.zeros_like(w_upd[0])
    for k in range(NH - 1, -1, -1):
        added.append((k, cum <= L.BG_THRES))
        cum = cum + pos_w[k]
    bgf_upd = []
    for i in range(NH):
        flag = np.zeros_like(bgf[0])
        for k, a in added:
            flag = np.where(pos_i[k] == i, a, flag)
        bgf_upd.append(flag)
    bgf_upd = np.stack(bgf_upd)

    hist2 = np.where(replace[None, None], h_rep, h_upd)
    w2 = np.where(replace[None], w_rep, w_upd)
    bgf2 = np.where(replace[None], bgf_rep, bgf_upd)

    if full_fresh is not None:
        h_fresh = np.broadcast_to(full_fresh[None], h.shape)
    else:
        h_fresh = np.concatenate(
            [np.broadcast_to(hist_now[None, :2], (NH, 2) + h.shape[2:]), h[:, 2:]],
            axis=1,
        )
    hist2 = np.where(fresh[None, None], h_fresh, hist2)
    w2 = np.where(fresh[None], DTYPE.type(1.0 / NH), w2)
    bgf2 = np.where(fresh[None], True, bgf2)
    life = np.where(fresh, 0, life)
    bg_rate = np.where(fresh, 1.0, bg_rate)
    return dict(
        st,
        hist=hist2.astype(DTYPE),
        weights=w2.astype(DTYPE),
        bg_flag=bgf2,
        life=life,
        inited=np.ones_like(st["inited"]),
    ), bg_rate


def mrf_mask(bg_rate, gh, gw):
    """Shared integer back end (repo's exact min-cut on CPU)."""
    import jax.numpy as jnp

    from tracking_tpu.ops.mincut import grid_mincut_sink_mask

    t_cap = np.trunc(np.float32(L.MINCUT_W) * (1.0 - bg_rate)).astype(np.int32)
    has = np.zeros(bg_rate.shape, bool)
    has[1:, 1:] = True
    return np.asarray(
        grid_mincut_sink_mask(jnp.asarray(1 - t_cap), jnp.asarray(has), jnp.asarray(has))
    )


def twin_run(frames):
    import jax.numpy as jnp

    from tracking_tpu.ops.morphology import erode, fill_holes

    h, w = frames[0].shape[:2]
    gh, gw = h - AREA + 1, w - AREA + 1
    gwm = gw // 2
    st = {
        "hist": np.zeros((NH, BINS, gh, gwm), DTYPE),
        "weights": np.full((NH, gh, gwm), 1.0 / NH, DTYPE),
        "bg_flag": np.ones((NH, gh, gwm), bool),
        "life": np.zeros((gh, gwm), np.int64),
        "inited": np.zeros((gh, gwm), bool),
    }
    prev_blue = np.zeros((24, 32), np.float32)
    masks = []
    for t, frame in enumerate(frames):
        codes, blue = codes_of(frame)
        diff_pct = 100.0 * np.mean(np.abs(blue - prev_blue) > 12)
        reset_all = bool((diff_pct > 80.0) and (t > 0))
        prev_blue = blue

        hist_all = window_hist(codes, gh, gw)

        extra_rows = (np.arange(gh) % 2) == (gw % 2)
        extra_mask = np.zeros((gh, gwm), bool)
        extra_mask[:, gwm - 1] = True
        extra_mask &= extra_rows[:, None]
        hist_extra = np.broadcast_to(hist_all[:, :, gw - 1 : gw], (BINS, gh, gwm))
        fresh0 = np.full((gh, gwm), reset_all) | ~st["inited"]
        st2, _ = update_models(st, hist_extra, fresh0, full_fresh=hist_extra)
        st = {
            k: (
                np.where(
                    extra_mask.reshape((1,) * (st2[k].ndim - 2) + extra_mask.shape),
                    st2[k],
                    st[k],
                )
                if st2[k].shape[-2:] == (gh, gwm)
                else st[k]
            )
            for k in st2
        }

        hist_now = hist_all[:, :, 0 : 2 * gwm : 2]
        st, bg_rate = update_models(st, hist_now, fresh0)

        fg_model = mrf_mask(bg_rate, gh, gwm)

        xs, ys = np.arange(gw), np.arange(gh)
        direct = (ys[:, None] % 2) == ((xs[None, :] + 1) % 2)
        xm = np.minimum(xs // 2, gwm - 1)
        fg_cols = fg_model[:, xm]
        left_ok, right_ok = xs > 1, xs < (w - AREA - 1)
        xl = np.maximum(xs // 2 - 1, 0)
        xr = np.minimum(xs // 2 + 1, gwm - 1)
        votes = (
            (fg_model[:, xl] & left_ok[None]).astype(np.int32)
            + (fg_model[:, xr] & right_ok[None]).astype(np.int32)
            + np.pad(fg_model, ((1, 0), (0, 0)))[:gh][:, xm].astype(np.int32)
            + np.pad(fg_model, ((0, 1), (0, 0)))[1:][:, xm].astype(np.int32)
        )
        grid_fg = np.where(direct, fg_cols, votes > 1)

        mask = np.zeros((h, w), np.uint8)
        ph = min(gh, h - 3)
        mask[3 : 3 + ph, 2 : 2 + gw] = np.where(grid_fg[:ph], 255, 0)
        if t == 0:
            mask[:] = 0
        mask = np.asarray(erode(fill_holes(jnp.asarray(mask), seed="corner"), 3))
        masks.append(mask)
        if t % 20 == 0:
            print(f"  twin frame {t}", flush=True)
    return np.stack(masks)


def agree(a, b, lo=0, hi=None):
    return float((a[lo:hi] == b[lo:hi]).mean())


def settled_iou(a, b):
    pred, gt = a[60:] > 0, b[60:] > 0
    inter = (pred & gt).sum((1, 2), dtype=np.float64)
    union = (pred | gt).sum((1, 2), dtype=np.float64)
    live = union > 0
    return float((inter[live] / union[live]).mean())


def main():
    import subprocess
    import tempfile

    import jax.numpy as jnp

    from tracking_tpu.core.registry import get_algorithm
    from tracking_tpu.io.video import read_video
    from tracking_tpu.runner import run_video

    frames = read_video(VIDEO, max_frames=N)

    with tempfile.TemporaryDirectory() as tmp:
        subprocess.run([ORACLE, VIDEO, tmp, str(N)], check=True, capture_output=True)
        oracle = np.stack(
            [cv2.imread(os.path.join(tmp, f"mask_{i:04d}.png"), 0) for i in range(N)]
        )

    print("repo (XLA f32)...", flush=True)
    _, repo = run_video(get_algorithm("LbpMrf")(), jnp.asarray(frames))
    repo = np.asarray(repo)

    print(f"twin ({DTYPE.name})...", flush=True)
    t0 = time.time()
    twin = twin_run(frames)
    print(f"  {time.time() - t0:.0f}s")

    out = {
        "n_frames": N,
        "twin_dtype": DTYPE.name,
        "agreement": {
            "repo_vs_oracle": agree(repo, oracle),
            "twin_vs_oracle": agree(twin, oracle),
            "twin_vs_repo": agree(twin, repo),
        },
        "agreement_settled_60_on": {
            "repo_vs_oracle": agree(repo, oracle, 60),
            "twin_vs_oracle": agree(twin, oracle, 60),
            "twin_vs_repo": agree(twin, repo, 60),
        },
        "settled_iou": {
            "repo_vs_oracle": settled_iou(repo, oracle),
            "twin_vs_oracle": settled_iou(twin, oracle),
            "twin_vs_repo": settled_iou(twin, repo),
        },
    }
    print(json.dumps(out, indent=1))
    with open("LBPMRF_TWIN.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
