"""Mask-quality metrics: the rebuild's evaluation layer (SURVEY §1 L5).

Covers all three reference evaluators:
- ``package_analysis/ForegroundMaskAnalysis.cpp:57-69`` — IoU-style similarity
  s = |A∧B| / |A∨B|.
- ``package_bgs/tb/PerformanceUtils.cpp:57-457`` — TP/TN/FP/FN, similarity,
  ROC sweep.
- ``fet/fet.py:30-103`` — per-pixel Recall/Precision/F-score over FG vs GT
  directories.

All functions accept u8 0/255 (or bool) masks with arbitrary leading batch
dims and run on-device.
"""

from __future__ import annotations

import jax.numpy as jnp


def _as_bool(m: jnp.ndarray) -> jnp.ndarray:
    return m if m.dtype == jnp.bool_ else m > 0


def mask_similarity(pred: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """IoU: |pred ∧ ref| / |pred ∨ ref| (1.0 when both empty)."""
    a, b = _as_bool(pred), _as_bool(ref)
    inter = jnp.sum(a & b, dtype=jnp.float32)
    union = jnp.sum(a | b, dtype=jnp.float32)
    return jnp.where(union == 0, 1.0, inter / jnp.maximum(union, 1.0))


def confusion_counts(pred: jnp.ndarray, ref: jnp.ndarray):
    """(TP, FP, TN, FN) pixel counts (fet.py definitions: GT=ref positive=255)."""
    p, g = _as_bool(pred), _as_bool(ref)
    tp = jnp.sum(p & g, dtype=jnp.float32)
    fp = jnp.sum(p & ~g, dtype=jnp.float32)
    tn = jnp.sum(~p & ~g, dtype=jnp.float32)
    fn = jnp.sum(~p & g, dtype=jnp.float32)
    return tp, fp, tn, fn


def precision_recall_fscore(pred: jnp.ndarray, ref: jnp.ndarray):
    """(precision, recall, F1) with 0-denominator → 0 (fet.py:93-103)."""
    tp, fp, _, fn = confusion_counts(pred, ref)
    precision = jnp.where(tp + fp == 0, 0.0, tp / jnp.maximum(tp + fp, 1.0))
    recall = jnp.where(tp + fn == 0, 0.0, tp / jnp.maximum(tp + fn, 1.0))
    denom = precision + recall
    f1 = jnp.where(denom == 0, 0.0, 2.0 * precision * recall / jnp.maximum(denom, 1e-12))
    return precision, recall, f1


def image_roc(pred: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Coded confusion image (PerformanceUtils::ImageROC display path,
    tb/PerformanceUtils.cpp:298-341): TP=30, TN=0, FP=255, FN=100 (u8)."""
    p, g = _as_bool(pred), _as_bool(ref)
    return jnp.where(
        p & g, jnp.uint8(30),
        jnp.where(p & ~g, jnp.uint8(255), jnp.where(~p & g, jnp.uint8(100), jnp.uint8(0))),
    )


def roc_threshold_search(score_img, ref):
    """Per-intensity TP/TN/FP/FN table of PerformanceUtils::ImageROC's
    saveResults branch (tb/PerformanceUtils.cpp:345-457), vectorized.

    The reference walks pixels in raster order keeping four *global* running
    counters and stores the running value into ``freq[intensity][class]`` at
    every pixel — so ``freq[i][c]`` ends up being the cumulative class-c
    count at the last raster position of a class-c pixel with intensity
    ``i`` (an ordering quirk, reproduced here exactly: cumsum per class +
    last-occurrence selection instead of the reference's O(H·W·256) scan).

    Returns an [256, 7] float array with columns TP, TN, FP, FN, FNR, FPR,
    DR (freq layout, PerformanceUtils.cpp:404-433); rows whose denominators
    are zero keep zero rates exactly like the reference leaves them unset.
    """
    import numpy as np

    img = np.asarray(score_img, dtype=np.uint8).reshape(-1)
    g = np.asarray(ref).reshape(-1) != 0
    p = img != 0
    cls = np.where(p & g, 0, np.where(~p & ~g, 1, np.where(p & ~g, 2, 3)))
    freq = np.zeros((256, 7), np.float64)
    for c in range(4):
        pos = np.nonzero(cls == c)[0]
        if pos.size == 0:
            continue
        cum = np.arange(1, pos.size + 1, dtype=np.float64)
        inten_rev = img[pos][::-1]
        u, first_rev = np.unique(inten_rev, return_index=True)
        freq[u, c] = cum[::-1][first_rev]
    tp, tn, fp, fn = freq[:, 0], freq[:, 1], freq[:, 2], freq[:, 3]
    ok = ((fn + tp) != 0) & ((fp + tn) != 0)
    with np.errstate(invalid="ignore", divide="ignore"):
        freq[ok, 4] = fn[ok] / (fn[ok] + tp[ok])  # FNR
        freq[ok, 5] = fp[ok] / (fp[ok] + tn[ok])  # FPR
        freq[ok, 6] = tp[ok] / (tp[ok] + fn[ok])  # DR
    return freq


def save_roc_file(score_img, ref, filename: str) -> None:
    """Write the reference's ROC threshold-search table
    (tb/PerformanceUtils.cpp:407-447): header + one ``%3d %6.0f ×4 %1.6f ×3``
    line per intensity with nonzero denominators, columns I TP TN FP FN FPR
    FNR DR."""
    freq = roc_threshold_search(score_img, ref)
    with open(filename, "w") as f:
        f.write("  I     TP     TN     FP     FN    FPR      FNR      DR   \n\n")
        for i in range(256):
            tp, tn, fp, fn = freq[i, :4]
            if (fn + tp != 0.0) and (fp + tn != 0.0):
                f.write(
                    "%3d %6.0f %6.0f %6.0f %6.0f %1.6f %1.6f %1.6f\n"
                    % (i, tp, tn, fp, fn, freq[i, 5], freq[i, 4], freq[i, 6])
                )


def roc_curve(score_img: jnp.ndarray, ref: jnp.ndarray, num_thresholds: int = 256):
    """TPR/FPR sweep over u8 thresholds (PerformanceUtils::ImageROC analog).

    score_img: u8 [H, W] confidence image; ref: binary GT mask.
    Returns (thresholds [N], tpr [N], fpr [N]) — fully vectorized: one
    broadcast compare over a threshold axis instead of the reference's loop.
    """
    g = _as_bool(ref)
    thresholds = jnp.linspace(0, 255, num_thresholds)
    pred = score_img[None] > thresholds[:, None, None]  # [N, H, W]
    tp = jnp.sum(pred & g[None], axis=(1, 2), dtype=jnp.float32)
    fp = jnp.sum(pred & ~g[None], axis=(1, 2), dtype=jnp.float32)
    pos = jnp.sum(g, dtype=jnp.float32)
    neg = jnp.sum(~g, dtype=jnp.float32)
    tpr = tp / jnp.maximum(pos, 1.0)
    fpr = fp / jnp.maximum(neg, 1.0)
    return thresholds, tpr, fpr
