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
