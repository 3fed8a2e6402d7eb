"""Per-pixel Gaussian-mixture BGS family (SURVEY §2.2/§2.3 GMM rows).

Four models share one TPU-native skeleton: per-pixel mode banks stored as
``[H, W, K]`` / ``[H, W, K, C]`` tensors, with each per-pixel update written as
a scalar function over the K-mode axis and ``vmap``-ed over pixels — XLA fuses
the whole thing into a few VPU passes; K ≤ 5 "sorts" lower to tiny sorting
networks.

Sequential-to-parallel reformulations (all argued equivalent to the C++):
- The reference's first-match scan becomes a vectorized match mask +
  ``argmax`` (first True).
- Grimson's ``qsort`` by significance and Zivkovic/MOG2's bubble-up both
  become stable descending sorts: decay scales all unmatched weights by the
  same affine map (order-preserving), only the matched mode's weight rises,
  and pruned modes are always a suffix — so a full stable sort reproduces the
  incremental reorderings exactly.
- "numModes--" on prune drops a suffix because weights are kept descending.

References:
- GrimsonGMM: ``dp/GrimsonGMM.cpp:115-330``, wrapper defaults
  ``dp/DPGrimsonGMMBGS.cpp:19,57-61`` (ustc type 10).
- ZivkovicAGMM: ``dp/ZivkovicAGMM.cpp:99-407`` (ustc type 11).
- MixtureOfGaussianV2BGS: the reference wraps ``cv::BackgroundSubtractorMOG2``
  (``MixtureOfGaussianV2BGS.cpp:40-62``, ustc type 5); this re-implements
  Zivkovic's algorithm with OpenCV's exact constants/ordering, incl. shadow
  detection (shadow=127, which the wrapper's threshold-at-15 turns into FG).
- MixtureOfGaussianV1BGS: wraps legacy ``cv::BackgroundSubtractorMOG``
  (KaewTraKulPong–Bowden) (``MixtureOfGaussianV1BGS.cpp:47-56``, ustc type 4);
  re-implemented from the published algorithm (no cv2.bgsegm oracle in this
  environment — validated behaviorally).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from tracking_tpu.bgs.base import BGSAlgorithm, State, StepResult
from tracking_tpu.core.config import BGSConfig
from tracking_tpu.core.registry import register
from tracking_tpu.ops.threshold import threshold_binary

_EPS = 1e-12


def _vmap_pixels(fn, *args):
    """vmap a per-pixel function over [H, W, ...] leading dims."""
    return jax.vmap(jax.vmap(fn))(*args)


def _first_true(mask: jnp.ndarray):
    """(any, index-of-first-True) along the last axis of a 1-D bool vector."""
    return jnp.any(mask), jnp.argmax(mask)


def _sort_desc(key: jnp.ndarray, *arrays):
    """Stable descending sort of parallel arrays along axis 0 by `key` [K]."""
    order = jnp.argsort(-key, stable=True)
    return tuple(a[order] for a in arrays)


# ---------------------------------------------------------------------------
# DPGrimsonGMMBGS — ustc type 10
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class GrimsonGMMConfig(BGSConfig):
    threshold: float = 9.0  # low threshold (squared stds); high = 2×
    alpha: float = 0.01
    gaussians: int = 3
    showOutput: bool = True


@register("DPGrimsonGMMBGS", type_id=10, aliases=("grimson-gmm",))
class DPGrimsonGMM(BGSAlgorithm):
    """Stauffer–Grimson GMM, ordered by significance w/σ; emits the
    high-threshold mask (2×threshold) like every dp wrapper."""

    Config = GrimsonGMMConfig
    BG_THRESHOLD = 0.75  # GrimsonGMM.cpp:76
    INIT_VAR = 36.0  # GrimsonGMM.cpp:79

    def init(self, h: int, w: int, c: int = 3) -> State:
        K = self.config.gaussians
        c = max(c, 1)
        return {
            "t": jnp.zeros((), jnp.int32),
            "w": jnp.zeros((h, w, K), jnp.float32),
            "var": jnp.zeros((h, w, K), jnp.float32),
            "mu": jnp.zeros((h, w, K, c), jnp.float32),
            "n": jnp.zeros((h, w), jnp.int32),
        }

    def step(self, state: State, frame: jnp.ndarray) -> StepResult:
        cfg = self.config
        K = cfg.gaussians
        alpha, low_thr, high_thr = cfg.alpha, cfg.threshold, 2.0 * cfg.threshold
        bg_thr, init_var = self.BG_THRESHOLD, self.INIT_VAR
        f = (frame if frame.ndim == 3 else frame[..., None]).astype(jnp.float32)

        def pixel(px, w, var, mu, n):
            idx = jnp.arange(K)
            active = idx < n
            # background gaussians: exclusive prefix weight < bg_thr
            excl = jnp.cumsum(w) - w
            is_bg = (excl < bg_thr) & active
            d = mu - px[None, :]
            dist = jnp.sum(d * d, axis=1)
            match = (dist < low_thr * var) & active
            has_match, first = _first_true(match)
            is_match = match & (idx == first)
            # high check runs only until (and including) the matching mode
            considered = jnp.where(has_match, idx <= first, True) & active
            bg_high = jnp.any((dist < high_thr * var) & is_bg & considered)
            bg_low = has_match & is_bg[first]

            k = alpha / jnp.maximum(w, _EPS)
            w1 = jnp.where(active, (1.0 - alpha) * w, w)
            w1 = jnp.where(is_match, w1 + alpha, w1)
            mu1 = jnp.where(is_match[:, None], mu - k[:, None] * d, mu)
            var1 = jnp.where(
                is_match, jnp.clip(var + k * (dist - var), 4.0, 5.0 * init_var), var
            )
            total = jnp.sum(jnp.where(active, w1, 0.0))
            w1 = jnp.where(active, w1 / jnp.maximum(total, _EPS), w1)
            sig = jnp.where(active, w1 / jnp.sqrt(jnp.maximum(var1, _EPS)), -jnp.inf)
            w1, var1, mu1 = _sort_desc(sig, w1, var1, mu1)

            # new mode when no match (GrimsonGMM.cpp:234-274)
            n1 = jnp.where(has_match, n, jnp.minimum(n + 1, K))
            slot = (idx == n1 - 1) & ~has_match
            w2 = jnp.where(slot, jnp.where(n1 == 1, 1.0, alpha), w1)
            mu2 = jnp.where(slot[:, None], px[None, :], mu1)
            var2 = jnp.where(slot, init_var, var1)
            active2 = idx < n1
            total2 = jnp.sum(jnp.where(active2, w2, 0.0))
            w2 = jnp.where(active2, w2 / jnp.maximum(total2, _EPS), w2)
            sig2 = jnp.where(active2, w2 / jnp.sqrt(jnp.maximum(var2, _EPS)), -jnp.inf)
            w2, var2, mu2 = _sort_desc(sig2, w2, var2, mu2)

            fg = jnp.where(bg_high, jnp.uint8(0), jnp.uint8(255))
            return w2, var2, mu2, n1, fg, mu2[0]

        w, var, mu, n, fg, bg = _vmap_pixels(
            pixel, f, state["w"], state["var"], state["mu"], state["n"]
        )
        bg_u8 = bg.astype(jnp.uint8)
        if frame.ndim == 2:
            bg_u8 = bg_u8[..., 0]
        new_state = {"t": state["t"] + 1, "w": w, "var": var, "mu": mu, "n": n}
        return new_state, fg, bg_u8


# ---------------------------------------------------------------------------
# DPZivkovicAGMMBGS — ustc type 11
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ZivkovicAGMMConfig(BGSConfig):
    threshold: float = 25.0  # DPZivkovicAGMMBGS.cpp defaults
    alpha: float = 0.001
    gaussians: int = 3
    showOutput: bool = True


@register("DPZivkovicAGMMBGS", type_id=11, aliases=("zivkovic-agmm",))
class DPZivkovicAGMM(BGSAlgorithm):
    """Zivkovic adaptive GMM: weight-ordered modes, complexity prior prunes
    weak modes (weight < α·0.05 → deleted). Emits the high mask (2×thr)."""

    Config = ZivkovicAGMMConfig
    BG_THRESHOLD = 0.75  # ZivkovicAGMM.cpp:64
    INIT_VAR = 36.0
    CT = 0.05  # complexity prior, ZivkovicAGMM.cpp:66

    def init(self, h: int, w: int, c: int = 3) -> State:
        K = self.config.gaussians
        c = max(c, 1)
        return {
            "t": jnp.zeros((), jnp.int32),
            "w": jnp.zeros((h, w, K), jnp.float32),
            "var": jnp.zeros((h, w, K), jnp.float32),
            "mu": jnp.zeros((h, w, K, c), jnp.float32),
            "n": jnp.zeros((h, w), jnp.int32),
        }

    def step(self, state: State, frame: jnp.ndarray) -> StepResult:
        cfg = self.config
        K = cfg.gaussians
        alpha, low_thr, high_thr = cfg.alpha, cfg.threshold, 2.0 * cfg.threshold
        prune = -alpha * self.CT
        bg_thr, init_var = self.BG_THRESHOLD, self.INIT_VAR
        f = (frame if frame.ndim == 3 else frame[..., None]).astype(jnp.float32)

        def pixel(px, w, var, mu, n):
            idx = jnp.arange(K)
            active = idx < n
            excl = jnp.cumsum(w) - w
            is_bg = (excl < bg_thr) & active
            d = mu - px[None, :]
            dist = jnp.sum(d * d, axis=1)
            match = (dist < low_thr * var) & active
            has_match, first = _first_true(match)
            is_match = match & (idx == first)
            considered = jnp.where(has_match, idx <= first, True) & active
            bg_high = jnp.any((dist < high_thr * var) & is_bg & considered)
            bg_low = has_match & is_bg[first]

            k = alpha / jnp.maximum(w, _EPS)
            w1 = jnp.where(active, (1.0 - alpha) * w + prune, w)
            w1 = jnp.where(is_match, w1 + alpha, w1)
            mu1 = jnp.where(is_match[:, None], mu - k[:, None] * d, mu)
            var1 = jnp.where(
                is_match, jnp.clip(var + k * (dist - var), 4.0, 5.0 * init_var), var
            )
            # prune (only unmatched modes check it, ZivkovicAGMM.cpp:229-255);
            # pruned modes are a suffix because weights are kept descending.
            pruned = active & ~is_match & (w1 < -prune)
            w1 = jnp.where(pruned, 0.0, w1)
            n1 = n - jnp.sum(pruned.astype(jnp.int32))
            total = jnp.sum(jnp.where(active, w1, 0.0))
            w1 = jnp.where(active, w1 / jnp.maximum(total, _EPS), w1)
            # stable desc sort by weight == reference's bubble-up (see module doc)
            key = jnp.where(idx < n1, w1, -1.0)
            w1, var1, mu1 = _sort_desc(key, w1, var1, mu1)

            # new mode if no match (ZivkovicAGMM.cpp:266-349)
            n2 = jnp.where(has_match, n1, jnp.minimum(n1 + 1, K))
            slot = (idx == n2 - 1) & ~has_match
            w2 = jnp.where(slot, jnp.where(n2 == 1, 1.0, alpha), w1)
            active2 = idx < n2
            total2 = jnp.sum(jnp.where(active2, w2, 0.0))
            w2 = jnp.where(
                active2 & ~has_match, w2 / jnp.maximum(total2, _EPS), w2
            )
            mu2 = jnp.where(slot[:, None], px[None, :], mu1)
            var2 = jnp.where(slot, init_var, var1)
            key2 = jnp.where(active2, w2, -1.0)
            w2, var2, mu2 = _sort_desc(key2, w2, var2, mu2)

            fg = jnp.where(bg_high, jnp.uint8(0), jnp.uint8(255))
            return w2, var2, mu2, n2, fg, mu2[0]

        w, var, mu, n, fg, bg = _vmap_pixels(
            pixel, f, state["w"], state["var"], state["mu"], state["n"]
        )
        bg_u8 = bg.astype(jnp.uint8)
        if frame.ndim == 2:
            bg_u8 = bg_u8[..., 0]
        new_state = {"t": state["t"] + 1, "w": w, "var": var, "mu": mu, "n": n}
        return new_state, fg, bg_u8


# ---------------------------------------------------------------------------
# MixtureOfGaussianV2BGS — ustc type 5 (cv::BackgroundSubtractorMOG2 semantics)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class MOG2Config(BGSConfig):
    alpha: float = 0.05  # learning rate passed per-frame by the wrapper
    enableThreshold: bool = True
    threshold: int = 15
    showOutput: bool = True
    # OpenCV MOG2 defaults (not exposed by the reference wrapper):
    history: int = 500
    nmixtures: int = 5
    varThreshold: float = 16.0  # Tb
    backgroundRatio: float = 0.9  # TB
    varThresholdGen: float = 9.0  # Tg
    varInit: float = 15.0
    varMin: float = 4.0
    varMax: float = 75.0
    fCT: float = 0.05
    detectShadows: bool = True
    shadowValue: int = 127
    shadowThreshold: float = 0.5  # tau


@register("MixtureOfGaussianV2BGS", type_id=5, aliases=("mog2",))
class MixtureOfGaussianV2(BGSAlgorithm):
    """OpenCV-MOG2-semantics GMM + the wrapper's binary threshold.

    Faithful details: first-frame learning rate is 1/min(2, history) = 0.5
    (OpenCV's nframes schedule with lr≥0 given); shadows are labeled 127 and
    the wrapper's threshold-at-15 then promotes them to foreground 255.
    """

    Config = MOG2Config

    def init(self, h: int, w: int, c: int = 3) -> State:
        K = self.config.nmixtures
        c = max(c, 1)
        return {
            "t": jnp.zeros((), jnp.int32),
            "w": jnp.zeros((h, w, K), jnp.float32),
            "var": jnp.zeros((h, w, K), jnp.float32),
            "mu": jnp.zeros((h, w, K, c), jnp.float32),
            "n": jnp.zeros((h, w), jnp.int32),
        }

    def step(self, state: State, frame: jnp.ndarray) -> StepResult:
        cfg = self.config
        K = cfg.nmixtures
        Tb, TB, Tg = cfg.varThreshold, cfg.backgroundRatio, cfg.varThresholdGen
        tau = cfg.shadowThreshold
        f = (frame if frame.ndim == 3 else frame[..., None]).astype(jnp.float32)
        t = state["t"]
        # OpenCV lr schedule: lr given & nframes>1 ? lr : 1/min(2*nframes, history)
        alphaT = jnp.where(t == 0, 1.0 / min(2, cfg.history), cfg.alpha)

        def pixel(px, w, var, mu, n, alphaT):
            idx = jnp.arange(K)
            active = idx < n
            alpha1 = 1.0 - alphaT
            prune = -alphaT * cfg.fCT

            d = mu - px[None, :]
            dist = jnp.sum(d * d, axis=1)
            match = (dist < Tg * var) & active
            has_match, first = _first_true(match)
            is_match = match & (idx == first)
            considered = jnp.where(has_match, idx <= first, True) & active

            w1 = jnp.where(active, alpha1 * w + prune, w)
            w1 = jnp.where(is_match, w1 + alphaT, w1)
            # background test: running (exclusive) post-update weight < TB
            excl = jnp.cumsum(w1) - w1
            background = jnp.any((excl < TB) & (dist < Tb * var) & considered)

            k = alphaT / jnp.maximum(w1, _EPS)  # k = alphaT/updated weight
            mu1 = jnp.where(is_match[:, None], mu - k[:, None] * d, mu)
            var1 = jnp.where(
                is_match,
                jnp.clip(var + k * (dist - var), cfg.varMin, cfg.varMax),
                var,
            )
            pruned = active & ~is_match & (w1 < -prune)
            w1 = jnp.where(pruned, 0.0, w1)
            n1 = n - jnp.sum(pruned.astype(jnp.int32))
            total = jnp.sum(jnp.where(active, w1, 0.0))
            w1 = jnp.where(active, w1 / jnp.maximum(total, _EPS), w1)
            key = jnp.where(idx < n1, w1, -1.0)
            w1, var1, mu1 = _sort_desc(key, w1, var1, mu1)

            # new mode: replace weakest when full; others scaled by (1-alphaT)
            n2 = jnp.where(has_match, n1, jnp.minimum(n1 + 1, K))
            slot = (idx == n2 - 1) & ~has_match
            scale_others = (~has_match) & (n2 > 1)
            w2 = jnp.where(scale_others & ~slot, w1 * alpha1, w1)
            w2 = jnp.where(slot, jnp.where(n2 == 1, 1.0, alphaT), w2)
            mu2 = jnp.where(slot[:, None], px[None, :], mu1)
            var2 = jnp.where(slot, cfg.varInit, var1)
            active2 = idx < n2
            key2 = jnp.where(active2, w2, -1.0)
            w2, var2, mu2 = _sort_desc(key2, w2, var2, mu2)

            # shadow detection (OpenCV detectShadowGMM), on non-background px
            if cfg.detectShadows:
                excl2 = jnp.cumsum(w2) - w2
                in_scope = (excl2 <= TB) & active2
                numer = jnp.sum(px[None, :] * mu2, axis=1)
                denom = jnp.sum(mu2 * mu2, axis=1)
                a = numer / jnp.maximum(denom, _EPS)
                da = a[:, None] * mu2 - px[None, :]
                dist2a = jnp.sum(da * da, axis=1)
                shadow_mode = (
                    in_scope
                    & (denom > 0)
                    & (numer <= denom)
                    & (numer >= tau * denom)
                    & (dist2a < Tb * var2 * a * a)
                )
                is_shadow = jnp.any(shadow_mode) & ~background
            else:
                is_shadow = jnp.zeros((), bool)

            raw = jnp.where(
                background,
                jnp.uint8(0),
                jnp.where(is_shadow, jnp.uint8(cfg.shadowValue), jnp.uint8(255)),
            )
            return w2, var2, mu2, n2, raw, mu2[0]

        w, var, mu, n, raw, bg = _vmap_pixels(
            pixel,
            f,
            state["w"],
            state["var"],
            state["mu"],
            state["n"],
            jnp.broadcast_to(alphaT, f.shape[:2]),
        )
        fg = threshold_binary(raw, cfg.threshold) if cfg.enableThreshold else raw
        bg_u8 = jnp.clip(bg, 0, 255).astype(jnp.uint8)
        if frame.ndim == 2:
            bg_u8 = bg_u8[..., 0]
        new_state = {"t": t + 1, "w": w, "var": var, "mu": mu, "n": n}
        return new_state, fg, bg_u8


# ---------------------------------------------------------------------------
# MixtureOfGaussianV1BGS — ustc type 4 (legacy cv::BackgroundSubtractorMOG)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class MOG1Config(BGSConfig):
    alpha: float = 0.05
    enableThreshold: bool = True
    threshold: int = 15
    showOutput: bool = True
    # legacy MOG defaults:
    nmixtures: int = 5
    backgroundRatio: float = 0.7
    noiseSigma: float = 30.0
    varThreshold: float = 6.25  # 2.5²


@register("MixtureOfGaussianV1BGS", type_id=4, aliases=("mog1", "mog"))
class MixtureOfGaussianV1(BGSAlgorithm):
    """KaewTraKulPong–Bowden adaptive mixture (legacy cv::BackgroundSubtractorMOG
    semantics): modes ordered by w/σ, per-pixel match within 2.5σ, matched mode
    updated with ρ = α/w; background = matched mode within the backgroundRatio
    prefix. No cv2.bgsegm oracle exists in this environment; validated
    behaviorally (tests/test_bgs_gmm.py)."""

    Config = MOG1Config

    def init(self, h: int, w: int, c: int = 3) -> State:
        K = self.config.nmixtures
        c = max(c, 1)
        return {
            "t": jnp.zeros((), jnp.int32),
            "w": jnp.zeros((h, w, K), jnp.float32),
            "var": jnp.zeros((h, w, K), jnp.float32),
            "mu": jnp.zeros((h, w, K, c), jnp.float32),
            "n": jnp.zeros((h, w), jnp.int32),
        }

    def step(self, state: State, frame: jnp.ndarray) -> StepResult:
        cfg = self.config
        K = cfg.nmixtures
        alpha, T, vT = cfg.alpha, cfg.backgroundRatio, cfg.varThreshold
        init_var = cfg.noiseSigma * cfg.noiseSigma
        f = (frame if frame.ndim == 3 else frame[..., None]).astype(jnp.float32)

        def pixel(px, w, var, mu, n):
            idx = jnp.arange(K)
            active = idx < n
            d = mu - px[None, :]
            dist = jnp.sum(d * d, axis=1)
            match = (dist < vT * var) & active
            has_match, first = _first_true(match)
            is_match = match & (idx == first)

            # background prefix by cumulative weight ≤ T (inclusive of the
            # mode that crosses T, per the paper's B = argmin_b Σw > T)
            excl = jnp.cumsum(w) - w
            is_bg = (excl < T) & active
            background = has_match & is_bg[first]

            rho = alpha / jnp.maximum(w, _EPS)
            w1 = jnp.where(active, (1.0 - alpha) * w, w)
            w1 = jnp.where(is_match, w1 + alpha, w1)
            mu1 = jnp.where(is_match[:, None], mu - rho[:, None] * d, mu)
            var1 = jnp.where(
                is_match,
                jnp.clip(var + rho * (dist - var), 4.0, 5.0 * init_var),
                var,
            )
            total = jnp.sum(jnp.where(active, w1, 0.0))
            w1 = jnp.where(active, w1 / jnp.maximum(total, _EPS), w1)
            sig = jnp.where(active, w1 / jnp.sqrt(jnp.maximum(var1, _EPS)), -jnp.inf)
            w1, var1, mu1 = _sort_desc(sig, w1, var1, mu1)

            n2 = jnp.where(has_match, n, jnp.minimum(n + 1, K))
            slot = (idx == n2 - 1) & ~has_match
            w2 = jnp.where(slot, jnp.where(n2 == 1, 1.0, alpha), w1)
            mu2 = jnp.where(slot[:, None], px[None, :], mu1)
            var2 = jnp.where(slot, init_var, var1)
            active2 = idx < n2
            total2 = jnp.sum(jnp.where(active2, w2, 0.0))
            w2 = jnp.where(active2, w2 / jnp.maximum(total2, _EPS), w2)
            sig2 = jnp.where(active2, w2 / jnp.sqrt(jnp.maximum(var2, _EPS)), -jnp.inf)
            w2, var2, mu2 = _sort_desc(sig2, w2, var2, mu2)

            fg = jnp.where(background, jnp.uint8(0), jnp.uint8(255))
            return w2, var2, mu2, n2, fg, mu2[0]

        w, var, mu, n, raw, bg = _vmap_pixels(
            pixel, f, state["w"], state["var"], state["mu"], state["n"]
        )
        fg = threshold_binary(raw, cfg.threshold) if cfg.enableThreshold else raw
        bg_u8 = jnp.clip(bg, 0, 255).astype(jnp.uint8)
        if frame.ndim == 2:
            bg_u8 = bg_u8[..., 0]
        new_state = {"t": state["t"] + 1, "w": w, "var": var, "mu": mu, "n": n}
        return new_state, fg, bg_u8
