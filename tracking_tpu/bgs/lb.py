"""lb-package BGS family (Laurence Bender's BGModel mini-framework, SURVEY §2.5).

Wrapper pattern (``package_bgs/LBSimpleGaussian.cpp:31-72``): first frame →
``InitModel(frame)`` (model seeded from frame with ctor constants), then every
frame → ``setBGModelParameter`` (XML ints mapped through value/255 curves) +
``UpdateModel``. The first frame is both the init seed and the first update.

All five models are per-pixel recurrences in double precision in the
reference; float32 here (differences are far below mask-decision thresholds).
Channel order note: the reference's ``BYTERGB.Red`` actually aliases the first
byte (B in BGR) — all models are channel-symmetric so layout is irrelevant.

Models:
- LBSimpleGaussian (ustc 25): per-pixel diagonal Gaussian, Mahalanobis test
  (``lb/BGModelGauss.cpp:125-198``).
- LBFuzzyGaussian (26): fuzzy membership modulates the learning rate
  (``lb/BGModelFuzzyGauss.cpp:129-210``).
- LBMixtureOfGaussians (27): K=3 MoG with legacy single-swap partial sort
  (``lb/BGModelMog.cpp:144-306``).
- LBAdaptiveSOM (28): per-pixel 3×3 self-organizing map, Pascal-kernel
  neighborhood updates, calibration phase (``lb/BGModelSom.cpp:185-290``).
- LBFuzzyAdaptiveSOM (29): SOM with fuzzy learning rate
  (``lb/BGModelFuzzySom.cpp:218-320``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tracking_tpu.bgs.base import BGSAlgorithm, State, StepResult
from tracking_tpu.core.config import BGSConfig
from tracking_tpu.core.registry import register


def _to_f32_channels(frame):
    """[H, W] or [H, W, C] u8 → C-tuple of [H, W] f32."""
    if frame.ndim == 2:
        return (frame.astype(jnp.float32),)
    return tuple(frame[..., c].astype(jnp.float32) for c in range(frame.shape[-1]))


def _bg_u8(mu_channels, gray):
    planes = tuple(jnp.clip(m, 0, 255).astype(jnp.uint8) for m in mu_channels)
    if gray:
        return planes[0]
    return jnp.stack(planes, axis=-1)


# ---------------------------------------------------------------------------
# LBSimpleGaussian — ustc type 25
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class LBSimpleGaussianConfig(BGSConfig):
    sensitivity: int = 66
    noiseVariance: int = 162
    learningRate: int = 18
    showOutput: bool = True


@register("LBSimpleGaussian", type_id=25, aliases=("lb-gauss",))
class LBSimpleGaussian(BGSAlgorithm):
    INIT_NOISE = 50.0  # ctor NOISEGAUSS, used for the frame-0 variance seed

    Config = LBSimpleGaussianConfig

    def _params(self):
        cfg = self.config
        thr = 100.0 * (cfg.sensitivity / 255.0) ** 2
        noise = 100.0 * (cfg.noiseVariance / 255.0)
        alpha = (cfg.learningRate / 255.0) ** 3
        return thr, noise, alpha

    def init(self, h: int, w: int, c: int = 3) -> State:
        c = max(c, 1)
        return {
            "t": jnp.zeros((), jnp.int32),
            "mu": tuple(jnp.zeros((h, w), jnp.float32) for _ in range(c)),
            "var": tuple(jnp.full((h, w), self.INIT_NOISE, jnp.float32) for _ in range(c)),
        }

    def step(self, state: State, frame: jnp.ndarray) -> StepResult:
        thr, noise, alpha = self._params()
        src = _to_f32_channels(frame)
        c = len(src)
        t = state["t"]
        mu = tuple(jnp.where(t == 0, src[i], state["mu"][i]) for i in range(c))
        var = tuple(
            jnp.where(t == 0, jnp.full_like(src[i], self.INIT_NOISE), state["var"][i])
            for i in range(c)
        )

        d = tuple(src[i] - mu[i] for i in range(c))
        d2 = sum(d[i] * d[i] / var[i] for i in range(c))
        fg = jnp.where(d2 < thr, jnp.uint8(0), jnp.uint8(255))

        mu2 = tuple(mu[i] + alpha * d[i] for i in range(c))
        var2 = tuple(
            jnp.minimum(
                var[i] + alpha * (jnp.square(src[i] - mu2[i]) - var[i]), noise
            )
            for i in range(c)
        )
        bg = _bg_u8(mu2, frame.ndim == 2)
        return {"t": t + 1, "mu": mu2, "var": var2}, fg, bg


# ---------------------------------------------------------------------------
# LBFuzzyGaussian — ustc type 26
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class LBFuzzyGaussianConfig(BGSConfig):
    sensitivity: int = 72
    bgThreshold: int = 162
    learningRate: int = 49
    noiseVariance: int = 195
    showOutput: bool = True


@register("LBFuzzyGaussian", type_id=26, aliases=("lb-fuzzy-gauss",))
class LBFuzzyGaussian(BGSAlgorithm):
    INIT_NOISE = 50.0  # ctor NOISEFUZZYGAUSS
    FUZZYEXP = -5.0

    Config = LBFuzzyGaussianConfig

    def _params(self):
        cfg = self.config
        thr = 100.0 * (cfg.sensitivity / 255.0) ** 2
        thr_bg = cfg.bgThreshold / 255.0
        alphamax = (cfg.learningRate / 255.0) ** 3
        noise = 100.0 * (cfg.noiseVariance / 255.0)
        return thr, thr_bg, alphamax, noise

    def init(self, h: int, w: int, c: int = 3) -> State:
        c = max(c, 1)
        return {
            "t": jnp.zeros((), jnp.int32),
            "mu": tuple(jnp.zeros((h, w), jnp.float32) for _ in range(c)),
            "var": tuple(jnp.full((h, w), self.INIT_NOISE, jnp.float32) for _ in range(c)),
        }

    def step(self, state: State, frame: jnp.ndarray) -> StepResult:
        thr, thr_bg, alphamax, noise = self._params()
        src = _to_f32_channels(frame)
        c = len(src)
        t = state["t"]
        mu = tuple(jnp.where(t == 0, src[i], state["mu"][i]) for i in range(c))
        var = tuple(
            jnp.where(t == 0, jnp.full_like(src[i], self.INIT_NOISE), state["var"][i])
            for i in range(c)
        )

        d = tuple(src[i] - mu[i] for i in range(c))
        d2 = sum(d[i] * d[i] / var[i] for i in range(c))
        fuzzy_bg = jnp.where(d2 < thr, d2 / thr, 1.0)
        alpha = alphamax * jnp.exp(self.FUZZYEXP * fuzzy_bg)

        mu2 = tuple(mu[i] + alpha * d[i] for i in range(c))
        var2 = tuple(
            jnp.maximum(
                var[i] + alpha * (jnp.square(src[i] - mu2[i]) - var[i]), noise
            )
            for i in range(c)
        )
        fg = jnp.where(fuzzy_bg >= thr_bg, jnp.uint8(255), jnp.uint8(0))
        bg = _bg_u8(mu2, frame.ndim == 2)
        return {"t": t + 1, "mu": mu2, "var": var2}, fg, bg


# ---------------------------------------------------------------------------
# LBMixtureOfGaussians — ustc type 27
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class LBMixtureOfGaussiansConfig(BGSConfig):
    sensitivity: int = 81
    bgThreshold: int = 83
    learningRate: int = 59
    noiseVariance: int = 206
    showOutput: bool = True


@register("LBMixtureOfGaussians", type_id=27, aliases=("lb-mog",))
class LBMixtureOfGaussians(BGSAlgorithm):
    """Legacy MoG quirks kept: first-match scan, single-swap "sort" (the
    matched mode swaps with the first earlier mode it beats on w/σ and the
    loop breaks), and the FG test comparing the matched mode's *pre-swap*
    index against the background-weight prefix (``lb/BGModelMog.cpp:266-294``).
    """

    K = 3
    INIT_NOISE = 50.0
    NEW_WEIGHT = 0.001  # LEARNINGRATEMOG used as the new-mode weight

    Config = LBMixtureOfGaussiansConfig

    def _params(self):
        cfg = self.config
        thr = 100.0 * (cfg.sensitivity / 255.0) ** 2
        T = cfg.bgThreshold / 255.0
        alpha = (cfg.learningRate / 255.0) ** 3
        noise = 100.0 * (cfg.noiseVariance / 255.0)
        return thr, T, alpha, noise

    def init(self, h: int, w: int, c: int = 3) -> State:
        # mode-major [K, H, W] (K-minor layouts tile 3 modes onto 128 lanes
        # at 2% efficiency — see gmm.py module doc)
        c = max(c, 1)
        K = self.K
        return {
            "t": jnp.zeros((), jnp.int32),
            "mu": tuple(jnp.zeros((K, h, w), jnp.float32) for _ in range(c)),
            "var": tuple(
                jnp.full((K, h, w), self.INIT_NOISE, jnp.float32) for _ in range(c)
            ),
            "w": jnp.zeros((K, h, w), jnp.float32),
            "n": jnp.zeros((h, w), jnp.int32),
        }

    def step(self, state: State, frame: jnp.ndarray) -> StepResult:
        thr, T, alpha, noise = self._params()
        K = self.K
        src = _to_f32_channels(frame)
        c = len(src)
        t = state["t"]

        # frame-0 init: mode 0 = frame, w=1 (Init(), BGModelMog.cpp:111-140)
        mu = [
            [
                jnp.where(t == 0, src[i] if k == 0 else 0.0, state["mu"][i][k])
                for k in range(K)
            ]
            for i in range(c)
        ]
        var = [
            [
                jnp.where(t == 0, self.INIT_NOISE, state["var"][i][k])
                for k in range(K)
            ]
            for i in range(c)
        ]
        w = [
            jnp.where(t == 0, 1.0 if k == 0 else 0.0, state["w"][k])
            for k in range(K)
        ]
        n = jnp.where(t == 0, 1, state["n"])

        active = [n > k for k in range(K)]
        d2 = [
            sum(jnp.square(src[i] - mu[i][k]) / var[i][k] for i in range(c))
            for k in range(K)
        ]
        match = [(d2[k] < thr) & active[k] for k in range(K)]
        # first match as a running prefix
        none_before = jnp.ones_like(match[0])
        is_first = []
        for k in range(K):
            is_first.append(match[k] & none_before)
            none_before = none_before & jnp.logical_not(match[k])
        has_match = jnp.logical_not(none_before)

        # new-mode slot when no match (BGModelMog.cpp:231-251)
        n2 = jnp.where(has_match, n, jnp.minimum(n + 1, K))
        first_idx = sum(
            jnp.where(is_first[k], k, 0) for k in range(K)
        )
        k_hit = jnp.where(has_match, first_idx, n2 - 1)
        is_hit = [k_hit == k for k in range(K)]
        active2 = [n2 > k for k in range(K)]

        # matched-path vs new-mode path per slot
        new_w = jnp.where(n2 == 1, 1.0, self.NEW_WEIGHT)
        w2 = []
        for k in range(K):
            w_m = jnp.where(is_hit[k], w[k] + alpha * (1.0 - w[k]), (1.0 - alpha) * w[k])
            w2.append(
                jnp.where(has_match, w_m, jnp.where(is_hit[k], new_w, w[k]))
            )
        mu2, var2 = [], []
        for i in range(c):
            mu_i, var_i = [], []
            for k in range(K):
                d = src[i] - mu[i][k]
                mu_m = jnp.where(is_hit[k], mu[i][k] + alpha * d, mu[i][k])
                var_m = jnp.where(
                    is_hit[k],
                    jnp.maximum(
                        var[i][k] + alpha * (jnp.square(src[i] - mu_m) - var[i][k]),
                        noise,
                    ),
                    var[i][k],
                )
                mu_i.append(
                    jnp.where(has_match, mu_m, jnp.where(is_hit[k], src[i], mu[i][k]))
                )
                var_i.append(
                    jnp.where(has_match, var_m, jnp.where(is_hit[k], noise, var[i][k]))
                )
            mu2.append(mu_i)
            var2.append(var_i)

        # normalize + sort key (BGModelMog.cpp:253-263)
        total = sum(jnp.where(active2[k], w2[k], 0.0) for k in range(K))
        w2 = [
            jnp.where(active2[k], w2[k] / jnp.maximum(total, 1e-12), w2[k])
            for k in range(K)
        ]
        sort_key = [
            w2[k] / jnp.sqrt(sum(var2[i][k] for i in range(c))) for k in range(K)
        ]

        # single-swap partial sort: swap k_hit with the FIRST j < k_hit whose
        # key it beats (BGModelMog.cpp:267-274) — select form, no gathers
        key_hit = sum(jnp.where(is_hit[k], sort_key[k], 0.0) for k in range(K))
        none_beat_before = jnp.ones_like(has_match)
        is_jswap = []
        for k in range(K):
            beats_k = (k_hit > k) & (key_hit > sort_key[k])
            is_jswap.append(beats_k & none_beat_before)
            none_beat_before = none_beat_before & jnp.logical_not(beats_k)
        any_beat = jnp.logical_not(none_beat_before)

        def swap(arrs):
            val_hit = sum(jnp.where(is_hit[k], arrs[k], 0.0) for k in range(K))
            val_js = sum(jnp.where(is_jswap[k], arrs[k], 0.0) for k in range(K))
            out = []
            for k in range(K):
                v = jnp.where(any_beat & is_hit[k], val_js, arrs[k])
                v = jnp.where(any_beat & is_jswap[k], val_hit, v)
                out.append(v)
            return out

        w3 = swap(w2)
        mu3 = [swap(mu2[i]) for i in range(c)]
        var3 = [swap(var2[i]) for i in range(c)]

        # background prefix: first k with cumsum(w) > T (post-swap order);
        # FG iff the *pre-swap* hit index > kBG (:278-294)
        cum = jnp.zeros_like(w3[0])
        k_bg = jnp.full_like(n2, K - 1)
        found = jnp.zeros_like(has_match)
        for k in range(K):
            cum = cum + jnp.where(active2[k], w3[k], 0.0)
            over = (cum > T) & jnp.logical_not(found)
            k_bg = jnp.where(over, k, k_bg)
            found = found | over
        fg = jnp.where(k_hit > k_bg, jnp.uint8(255), jnp.uint8(0))

        bg = _bg_u8(tuple(mu3[i][0] for i in range(c)), frame.ndim == 2)
        new_state = {
            "t": t + 1,
            "mu": tuple(jnp.stack(mu3[i]) for i in range(c)),
            "var": tuple(jnp.stack(var3[i]) for i in range(c)),
            "w": jnp.stack(w3),
            "n": n2,
        }
        return new_state, fg, bg


# ---------------------------------------------------------------------------
# LBAdaptiveSOM (28) and LBFuzzyAdaptiveSOM (29)
# ---------------------------------------------------------------------------

# Pascal 3×3 neighborhood kernel (BGModelSom.cpp:77-99), Wmax = 4.
_SOM_KERNEL = np.array([[1.0, 2.0, 1.0], [2.0, 4.0, 2.0], [1.0, 2.0, 1.0]])
_SOM_M = 3  # grid width/height per pixel


@dataclasses.dataclass(frozen=True)
class LBAdaptiveSOMConfig(BGSConfig):
    sensitivity: int = 75
    trainingSensitivity: int = 245
    learningRate: int = 62
    trainingLearningRate: int = 255
    trainingSteps: int = 55
    showOutput: bool = True


class _SOMBase(BGSAlgorithm):
    fuzzy = False
    FUZZYEXP = -5.0
    FUZZYTHRESH = 0.8

    def _params(self):
        cfg = self.config
        eps2 = 255.0 * 255.0 * (cfg.sensitivity / 255.0) ** 4
        eps1 = 255.0 * 255.0 * (cfg.trainingSensitivity / 255.0) ** 4
        wmax = 4.0
        alpha2 = (cfg.learningRate / 255.0) ** 3 / wmax
        alpha1 = (cfg.trainingLearningRate / 255.0) ** 3 / wmax
        tsteps = cfg.trainingSteps
        return eps1, eps2, alpha1, alpha2, tsteps

    def init(self, h: int, w: int, c: int = 3) -> State:
        c = max(c, 1)
        G = _SOM_M * _SOM_M
        return {
            "t": jnp.zeros((), jnp.int32),
            "som": tuple(jnp.zeros((G, h, w), jnp.float32) for _ in range(c)),
            "bg": tuple(jnp.zeros((h, w), jnp.float32) for _ in range(c)),
        }

    def step(self, state: State, frame: jnp.ndarray) -> StepResult:
        eps1, eps2, alpha1, alpha2, tsteps = self._params()
        src = _to_f32_channels(frame)
        c = len(src)
        t = state["t"]
        G = _SOM_M * _SOM_M

        som = tuple(
            jnp.where(t == 0, jnp.broadcast_to(src[i], (G,) + src[i].shape), state["som"][i])
            for i in range(c)
        )

        # calibration schedule (BGModelSom.cpp:187-199): m_K counts frames
        in_train = t <= tsteps
        eps = jnp.where(in_train, eps1, eps2)
        alpha = jnp.where(
            in_train,
            alpha1 - t.astype(jnp.float32) * (alpha1 - alpha2) / tsteps,
            alpha2,
        )

        d2 = sum(jnp.square(src[i][None] - som[i]) for i in range(c))  # [G, H, W]
        bmu = jnp.argmin(d2, axis=0)  # [H, W]
        d2min = jnp.min(d2, axis=0)

        if self.fuzzy:
            fuzzy_bg = jnp.where(d2min < eps, d2min / eps, 1.0)
            a_eff = alpha * jnp.exp(self.FUZZYEXP * fuzzy_bg)
            do_update = jnp.ones_like(d2min, bool)
            is_fg = fuzzy_bg >= self.FUZZYTHRESH
        else:
            a_eff = jnp.broadcast_to(alpha, d2min.shape)
            do_update = d2min <= eps
            is_fg = ~do_update

        # neighborhood update around the BMU in 3×3 grid coords; out-of-grid
        # updates land in write-only padding in the reference → dropped here.
        by, bx = bmu // _SOM_M, bmu % _SOM_M
        new_som = []
        for i in range(c):
            upd = som[i]
            # static unroll over the 9 grid cells
            planes = []
            for g in range(G):
                cy, cx = g // _SOM_M, g % _SOM_M
                dy = cy - by  # [H, W]
                dx = cx - bx
                in_win = (jnp.abs(dy) <= 1) & (jnp.abs(dx) <= 1) & do_update
                # separable kernel [1,2,1]⊗[1,2,1] as selects — the previous
                # per-pixel table indexing was 27 [H,W] gathers/frame (~25 ms
                # each on TPU); only |d|≤1 matters under in_win
                wgt = jnp.where(dy == 0, 2.0, 1.0) * jnp.where(dx == 0, 2.0, 1.0)
                a = a_eff * wgt
                planes.append(
                    jnp.where(in_win, som[i][g] + a * (src[i] - som[i][g]), som[i][g])
                )
            new_som.append(jnp.stack(planes, axis=0))
        new_som = tuple(new_som)

        # background image: BMU value where updated/BG, else previous.
        # One-hot select over the G=9 grid cells (take_along_axis is a
        # full-map gather on TPU).
        bmu_val = tuple(
            sum(
                jnp.where(bmu == g, new_som[i][g], 0.0) for g in range(G)
            )
            for i in range(c)
        )
        show_bg = ~is_fg
        bg_t = tuple(
            jnp.where(show_bg, bmu_val[i], jnp.where(t == 0, src[i], state["bg"][i]))
            for i in range(c)
        )
        fg = jnp.where(is_fg, jnp.uint8(255), jnp.uint8(0))
        bg = _bg_u8(bg_t, frame.ndim == 2)
        return {"t": t + 1, "som": new_som, "bg": bg_t}, fg, bg


@register("LBAdaptiveSOM", type_id=28, aliases=("lb-som",))
class LBAdaptiveSOM(_SOMBase):
    Config = LBAdaptiveSOMConfig
    fuzzy = False


@dataclasses.dataclass(frozen=True)
class LBFuzzyAdaptiveSOMConfig(BGSConfig):
    sensitivity: int = 90
    trainingSensitivity: int = 240
    learningRate: int = 38
    trainingLearningRate: int = 255
    trainingSteps: int = 81
    showOutput: bool = True


@register("LBFuzzyAdaptiveSOM", type_id=29, aliases=("lb-fuzzy-som",))
class LBFuzzyAdaptiveSOM(_SOMBase):
    Config = LBFuzzyAdaptiveSOMConfig
    fuzzy = True
