"""Type-2 fuzzy GMM family — tb package (SURVEY §2.4).

Four algorithms share the Grimson-GMM skeleton (``tb/T2FGMM.cpp:105-258``,
``tb/T2FMRF.cpp:132-398``) with the Gaussian likelihood replaced by a type-2
fuzzy membership bound H per channel, and ``dist = HR² + HG² + HB²``:

- **UM** (uncertain mean, ``T2FGMM.cpp:157-174``): per channel,
  ``H = 2·km·|d|/var`` outside the ``mu ± km·var`` band else
  ``d²/(2·var²) + km·|d|/var + km²/2`` (``var`` is the *variance*, not σ —
  faithful reference quirk).
- **UV** (uncertain variance, ``T2FGMM.cpp:177-182``):
  ``H = (1/kv² − kv²)·d²/(2·var)``.

Faithful quirks kept:
- the matched mode's mean update is ``mu − k·|d|`` — it always *decreases*
  the mean regardless of which side the pixel lies (``T2FGMM.cpp:207-209``);
- weight prune (``numModes--``) can never fire: ``(1−α)·w ≥ 0`` always
  (``T2FGMM.cpp:216-221``), unlike Zivkovic's subtractive decay;
- the background image is the post-sort mode-0 mean (``T2FGMM.cpp:322-324``).

T2FMRF (``T2FMRF.cpp``) adds a per-pixel two-state HMM whose transition
probabilities adapt toward the observed low-mask labeling
(``T2FMRF.cpp:341-398``); the computed ``ro`` ratio is dead code in the
reference (``T2FMRF.cpp:221-231``, never read).  One reference bug is NOT
replicated: the post-new-mode renormalization at ``T2FMRF.cpp:331`` reads
``m_modes[posPixel + iLocal].weight`` — the *pixel* index instead of the
mode-array base ``posGMode`` — so the significants fed to the second qsort
come from an earlier raster pixel's already-updated mode.  That is a
sequential raster-order artifact with no parallel meaning; we compute the
correct ``posGMode`` indexing (as T2FGMM.cpp:286-287 does).  Proof that
this is the only divergence: with just that index patched in the compiled
reference, masks agree 0.9999998 (UM) / 1.0 (UV) over 150 frames
(tests/test_golden_cpp.py dual gates).  The wrapper's MRF-ICM pass
(``T2FMRF_UM.cpp:86-99``) smooths the *low* mask and then discards the result
(output is the high mask; ``old_labeling`` receives the pre-MRF copy), so by
default we match the observable pipeline and skip it; ``applyMRF=True``
applies :func:`tracking_tpu.ops.mrf.icm_relax` to the emitted mask as a
capability upgrade.

Wrapper defaults: T2FGMM ``threshold=9, alpha=0.01, km=1.5, kv=0.6,
gaussians=3`` (``T2FGMM_UM.cpp:19``); T2FMRF ``km=2, kv=0.9``
(``T2FMRF_UM.cpp:19-20``). High threshold = 2× low (``T2FGMM_UM.cpp:58``).
Output is the high-threshold mask (``T2FGMM_UM.cpp:74-80``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tracking_tpu.bgs.base import BGSAlgorithm, State, StepResult
from tracking_tpu.bgs.gmm import (
    _first_match,
    _sort_desc_maps,
    _stack_state,
    _to_planes,
    _unstack3,
    _unstack4,
)
from tracking_tpu.core.config import BGSConfig
from tracking_tpu.core.registry import register

_EPS = 1e-12

BG_THRESHOLD = 0.75  # T2FGMM.cpp:73
INIT_VAR = 36.0  # T2FGMM.cpp:76


def _membership_dist(planes, mu_k, var_k, um, km, kv):
    """Σ_c H_c² for one mode: type-2 fuzzy membership bound (T2FGMM.cpp:157-182).
    Whole-map ops on [H, W] planes (mode-major layout — see gmm.py module doc
    for why the per-pixel-vmap formulation was ~80× slower)."""
    total = None
    for ci in range(len(planes)):
        if um:
            d = jnp.abs(mu_k[ci] - planes[ci])
            outside = (planes[ci] < mu_k[ci] - km * var_k) | (
                planes[ci] > mu_k[ci] + km * var_k
            )
            far = 2.0 * km * d / var_k
            near = d * d / (2.0 * var_k * var_k) + km * d / var_k + 0.5 * km * km
            h = jnp.where(outside, far, near)
        else:
            d = planes[ci] - mu_k[ci]
            h = (1.0 / (kv * kv) - kv * kv) * d * d / (2.0 * var_k)
        total = h * h if total is None else total + h * h
    return total


@dataclasses.dataclass(frozen=True)
class T2FGMMConfig(BGSConfig):
    threshold: float = 9.0
    alpha: float = 0.01
    km: float = 1.5
    kv: float = 0.6
    gaussians: int = 3
    showOutput: bool = True


class _T2FGMMBase(BGSAlgorithm):
    Config = T2FGMMConfig
    UM: bool = True

    def init(self, h: int, w: int, c: int = 3) -> State:
        K = self.config.gaussians
        c = max(c, 1)
        return {
            "t": jnp.zeros((), jnp.int32),
            "w": jnp.zeros((K, h, w), jnp.float32),
            "var": jnp.zeros((K, h, w), jnp.float32),
            "mu": jnp.zeros((K, c, h, w), jnp.float32),
            "n": jnp.zeros((h, w), jnp.int32),
        }

    def _subtract(self, state, frame):
        """Vectorization of ``T2FGMM::SubtractPixel`` (``T2FGMM.cpp:105-289``)
        in the gmm.py mode-major skeleton: running prefix masks instead of the
        first-match scan, odd-even-network stable sorts instead of qsort."""
        cfg = self.config
        K, alpha = cfg.gaussians, cfg.alpha
        low_thr, high_thr = cfg.threshold, 2.0 * cfg.threshold
        planes = _to_planes(frame)
        C = len(planes)
        w = _unstack3(state["w"], K)
        var = _unstack3(state["var"], K)
        mu = _unstack4(state["mu"], K, C)
        n = state["n"]
        active = [n > k for k in range(K)]

        excl = jnp.zeros_like(w[0])  # exclusive prefix of pre-update weights
        is_bg = []
        for k in range(K):
            is_bg.append((excl < BG_THRESHOLD) & active[k])
            excl = excl + w[k]

        dist = [
            _membership_dist(planes, mu[k], var[k], self.UM, cfg.km, cfg.kv)
            for k in range(K)
        ]
        match = [(dist[k] < low_thr * var[k]) & active[k] for k in range(K)]
        has_match, is_match, considered = _first_match(match)
        # high check only runs for modes visited before the first match
        bg_high = jnp.zeros_like(has_match)
        bg_low = jnp.zeros_like(has_match)
        for k in range(K):
            cons_k = jnp.where(has_match, considered[k], True) & active[k]
            bg_high = bg_high | ((dist[k] < high_thr * var[k]) & is_bg[k] & cons_k)
            bg_low = bg_low | (is_match[k] & is_bg[k])

        w1, var1 = [], []
        for k in range(K):
            kk = alpha / jnp.maximum(w[k], _EPS)
            wk = jnp.where(active[k], (1.0 - alpha) * w[k], w[k])
            w1.append(jnp.where(is_match[k], wk + alpha, wk))
            for ci in range(C):
                # faithful quirk: mean moves by −k·|d| regardless of side
                d_abs = jnp.abs(mu[k][ci] - planes[ci])
                mu[k][ci] = jnp.where(is_match[k], mu[k][ci] - kk * d_abs, mu[k][ci])
            var1.append(
                jnp.where(
                    is_match[k],
                    jnp.clip(var[k] + kk * (dist[k] - var[k]), 4.0, 5.0 * INIT_VAR),
                    var[k],
                )
            )
        total = sum(jnp.where(active[k], w1[k], 0.0) for k in range(K))
        w1 = [
            jnp.where(active[k], w1[k] / jnp.maximum(total, _EPS), w1[k])
            for k in range(K)
        ]
        sig = [
            jnp.where(
                active[k], w1[k] / jnp.sqrt(jnp.maximum(var1[k], _EPS)), -jnp.inf
            )
            for k in range(K)
        ]
        _, (w1, var1, *mus) = _sort_desc_maps(
            sig, [w1, var1] + [[mu[k][ci] for k in range(K)] for ci in range(C)]
        )
        mu = [[mus[ci][k] for ci in range(C)] for k in range(K)]

        # new mode on no-match (T2FGMM.cpp:234-280)
        n1 = jnp.where(has_match, n, jnp.minimum(n + 1, K))
        w2, var2 = [], []
        for k in range(K):
            slot = (n1 == k + 1) & jnp.logical_not(has_match)
            w2.append(jnp.where(slot, jnp.where(n1 == 1, 1.0, alpha), w1[k]))
            var2.append(jnp.where(slot, INIT_VAR, var1[k]))
            for ci in range(C):
                mu[k][ci] = jnp.where(slot, planes[ci], mu[k][ci])
        active2 = [n1 > k for k in range(K)]
        total2 = sum(jnp.where(active2[k], w2[k], 0.0) for k in range(K))
        w2 = [
            jnp.where(active2[k], w2[k] / jnp.maximum(total2, _EPS), w2[k])
            for k in range(K)
        ]
        sig2 = [
            jnp.where(
                active2[k], w2[k] / jnp.sqrt(jnp.maximum(var2[k], _EPS)), -jnp.inf
            )
            for k in range(K)
        ]
        _, (w2, var2, *mus) = _sort_desc_maps(
            sig2, [w2, var2] + [[mu[k][ci] for k in range(K)] for ci in range(C)]
        )
        mu = [[mus[ci][k] for ci in range(C)] for k in range(K)]

        bg_u8 = jnp.stack([mu[0][ci] for ci in range(C)], axis=-1).astype(jnp.uint8)
        if frame.ndim == 2:
            bg_u8 = bg_u8[..., 0]
        ws, vs, ms = _stack_state(w2, var2, mu)
        return ws, vs, ms, n1, bg_low, bg_high, bg_u8

    def step(self, state: State, frame: jnp.ndarray) -> StepResult:
        w, var, mu, n, _bg_low, bg_high, bg_u8 = self._subtract(state, frame)
        fg = jnp.where(bg_high, jnp.uint8(0), jnp.uint8(255))
        new_state = {"t": state["t"] + 1, "w": w, "var": var, "mu": mu, "n": n}
        return new_state, fg, bg_u8


@register("T2FGMM_UM", type_id=17, aliases=("t2fgmm-um",))
class T2FGMM_UM(_T2FGMMBase):
    UM = True


@register("T2FGMM_UV", type_id=18, aliases=("t2fgmm-uv",))
class T2FGMM_UV(_T2FGMMBase):
    UM = False


# ---------------------------------------------------------------------------
# T2FMRF — T2FGMM + per-pixel two-state HMM (+ optional MRF-ICM smoothing)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class T2FMRFConfig(BGSConfig):
    threshold: float = 9.0
    alpha: float = 0.01
    km: float = 2.0
    kv: float = 0.9
    gaussians: int = 3
    showOutput: bool = True
    # Capability upgrade: actually apply the MRF-ICM smoothing the reference
    # computes and throws away (see module docstring). Off = reference parity.
    applyMRF: bool = False


class _T2FMRFBase(_T2FGMMBase):
    Config = T2FMRFConfig

    def init(self, h: int, w: int, c: int = 3) -> State:
        st = super().init(h, w, c)
        # HMM init (T2FMRF.cpp:117-124): state=background, Ab2b=.7 Ab2f=.3
        # Af2b=.4 Af2f=.6. `T` mirrors Ab2b/Af2b and is only read by the MRF.
        st["hmm_fg"] = jnp.zeros((h, w), jnp.bool_)
        st["Ab2b"] = jnp.full((h, w), 0.7, jnp.float32)
        st["Ab2f"] = jnp.full((h, w), 0.3, jnp.float32)
        st["Af2b"] = jnp.full((h, w), 0.4, jnp.float32)
        st["Af2f"] = jnp.full((h, w), 0.6, jnp.float32)
        st["old_labeling"] = jnp.zeros((h, w), jnp.uint8)
        return st

    def step(self, state: State, frame: jnp.ndarray) -> StepResult:
        cfg = self.config
        alpha = cfg.alpha
        w, var, mu, n, bg_low, bg_high, bg_u8 = self._subtract(state, frame)
        low_mask = jnp.where(bg_low, jnp.uint8(0), jnp.uint8(255))
        fg = jnp.where(bg_high, jnp.uint8(0), jnp.uint8(255))

        # HMM transition adaptation (T2FMRF.cpp:341-398): the row of the
        # *current* hidden state moves toward the new label, then renormalizes.
        was_fg = state["hmm_fg"]
        to_fg = ~bg_low
        d_b2b = jnp.where(to_fg, 0.0, alpha)
        d_b2f = jnp.where(to_fg, alpha, 0.0)
        Ab2b = jnp.where(~was_fg, (1 - alpha) * state["Ab2b"] + d_b2b, state["Ab2b"])
        Ab2f = jnp.where(~was_fg, (1 - alpha) * state["Ab2f"] + d_b2f, state["Ab2f"])
        Af2b = jnp.where(was_fg, (1 - alpha) * state["Af2b"] + d_b2b, state["Af2b"])
        Af2f = jnp.where(was_fg, (1 - alpha) * state["Af2f"] + d_b2f, state["Af2f"])
        zb = jnp.maximum(Ab2b + Ab2f, _EPS)
        zf = jnp.maximum(Af2b + Af2f, _EPS)
        Ab2b, Ab2f = Ab2b / zb, Ab2f / zb
        Af2b, Af2f = Af2b / zf, Af2f / zf

        if cfg.applyMRF:
            from tracking_tpu.ops.mrf import icm_relax

            f3 = frame if frame.ndim == 3 else frame[..., None]
            mu0 = jnp.mean(mu[0], axis=0)  # mode 0 mean over channels
            var0 = jnp.maximum(var[0], 1.0)
            smoothed = icm_relax(
                fg, f3.astype(jnp.float32).mean(-1), mu0, var0,
                state["old_labeling"], enabled=state["t"] >= 10,
            )
            fg = smoothed

        new_state = {
            "t": state["t"] + 1, "w": w, "var": var, "mu": mu, "n": n,
            "hmm_fg": to_fg, "Ab2b": Ab2b, "Ab2f": Ab2f,
            "Af2b": Af2b, "Af2f": Af2f, "old_labeling": low_mask,
        }
        return new_state, fg, bg_u8


@register("T2FMRF_UM", type_id=19, aliases=("t2fmrf-um",))
class T2FMRF_UM(_T2FMRFBase):
    UM = True


@register("T2FMRF_UV", type_id=20, aliases=("t2fmrf-uv",))
class T2FMRF_UV(_T2FMRFBase):
    UM = False
