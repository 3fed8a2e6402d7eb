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
reference (``T2FMRF.cpp:221-231``, never read).  The wrapper's MRF-ICM pass
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
from tracking_tpu.core.config import BGSConfig
from tracking_tpu.core.registry import register

_EPS = 1e-12

BG_THRESHOLD = 0.75  # T2FGMM.cpp:73
INIT_VAR = 36.0  # T2FGMM.cpp:76


def _h_um(px: jnp.ndarray, mu: jnp.ndarray, var: jnp.ndarray, km: float):
    """Uncertain-mean membership bound, per channel ([K, C] inputs)."""
    d = jnp.abs(mu - px[None, :])
    outside = (px[None, :] < mu - km * var[:, None]) | (
        px[None, :] > mu + km * var[:, None]
    )
    v = var[:, None]
    far = 2.0 * km * d / v
    near = d * d / (2.0 * v * v) + km * d / v + 0.5 * km * km
    return jnp.where(outside, far, near)


def _h_uv(px: jnp.ndarray, mu: jnp.ndarray, var: jnp.ndarray, kv: float):
    """Uncertain-variance membership bound, per channel."""
    d = px[None, :] - mu
    return (1.0 / (kv * kv) - kv * kv) * d * d / (2.0 * var[:, None])


def _t2f_pixel(px, w, var, mu, n, *, K, alpha, low_thr, high_thr, um, km, kv):
    """One pixel's T2FGMM update. Returns (w, var, mu, n, bg_low, bg_high, bgpx).

    Vectorization of ``T2FGMM::SubtractPixel`` (``T2FGMM.cpp:105-289``): the
    first-match scan becomes match-mask + argmax; the two qsorts collapse into
    stable descending sorts (decay is order-preserving and the new mode is
    appended last, exactly like the C++).
    """
    idx = jnp.arange(K)
    active = idx < n
    excl = jnp.cumsum(w) - w  # exclusive prefix of pre-update weights
    is_bg = (excl < BG_THRESHOLD) & active

    H = _h_um(px, mu, var, km) if um else _h_uv(px, mu, var, kv)
    dist = jnp.sum(H * H, axis=1)

    match = (dist < low_thr * var) & active
    has_match, first = jnp.any(match), jnp.argmax(match)
    is_match = match & (idx == first)
    # high check only runs for modes visited before the first match
    considered = jnp.where(has_match, idx <= first, True) & active
    bg_high = jnp.any((dist < high_thr * var) & is_bg & considered)
    bg_low = has_match & is_bg[first]

    d_abs = jnp.abs(mu - px[None, :])
    k = alpha / jnp.maximum(w, _EPS)
    w1 = jnp.where(active, (1.0 - alpha) * w, w)
    w1 = jnp.where(is_match, w1 + alpha, w1)
    mu1 = jnp.where(is_match[:, None], mu - k[:, None] * d_abs, mu)
    var1 = jnp.where(
        is_match, jnp.clip(var + k * (dist - var), 4.0, 5.0 * INIT_VAR), var
    )
    total = jnp.sum(jnp.where(active, w1, 0.0))
    w1 = jnp.where(active, w1 / jnp.maximum(total, _EPS), w1)
    sig = jnp.where(active, w1 / jnp.sqrt(jnp.maximum(var1, _EPS)), -jnp.inf)
    order = jnp.argsort(-sig, stable=True)
    w1, var1, mu1 = w1[order], var1[order], mu1[order]

    # new mode on no-match (T2FGMM.cpp:234-280)
    n1 = jnp.where(has_match, n, jnp.minimum(n + 1, K))
    slot = (idx == n1 - 1) & ~has_match
    w2 = jnp.where(slot, jnp.where(n1 == 1, 1.0, alpha), w1)
    mu2 = jnp.where(slot[:, None], px[None, :], mu1)
    var2 = jnp.where(slot, INIT_VAR, var1)
    active2 = idx < n1
    total2 = jnp.sum(jnp.where(active2, w2, 0.0))
    w2 = jnp.where(active2, w2 / jnp.maximum(total2, _EPS), w2)
    sig2 = jnp.where(active2, w2 / jnp.sqrt(jnp.maximum(var2, _EPS)), -jnp.inf)
    order2 = jnp.argsort(-sig2, stable=True)
    w2, var2, mu2 = w2[order2], var2[order2], mu2[order2]

    return w2, var2, mu2, n1, bg_low, bg_high, mu2[0]


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
            "w": jnp.zeros((h, w, K), jnp.float32),
            "var": jnp.zeros((h, w, K), jnp.float32),
            "mu": jnp.zeros((h, w, K, c), jnp.float32),
            "n": jnp.zeros((h, w), jnp.int32),
        }

    def _subtract(self, state, frame):
        cfg = self.config
        f = (frame if frame.ndim == 3 else frame[..., None]).astype(jnp.float32)

        def pixel(px, w, var, mu, n):
            return _t2f_pixel(
                px, w, var, mu, n,
                K=cfg.gaussians, alpha=cfg.alpha,
                low_thr=cfg.threshold, high_thr=2.0 * cfg.threshold,
                um=self.UM, km=cfg.km, kv=cfg.kv,
            )

        w, var, mu, n, bg_low, bg_high, bg = jax.vmap(jax.vmap(pixel))(
            f, state["w"], state["var"], state["mu"], state["n"]
        )
        bg_u8 = bg.astype(jnp.uint8)
        if frame.ndim == 2:
            bg_u8 = bg_u8[..., 0]
        return w, var, mu, n, bg_low, bg_high, bg_u8

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
            mu0 = jnp.mean(mu[:, :, 0, :], axis=-1)
            var0 = jnp.maximum(var[:, :, 0], 1.0)
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
