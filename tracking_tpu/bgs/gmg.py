"""GMG — ustc type 8 (Godbehere–Matsukawa–Goldberg 2012).

The reference wraps OpenCV 2.4's ``cv::BackgroundSubtractorGMG``
(``package_bgs/GMG.cpp:17-76``; sets ``initializationFrames=20``,
``decisionThreshold=0.7``; also the only place the reference touches
threading, ``cv::setNumThreads(8)``).  Re-implemented here from the paper /
OpenCV-2.4 ``bgfg_gmg.cpp`` semantics (no cv2.bgsegm in this environment):

- each pixel keeps a move-to-front list of ≤ maxFeatures quantized colors
  with weights (quantization: per channel ``⌊v·levels/256⌋``, channels packed
  into one code — any bijective packing is equivalent, only equality is used);
- first ``initializationFrames`` frames: insert with weight 1 (counting),
  normalize once at the end of training, mask stays empty;
- afterwards: ``posterior = w·p / (w·p + (1−w)(1−p))`` with background prior
  p=0.8, FG iff ``1−posterior > decisionThreshold``; then decay all weights by
  (1−lr), insert the feature with weight lr (normalize only when the list
  grew); full list + unseen feature evicts the least-recently-seen entry;
- 0/255 mask is median-smoothed with ``smoothingRadius`` (7).

The reference's ``getBackgroundImage`` is unimplemented in OpenCV 2.4 (the
wrapper's bg output stays empty, ``GMG.cpp:57-58``); we emit zeros.

TPU mapping: the per-pixel list ops (find / move-to-front / evict) are
branch-free whole-map selects over a FEATURE-MAJOR [maxFeatures, H, W]
bank, with the slot axis kept as a tensor axis: first-match via an
exclusive cumulative count, matched-slot stats via one-hot masked sums,
and the move-to-front shift as a select between the bank and its
slot-rolled copy. (The earlier per-pixel-vmap formulation put K minor —
poor lane tiling — and its list indexing became per-pixel gathers;
52 ms/frame at 720p, ~20× slower. A K-unrolled select-chain variant
emitted ~640 separate [H, W] map ops that XLA fused poorly — 154 fps;
the tensor-axis form is ~20 [K, H, W] ops. See PERF.md. The one
semantic wrinkle: normalization sums the weights with a tree reduction
instead of the unrolled form's sequential adds, so weights can differ
by reassociation ulps — decisions threshold far from the knife edge.)
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp

from tracking_tpu.bgs.base import BGSAlgorithm, State, StepResult
from tracking_tpu.core.config import BGSConfig
from tracking_tpu.core.registry import register
from tracking_tpu.ops.filters import binary_median_blur


@dataclasses.dataclass(frozen=True)
class GMGConfig(BGSConfig):
    initializationFrames: int = 20
    decisionThreshold: float = 0.7
    showOutput: bool = True
    # OpenCV 2.4 defaults (not exposed by the reference's XML):
    maxFeatures: int = 64
    learningRate: float = 0.025
    quantizationLevels: int = 16
    backgroundPrior: float = 0.8
    smoothingRadius: int = 7


def _quantize(frame: jnp.ndarray, levels: int) -> jnp.ndarray:
    """[H, W, C] u8 → [H, W] packed quantized color code (u32)."""
    f = frame if frame.ndim == 3 else frame[..., None]
    q = (f.astype(jnp.uint32) * levels) // 256
    code = jnp.zeros(f.shape[:2], jnp.uint32)
    for c in range(f.shape[-1]):
        code = code * levels + q[..., c]
    return code


@register("GMG", type_id=8, aliases=("gmg",))
class GMG(BGSAlgorithm):
    Config = GMGConfig

    def init(self, h: int, w: int, c: int = 3) -> State:
        K = self.config.maxFeatures
        return {
            "t": jnp.zeros((), jnp.int32),
            # colors are u32 codes; empty slots hold the sentinel 0xFFFFFFFF
            "colors": jnp.full((K, h, w), 0xFFFFFFFF, jnp.uint32),
            "weights": jnp.zeros((K, h, w), jnp.float32),
            "nf": jnp.zeros((h, w), jnp.int32),
        }

    def step(self, state: State, frame: jnp.ndarray) -> StepResult:
        cfg = self.config
        K, lr, prior = cfg.maxFeatures, cfg.learningRate, cfg.backgroundPrior
        t = state["t"]
        code = _quantize(frame, cfg.quantizationLevels)

        # Fused Pallas path on TPU: the whole list update in one VMEM pass
        # (the XLA formulation's ~20 [K, H, W] passes push ~5 GB of state
        # through HBM per 720p frame). TRACKING_TPU_GMG=xla restores the XLA
        # formulation; =interp forces the interpret-mode kernel (CPU parity
        # tests). Weight sums may differ by reassociation ulps on
        # normalization frames (same tolerance as the tree reductions
        # documented above); everything else matches XLA bit-for-bit.
        gmg_env = os.environ.get("TRACKING_TPU_GMG", "pallas")
        if (jax.default_backend() == "tpu" and gmg_env != "xla") or gmg_env == "interp":
            from tracking_tpu.ops.pallas_gmg import gmg_step_pallas

            fg_raw, nf1, new_colors, new_weights = gmg_step_pallas(
                code, state["nf"], state["colors"], state["weights"], t,
                lr=lr, prior=prior, thr=cfg.decisionThreshold,
                init_frames=cfg.initializationFrames,
                interpret=gmg_env == "interp",
            )
            fg = fg_raw.astype(jnp.uint8)
            if cfg.smoothingRadius > 0:
                fg = binary_median_blur(fg, cfg.smoothingRadius)
            bg = jnp.zeros(frame.shape, jnp.uint8)
            return (
                {"t": t + 1, "colors": new_colors, "weights": new_weights,
                 "nf": nf1},
                fg,
                bg,
            )

        training = t < cfg.initializationFrames

        colors = state["colors"]  # [K, H, W] u32
        weights = state["weights"]  # [K, H, W] f32
        nf = state["nf"]
        kidx = jnp.arange(K, dtype=jnp.int32)[:, None, None]

        # find: codes are unique within a pixel's list, so `found` is one-hot
        found = (colors == code[None]) & (nf[None] > kidx)
        prior_finds = jnp.cumsum(found.astype(jnp.int32), axis=0) - found
        upto_first = prior_finds == 0  # k <= first-find-index
        has = jnp.any(found, axis=0)

        # ---- inference (typical mode) ----
        w_match = jnp.sum(jnp.where(found, weights, 0.0), axis=0)
        post = (w_match * prior) / (
            w_match * prior + (1.0 - w_match) * (1.0 - prior)
        )
        is_fg = jnp.logical_not(training) & ((1.0 - post) > cfg.decisionThreshold)

        # ---- histogram update ----
        insert_w = jnp.where(training, 1.0, lr)
        dec = jnp.where(training, weights, weights * (1.0 - lr))
        front_w = insert_w + jnp.sum(jnp.where(found, dec, 0.0), axis=0)
        full = nf >= K
        use_front = has | full
        appended = jnp.logical_not(use_front)
        # shift condition for slot k ≥ 1 (slot k takes slot k−1):
        #  found  → slots [1, fi] take the previous slot (move-to-front)
        #  full   → slots [1, K-1] shift (evict last)
        # slot 0 takes (code, front_w) wherever the list is touched in front.
        row0 = kidx == 0
        prev_c = jnp.concatenate([colors[:1], colors[:-1]])
        prev_w = jnp.concatenate([dec[:1], dec[:-1]])
        shift = jnp.where(
            row0,
            use_front[None],
            (has[None] & upto_first) | (jnp.logical_not(has) & full)[None],
        )
        src_c = jnp.where(row0, code[None], prev_c)
        src_w = jnp.where(row0, front_w[None], prev_w)
        new_colors = jnp.where(shift, src_c, colors)
        new_weights = jnp.where(shift, src_w, dec)
        # append path (not found, room left): write at index nf
        at_append = appended[None] & (nf[None] == kidx)
        new_colors = jnp.where(at_append, code[None], new_colors)
        new_weights = jnp.where(at_append, front_w, new_weights)
        nf1 = jnp.where(appended, nf + 1, nf)

        # normalization: on growth (typical mode) or at end of training
        grew = appended & jnp.logical_not(training)
        end_train = t == cfg.initializationFrames - 1
        do_norm = grew | end_train
        total = jnp.sum(jnp.where(nf1[None] > kidx, new_weights, 0.0), axis=0)
        new_weights = jnp.where(
            do_norm[None], new_weights / jnp.maximum(total, 1e-20)[None], new_weights
        )

        fg = jnp.where(is_fg, jnp.uint8(255), jnp.uint8(0))
        if cfg.smoothingRadius > 0:
            fg = binary_median_blur(fg, cfg.smoothingRadius)
        bg = jnp.zeros(frame.shape, jnp.uint8)
        return (
            {
                "t": t + 1,
                "colors": new_colors,
                "weights": new_weights,
                "nf": nf1,
            },
            fg,
            bg,
        )
