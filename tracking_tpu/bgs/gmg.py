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
branch-free index arithmetic over a fixed [maxFeatures] axis, vmapped over
pixels; everything fuses into a few VPU passes.
"""

from __future__ import annotations

import dataclasses

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
            "colors": jnp.full((h, w, K), 0xFFFFFFFF, jnp.uint32),
            "weights": jnp.zeros((h, w, K), jnp.float32),
            "nf": jnp.zeros((h, w), jnp.int32),
        }

    def step(self, state: State, frame: jnp.ndarray) -> StepResult:
        cfg = self.config
        K, lr, prior = cfg.maxFeatures, cfg.learningRate, cfg.backgroundPrior
        t = state["t"]
        code = _quantize(frame, cfg.quantizationLevels)
        training = t < cfg.initializationFrames

        def pixel(c, colors, weights, nf):
            idx = jnp.arange(K)
            found = (colors == c) & (idx < nf)
            has = jnp.any(found)
            fi = jnp.argmax(found)

            # ---- inference (typical mode) ----
            w_match = jnp.where(has, weights[fi], 0.0)
            post = (w_match * prior) / (
                w_match * prior + (1.0 - w_match) * (1.0 - prior)
            )
            is_fg = (~training) & ((1.0 - post) > cfg.decisionThreshold)

            # ---- histogram update ----
            insert_w = jnp.where(training, 1.0, lr)
            dec = jnp.where(training, weights, weights * (1.0 - lr))
            # value placed at the front slot
            front_w = jnp.where(has, insert_w + dec[fi], insert_w)
            # position the existing entries shift out of:
            #  found      → entries [0, fi) shift right by one
            #  not found:
            #    nf < K   → nothing shifts (append at index nf... but OpenCV
            #               appends at the END in that case, no move-to-front)
            #    nf == K  → entries [0, K-1) shift right (evict last)
            shift_upto = jnp.where(has, fi, jnp.where(nf >= K, K - 1, 0))
            prev = jnp.maximum(idx - 1, 0)
            shifted_c = jnp.where(
                (idx >= 1) & (idx <= shift_upto), colors[prev], colors
            )
            shifted_w = jnp.where((idx >= 1) & (idx <= shift_upto), dec[prev], dec)
            use_front = has | (nf >= K)
            new_colors = jnp.where(
                use_front & (idx == 0), c, shifted_c
            )
            new_weights = jnp.where(use_front & (idx == 0), front_w, shifted_w)
            # append path (not found, room left): write at index nf
            appended = (~use_front)
            new_colors = jnp.where(appended & (idx == nf), c, new_colors)
            new_weights = jnp.where(appended & (idx == nf), front_w, new_weights)
            nf1 = jnp.where(appended, nf + 1, nf)

            # normalization: on growth (typical mode) or at end of training
            grew = appended & (~training)
            end_train = t == cfg.initializationFrames - 1
            do_norm = grew | end_train
            total = jnp.sum(jnp.where(idx < nf1, new_weights, 0.0))
            new_weights = jnp.where(
                do_norm, new_weights / jnp.maximum(total, 1e-20), new_weights
            )
            return new_colors, new_weights, nf1, is_fg

        colors, weights, nf, is_fg = jax.vmap(jax.vmap(pixel))(
            code, state["colors"], state["weights"], state["nf"]
        )
        fg = jnp.where(is_fg, jnp.uint8(255), jnp.uint8(0))
        if cfg.smoothingRadius > 0:
            fg = binary_median_blur(fg, cfg.smoothingRadius)
        bg = jnp.zeros(frame.shape, jnp.uint8)
        return (
            {"t": t + 1, "colors": colors, "weights": weights, "nf": nf},
            fg,
            bg,
        )
