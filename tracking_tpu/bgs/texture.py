"""DPTextureBGS — ustc type 16 (Heikkilä-Pietikäinen LBP texture histograms).

Reference: ``package_bgs/dp/TextureBGS.{h,cpp}`` + wrapper
``dp/DPTextureBGS.cpp``. Constants (``TextureBGS.h:20-28``): 6-point LBP at
radius 2 with hysteresis +3, 64 bins, 11×11 region (R=5), α=0.05, single
mode, threshold = 0.5·121·3 = 181.5.

Per frame: per-channel LBP code image (bit k set when
``center − neighbor_k + 3 ≥ 0``, offsets (−2,0),(−1,−2),(−1,+2),(+1,−2),
(+1,+2),(+2,0) in (row,col), ``TextureBGS.cpp:23-56``); per-pixel 64-bin
histogram of codes over the 11×11 window per channel
(``TextureBGS.cpp:58-88``); histogram-intersection proximity vs the model,
FG where below threshold (``TextureBGS.cpp:90-134``); model blend
``round(α·cur + (1−α)·model)`` on background pixels (``:136-160``).

Faithful quirk: UpdateModel reads the mask **transposed** —
``fgMask(x,y)`` with row-major ``operator()(r,c)`` (``TextureBGS.cpp:147``)
— so pixel (y,x) updates when mask[x,y]==0. Where the transposed index
leaves the image (x ≥ H or y ≥ W; heap garbage in the reference) we freeze
the model (no update) for determinism.

First frame: model seeded with the frame's own histograms (valid region;
the reference leaves border histograms uninitialized — we use zeros,
``DPTextureBGS.cpp:72-90``). The valid region excludes a REGION_R+TEXTURE_R
= 7-pixel border; the mask is 0 outside.

TPU mapping: the histogram is 64 one-hot planes box-summed with an 11×11
``reduce_window`` per channel; compare/update are elementwise over the
[3, 64, H, W] model — no gathers, no scans.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from tracking_tpu.bgs.base import BGSAlgorithm, State, StepResult
from tracking_tpu.core.config import BGSConfig
from tracking_tpu.core.registry import register

REGION_R = 5
TEXTURE_R = 2
NUM_BINS = 64
HYSTERSIS = 3
ALPHA = 0.05
BORDER = REGION_R + TEXTURE_R  # 7

# (drow, dcol, bit) — TextureBGS.cpp:28-53
_LBP_OFFSETS = [
    (-2, 0, 1), (-1, -2, 2), (-1, 2, 4), (1, -2, 8), (1, 2, 16), (2, 0, 32),
]


def _lbp6(plane: jnp.ndarray) -> jnp.ndarray:
    """[H, W] u8 → [H, W] u8 code; 2-px border stays 0."""
    h, w = plane.shape
    c = plane.astype(jnp.int32)
    code = jnp.zeros((h, w), jnp.int32)
    p = jnp.pad(c, TEXTURE_R, mode="edge")
    for dr, dc, bit in _LBP_OFFSETS:
        nb = p[TEXTURE_R + dr : TEXTURE_R + dr + h, TEXTURE_R + dc : TEXTURE_R + dc + w]
        code = code + jnp.where(c - nb + HYSTERSIS >= 0, bit, 0)
    interior = jnp.zeros((h, w), bool)
    interior = interior.at[TEXTURE_R : h - TEXTURE_R, TEXTURE_R : w - TEXTURE_R].set(True)
    return jnp.where(interior, code, 0).astype(jnp.uint8)


def _region_hist(code: jnp.ndarray) -> jnp.ndarray:
    """[H, W] code → [64, H, W] u8 counts over the 11×11 window.

    The box sum is separable (rows then columns): 22 adds per bin instead of
    121 — the non-separable reduce_window was the dominant cost of the whole
    algorithm at 720p (the window runs over 64 bins × 3 channels).

    TRACKING_TPU_TEXTURE_BOX=shift swaps the two reduce_windows for explicit
    shifted-slice adds (bit-identical integer math; A/B perf knob)."""
    k = 2 * REGION_R + 1
    # u8 end-to-end: window counts max out at k² = 121, and the [64, H, W]
    # intermediates dominate the whole algorithm's HBM traffic (i32 here
    # measured ~4× slower end-to-end)
    onehot = (code[None] == jnp.arange(NUM_BINS, dtype=jnp.uint8)[:, None, None]).astype(
        jnp.uint8
    )
    padded = jnp.pad(onehot, ((0, 0), (REGION_R, REGION_R), (REGION_R, REGION_R)))
    if os.environ.get("TRACKING_TPU_TEXTURE_BOX") == "shift":
        h, w = code.shape
        rows = padded[:, 0:h, :]
        for d in range(1, k):
            rows = rows + padded[:, d : d + h, :]
        cnt = rows[:, :, 0:w]
        for d in range(1, k):
            cnt = cnt + rows[:, :, d : d + w]
        return cnt
    rows = jax.lax.reduce_window(
        padded, jnp.uint8(0), jax.lax.add, (1, k, 1), (1, 1, 1), "VALID"
    )
    cnt = jax.lax.reduce_window(
        rows, jnp.uint8(0), jax.lax.add, (1, 1, k), (1, 1, 1), "VALID"
    )
    return cnt


@dataclasses.dataclass(frozen=True)
class DPTextureConfig(BGSConfig):
    # The reference exposes only enableFiltering (dead code) + showOutput.
    showOutput: bool = True


@register("DPTextureBGS", type_id=16, aliases=("texture-lbp", "dp-texture"))
class DPTextureBGS(BGSAlgorithm):
    Config = DPTextureConfig
    THRESHOLD = 0.5 * (2 * REGION_R + 1) ** 2 * 3  # TextureBGS.h:27

    def init(self, h: int, w: int, c: int = 3) -> State:
        return {
            "t": jnp.zeros((), jnp.int32),
            "model": jnp.zeros((3, NUM_BINS, h, w), jnp.uint8),
        }

    def _histograms(self, f3):
        return jnp.stack(
            [_region_hist(_lbp6(f3[..., ch])) for ch in range(3)], axis=0
        )

    def warm_start(self, state: State, frame: jnp.ndarray) -> State:
        """Seed the model from the first frame's own histograms
        (``DPTextureBGS.cpp:72-90``). Seeding here instead of a ``t == 0``
        select inside step saves a full [3, 64, H, W] model pass per frame;
        behavior is identical because at t=0 model == cur either way."""
        f3 = frame if frame.ndim == 3 else jnp.repeat(frame[..., None], 3, -1)
        h, w = f3.shape[:2]
        valid = np.zeros((h, w), bool)
        valid[BORDER : h - BORDER, BORDER : w - BORDER] = True
        cur = self._histograms(f3)
        return dict(state, model=jnp.where(jnp.asarray(valid)[None, None], cur, 0))

    def step(self, state: State, frame: jnp.ndarray) -> StepResult:
        f3 = frame if frame.ndim == 3 else jnp.repeat(frame[..., None], 3, -1)
        h, w = f3.shape[:2]
        t = state["t"]

        valid = np.zeros((h, w), bool)
        valid[BORDER : h - BORDER, BORDER : w - BORDER] = True
        valid = jnp.asarray(valid)

        model = state["model"]

        # Fused Pallas path on TPU: LBP code → windowed histogram →
        # intersection in VMEM per tile (the XLA one-hot/reduce_window chain
        # pushes ~700 MB of intermediates through HBM per 720p frame).
        # TRACKING_TPU_TEXTURE=xla restores the XLA formulation; =interp
        # forces the interpret-mode kernel (CPU parity tests).
        tex_env = os.environ.get("TRACKING_TPU_TEXTURE", "pallas")
        if (jax.default_backend() == "tpu" and tex_env != "xla") or tex_env == "interp":
            from tracking_tpu.ops.pallas_texture import texture_prox_cur_pallas

            codes = jnp.stack([_lbp6(f3[..., ch]) for ch in range(3)])
            prox, cur = texture_prox_cur_pallas(
                codes, model, interpret=tex_env == "interp"
            )
        else:
            cur = self._histograms(f3)  # [3, 64, H, W] u8
            # u8 min with an i32 accumulator — no widened [3, 64, H, W] copies
            prox = jnp.sum(jnp.minimum(model, cur), axis=(0, 1), dtype=jnp.int32)
        fg = jnp.where((prox < self.THRESHOLD) & valid, jnp.uint8(255), jnp.uint8(0))

        # transposed-mask update (see module docstring): pixel (y,x) updates
        # when mask[x, y] == 0; out-of-bounds transposed reads freeze.
        p = max(h, w)
        padded = jnp.full((p, p), 255, jnp.uint8).at[:h, :w].set(fg)
        upd = (padded.T[:h, :w] == 0) & valid
        blended = jnp.clip(
            jnp.rint(ALPHA * cur.astype(jnp.float32) + (1 - ALPHA) * model.astype(jnp.float32)),
            0,
            255,
        ).astype(jnp.uint8)
        model = jnp.where(upd[None, None], blended, model)

        bg = jnp.zeros(frame.shape, jnp.uint8)
        return {"t": t + 1, "model": model}, fg, bg
