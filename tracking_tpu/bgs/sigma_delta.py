"""SigmaDeltaBGS — ustc type 35 (Manzanera & Richefeu sigma-delta estimation).

Reference: ``package_bgs/bl/sdLaMa091.cpp`` (C-style). Per byte (each channel
independently): M ← M ± 1 toward I; O = |M − I|; V ← V ± 1 toward N·O clamped
[Vmin, Vmax]; a channel fires where O ≥ V, and the C3R segmentation pass
**ORs the three channel decisions into one per-pixel byte** (the
``isForeground`` accumulator flushed at ``numColor == BLUE``,
``sdLaMa091.cpp:596-630``). The wrapper keeps every 3rd output byte — all
three bytes of a pixel carry that same OR (``bl/SigmaDeltaBGS.cpp:43-51``);
the first frame only initializes M = I and emits nothing
(``SigmaDeltaBGS.cpp:30-36``).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from tracking_tpu.bgs.base import BGSAlgorithm, State, StepResult
from tracking_tpu.core.config import BGSConfig
from tracking_tpu.core.registry import register


@dataclasses.dataclass(frozen=True)
class SigmaDeltaConfig(BGSConfig):
    ampFactor: int = 1
    minVar: int = 15
    maxVar: int = 255
    showOutput: bool = True


@register("SigmaDeltaBGS", type_id=35, aliases=("sigma-delta",))
class SigmaDelta(BGSAlgorithm):
    Config = SigmaDeltaConfig

    def init(self, h: int, w: int, c: int = 3) -> State:
        shape = (h, w, c) if c > 1 else (h, w)
        return {
            "t": jnp.zeros((), jnp.int32),
            "M": jnp.zeros(shape, jnp.uint8),
            "V": jnp.full(shape, jnp.uint8(self.config.minVar)),
        }

    def step(self, state: State, frame: jnp.ndarray) -> StepResult:
        cfg = self.config
        t = state["t"]
        M = self._first_frame_select(t, state["M"], frame)
        V = state["V"]

        fi = frame.astype(jnp.int16)
        Mi = M.astype(jnp.int16)
        # Order matters and matches the reference's four passes:
        # 1) M steps toward I *first*, 2) O uses the stepped M.
        M2 = Mi + jnp.sign(fi - Mi)
        O = jnp.abs(M2 - fi)
        ampO = cfg.ampFactor * O.astype(jnp.int32)
        V2 = V.astype(jnp.int32) + jnp.sign(ampO - V.astype(jnp.int32))
        # The reference steps V in u8 (wraps 255+1 → 0, possible when
        # ampFactor > 1) and clamps afterwards (sdLaMa091.cpp:426-433).
        V2 = jnp.clip(V2 & 0xFF, cfg.minVar, cfg.maxVar)
        seg = jnp.where(O.astype(jnp.int32) < V2, jnp.uint8(0), jnp.uint8(255))

        # Per-pixel OR over the channel decisions; no mask on frame 0.
        fg = jnp.max(seg, axis=-1) if frame.ndim == 3 else seg
        fg = jnp.where(t == 0, jnp.zeros_like(fg), fg)

        new_M = M2.astype(jnp.uint8)
        new_V = V2.astype(jnp.uint8)
        # Frame 0 only initializes M (V untouched, per AllocInit).
        new_M = jnp.where(t == 0, M, new_M)
        new_V = jnp.where(t == 0, V, new_V)
        return {"t": t + 1, "M": new_M, "V": new_V}, fg, M
