"""Functional BGS algorithm contract.

The reference's uniform contract is ``IBGS::process(img_input, img_foreground,
img_background)`` with all model state hidden in mutable members
(``package_bgs/IBGS.h:21-33``). The TPU-native contract makes that state an
explicit pytree so the whole model becomes a scannable pure function:

    state0           = algo.init(h, w, c)
    state1, fg, bg   = algo.step(state0, frame)     # one frame, [H, W, C] u8

- ``step`` is pure and jit/vmap/scan-safe: ``lax.scan`` over ``[T, H, W, C]``
  videos gives the streaming loop; ``vmap`` over a leading stream axis gives
  multi-stream batching (the reference is strictly single-stream).
- ``fg`` is a u8 [H, W] mask (0/255); ``bg`` is the u8 background model image.
- Warm-up frames where the reference returns without writing a mask
  (e.g. ``FrameDifferenceBGS.cpp:39-43``) produce all-zero masks; the frame
  counter lives in the state as ``t``.
- Every state pytree is checkpointable with orbax as-is — a capability the
  reference only has for MultiLayerBGS and the tracker (SURVEY §5).
"""

from __future__ import annotations

from typing import Any, ClassVar, Optional, Tuple

import jax.numpy as jnp

from tracking_tpu.core.config import BGSConfig

State = Any  # a pytree
StepResult = Tuple[State, jnp.ndarray, jnp.ndarray]


class BGSAlgorithm:
    """Base class. Subclasses set ``Config`` and implement ``init`` / ``step``."""

    name: ClassVar[str] = "?"
    type_id: ClassVar[Optional[int]] = None
    Config: ClassVar[type] = BGSConfig

    def __init__(self, config: Optional[BGSConfig] = None, **overrides: Any):
        cfg = config if config is not None else self.Config()
        if overrides:
            cfg = cfg.replace(**overrides)
        self.config = cfg

    # -- contract ---------------------------------------------------------
    def init(self, h: int, w: int, c: int = 3) -> State:
        raise NotImplementedError

    def warm_start(self, state: State, frame: jnp.ndarray) -> State:
        """One-time model seeding from the first frame (the reference's
        first-frame ``initialize()``/``refreshModel(1.0)`` paths).

        Hoisted out of ``step`` so a ``lax.cond`` on the frame counter never
        degenerates into running the seeding graph every frame when ``step``
        is vmapped over streams (vmap turns cond into select). ``run_video``
        calls it automatically on fresh states; call it yourself before
        driving ``step`` directly. Default: no-op."""
        return state

    def step(self, state: State, frame: jnp.ndarray) -> StepResult:
        raise NotImplementedError

    # -- helpers ----------------------------------------------------------
    @staticmethod
    def _first_frame_select(t: jnp.ndarray, stored: jnp.ndarray, frame: jnp.ndarray):
        """On frame 0 adopt `frame` as the stored model image (the reference's
        ``if (img.empty()) input.copyTo(img)`` idiom)."""
        return jnp.where(t == 0, frame, stored)

    def __repr__(self) -> str:
        return f"{type(self).__name__}({self.config})"
