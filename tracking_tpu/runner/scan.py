"""Temporal scan runner: stream a video tensor through a BGS state machine.

Replaces the reference's per-frame host loop (``VideoCapture.cpp:151-239`` →
``FrameProcessor::process`` → ``IBGS::process``) with a single compiled
``lax.scan`` over a device-resident ``[T, H, W, C]`` chunk. State is carried
across chunks, so arbitrarily long streams run in bounded memory; multiple
streams batch via ``vmap`` (leading stream axis).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tracking_tpu.bgs.base import BGSAlgorithm, State


def make_step_fn(algo: BGSAlgorithm, with_background: bool = False):
    """Return a jittable (state, frame) → (state, outputs) scan body."""

    def body(state, frame):
        state, fg, bg = algo.step(state, frame)
        if with_background:
            return state, (fg, bg)
        return state, fg

    return body


@partial(jax.jit, static_argnames=("algo", "with_background", "unroll"))
def _scan_chunk(algo, state, frames, with_background: bool, unroll: int):
    return jax.lax.scan(
        make_step_fn(algo, with_background), state, frames, unroll=unroll
    )


def run_video(
    algo: BGSAlgorithm,
    frames: jnp.ndarray,
    state: Optional[State] = None,
    with_background: bool = False,
    unroll: int = 1,
) -> Tuple[State, jnp.ndarray]:
    """Run `algo` over frames [T, H, W, C] (u8). Returns (final_state, masks).

    masks: u8 [T, H, W]. If ``with_background``, returns
    (state, (masks, backgrounds)). Pass the returned state back in to continue
    a stream across chunks.

    Note: algos must be hashable jit-static; BGSAlgorithm instances hold only a
    frozen config, so instances are reused across calls to hit the jit cache.
    """
    if state is None:
        h, w = frames.shape[1], frames.shape[2]
        c = frames.shape[3] if frames.ndim == 4 else 1
        state = algo.init(h, w, c)
        state = _warm(algo, state, frames[0])
    return _scan_chunk(algo, state, frames, with_background, unroll)


@partial(jax.jit, static_argnames=("algo",))
def _warm(algo, state, first_frame):
    return algo.warm_start(state, first_frame)
