"""Bit-exact parity of the fused MultiLayer Pallas kernel vs the XLA path.

The kernel (ops/pallas_multilayer.py) runs the whole per-pixel update of
``jmo/CMultiLayerBGS.cpp:375-800`` VMEM-resident per tile; its body is the
SAME function object (``bgs/multilayer.py:_ml_update``) the XLA path calls
on full maps, so the paths must agree bit-for-bit — masks AND every carried
state leaf. The XLA path is the oracle, itself gated against the compiled
reference C++ (tests/test_golden_cpp.py multilayer case) and the sequential
numpy oracle (tests/test_bgs_multilayer.py). The same comparison on the
real chip (hardware kernel vs XLA) ran bit-exact over 24 frames of
dataset/video.avi — recorded in TPU_GOLDEN.json.

Sizes cover the un-padded fast path (multiples of 16×128) and the padded
path (both axes ragged, exercising the pad/seed/crop logic).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from tracking_tpu.core.registry import get_algorithm


def _run(monkeypatch, env, frames, h, w, **cfg):
    monkeypatch.setenv("TRACKING_TPU_MULTILAYER", env)
    algo = get_algorithm("MultiLayerBGS")(**cfg)
    st = algo.warm_start(algo.init(h, w, 3), frames[0])
    masks = []
    for f in frames[1:]:
        st, fg, _ = algo.step(st, f)
        masks.append(np.asarray(fg))
    return np.stack(masks), jax.tree_util.tree_map(np.asarray, st)


@pytest.mark.medium
@pytest.mark.parametrize("h,w", [(32, 128), (26, 70)])
def test_kernel_matches_xla_path(monkeypatch, video_frames, h, w):
    frames = [
        jnp.asarray(f[:h, :w]) for f in video_frames[20:26]
    ]  # motion-window crop: seeds, matches, no-matches and removals all fire
    m_x, s_x = _run(monkeypatch, "xla", frames, h, w)
    m_k, s_k = _run(monkeypatch, "interp", frames, h, w)
    np.testing.assert_array_equal(m_k, m_x)
    for key in s_x:
        np.testing.assert_array_equal(s_k[key], s_x[key], err_msg=key)


@pytest.mark.medium
def test_kernel_matches_xla_path_detect_after(monkeypatch, video_frames):
    """detectAfter exercises the traced-scalar (SMEM) rate flip."""
    h, w = 24, 64
    frames = [jnp.asarray(f[:h, :w]) for f in video_frames[20:26]]
    m_x, s_x = _run(monkeypatch, "xla", frames, h, w, detectAfter=3)
    m_k, s_k = _run(monkeypatch, "interp", frames, h, w, detectAfter=3)
    np.testing.assert_array_equal(m_k, m_x)
    for key in s_x:
        np.testing.assert_array_equal(s_k[key], s_x[key], err_msg=key)
