"""Bit-exact parity of the fused FGD Bayes-table Pallas kernel vs the XLA
path.

The kernel (ops/pallas_fgd.py) runs the whole table phase VMEM-resident
per tile; its body is the SAME function object
(``bgs/fgd.py:_tables_phase``) the XLA path calls on full maps, so the
paths must agree bit-for-bit — masks AND every carried table leaf. The
XLA path is the oracle, itself behavior-gated by tests/test_bgs_fgd.py
(FGD is a re-derivation with no compiled-C++ oracle). The same comparison
on the real chip (hardware kernel vs XLA) ran bit-exact over 16 real
frames — recorded in TPU_GOLDEN.json.

Sizes cover the un-padded fast path (multiples of 32×128) and the padded
path (both axes ragged).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from tracking_tpu.core.registry import get_algorithm


def _run(monkeypatch, env, frames, h, w, **cfg):
    monkeypatch.setenv("TRACKING_TPU_FGD", env)
    algo = get_algorithm("FGD")(**cfg)
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
    ]  # motion-window crop: matches, inserts, replacements and decay fire
    m_x, s_x = _run(monkeypatch, "xla", frames, h, w)
    m_k, s_k = _run(monkeypatch, "interp", frames, h, w)
    np.testing.assert_array_equal(m_k, m_x)
    for key in s_x:
        np.testing.assert_array_equal(s_k[key], s_x[key], err_msg=key)
