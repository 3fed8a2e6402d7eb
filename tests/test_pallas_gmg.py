"""Parity of the fused GMG Pallas kernel vs the XLA formulation.

Integer state (colors, nf) and decisions must match exactly; weights may
differ by reassociation ulps on normalization frames (the same tolerance
bgs/gmg.py documents for its own tree reductions), so weights are gated
allclose and masks exactly.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from tracking_tpu.bgs.gmg import GMG


def _clip(rng, n, h, w):
    base = rng.integers(0, 256, (h, w, 3))
    frames = []
    for i in range(n):
        f = np.clip(base + rng.integers(-8, 8, (h, w, 3)), 0, 255).astype(np.uint8)
        if i >= 3:
            f[6 : 6 + 10, 3 * i : 3 * i + 8] = 230  # moving block
        frames.append(f)
    return frames


def test_gmg_kernel_matches_xla(monkeypatch):
    rng = np.random.default_rng(5)
    h, w = 24, 40
    # spans the end-of-training normalization + growth frames
    frames = _clip(rng, 10, h, w)

    def run(env):
        monkeypatch.setenv("TRACKING_TPU_GMG", env)
        algo = GMG(initializationFrames=4)
        st = algo.init(h, w, 3)
        masks = []
        for f in frames:
            st, fg, _ = algo.step(st, jnp.asarray(f))
            masks.append(np.asarray(fg))
        return np.stack(masks), st

    m_x, st_x = run("xla")
    m_k, st_k = run("interp")
    np.testing.assert_array_equal(m_k, m_x)
    np.testing.assert_array_equal(np.asarray(st_k["colors"]), np.asarray(st_x["colors"]))
    np.testing.assert_array_equal(np.asarray(st_k["nf"]), np.asarray(st_x["nf"]))
    np.testing.assert_allclose(
        np.asarray(st_k["weights"]), np.asarray(st_x["weights"]), rtol=2e-6, atol=1e-7
    )
