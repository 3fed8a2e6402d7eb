"""Bit-exact parity of the fused DPTexture Pallas kernel vs the XLA path.

The kernel (ops/pallas_texture.py) fuses windowed-histogram production and
the histogram-intersection proximity of ``TextureBGS.h:46-54``; the XLA
formulation in bgs/texture.py (_region_hist + the u8 min/i32 sum) is the
oracle — itself golden-gated against the compiled reference C++
(tests/test_golden_cpp.py). Everything here is exact integer math, so the
gates are equality, not tolerances.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from tracking_tpu.bgs.texture import NUM_BINS, DPTextureBGS, _lbp6, _region_hist
from tracking_tpu.ops.pallas_texture import texture_prox_cur_pallas


def _xla_prox_cur(codes, model):
    cur = jnp.stack([_region_hist(codes[ch]) for ch in range(3)])
    prox = jnp.sum(jnp.minimum(model, cur), axis=(0, 1), dtype=jnp.int32)
    return prox, cur


@pytest.mark.parametrize("h,w", [(48, 64), (40, 130), (16, 128)])
def test_kernel_matches_xla(h, w):
    rng = np.random.default_rng(7)
    codes = jnp.asarray(rng.integers(0, NUM_BINS, (3, h, w)), jnp.uint8)
    model = jnp.asarray(rng.integers(0, 122, (3, NUM_BINS, h, w)), jnp.uint8)
    prox_k, cur_k = texture_prox_cur_pallas(codes, model, interpret=True)
    prox_x, cur_x = _xla_prox_cur(codes, model)
    np.testing.assert_array_equal(np.asarray(cur_k), np.asarray(cur_x))
    np.testing.assert_array_equal(np.asarray(prox_k), np.asarray(prox_x))


def test_full_step_matches_xla_path(monkeypatch):
    """Whole DPTextureBGS steps (warm_start + 4 frames of real-ish content)
    with the kernel path forced vs the default XLA path: identical masks AND
    identical carried model state."""
    rng = np.random.default_rng(3)
    h, w = 40, 64
    base = rng.integers(0, 256, (h, w, 3))
    frames = [
        np.clip(base + rng.integers(-20, 20, (h, w, 3)), 0, 255).astype(np.uint8)
        for _ in range(5)
    ]
    # paint a moving block so FG pixels (and the transposed update quirk)
    # are exercised
    for i, f in enumerate(frames[1:], 1):
        f[8 : 8 + 12, 6 * i : 6 * i + 10] = 240

    def run(env):
        monkeypatch.setenv("TRACKING_TPU_TEXTURE", env)
        algo = DPTextureBGS()
        st = algo.warm_start(algo.init(h, w, 3), jnp.asarray(frames[0]))
        masks = []
        for f in frames[1:]:
            st, fg, _ = algo.step(st, jnp.asarray(f))
            masks.append(np.asarray(fg))
        return np.stack(masks), np.asarray(st["model"])

    m_x, st_x = run("xla")
    m_k, st_k = run("interp")
    np.testing.assert_array_equal(m_k, m_x)
    np.testing.assert_array_equal(st_k, st_x)
