"""subsenseShrink: box-model dynamics + integration with the SuBSENSE step."""

import jax.numpy as jnp
import numpy as np

from tracking_tpu.core.registry import get_algorithm
from tracking_tpu.runner import run_video


def test_boxes_envelop_background_and_track_noise():
    rng = np.random.default_rng(0)
    base = rng.integers(90, 150, (1, 24, 32, 3), np.uint8)
    frames = np.tile(base, (12, 1, 1, 1)).copy()
    # one flickering region keeps its boxes wide
    frames[:, 4:10, 6:14] = rng.integers(0, 255, (12, 6, 8, 3), np.uint8)
    algo = get_algorithm("subsenseShrink")()
    st, masks = run_video(algo, jnp.asarray(frames))
    up = np.asarray(st["box_up"]).astype(int)
    down = np.asarray(st["box_down"]).astype(int)
    gap = (up - down) // 2
    # flicker region: wide boxes; static region: near the init ±(10,5,5)
    assert gap[6, 9].max() > gap[18, 24].max()
    assert int(st["yzbx_t"]) == 12
    assert 0.0 <= float(st["yzbx_noise_rate"]) <= 1.0


def test_shrink_offset_only_from_signed_positive_bytes():
    # gray-dif bytes 128..255 read negative as signed char → no offset;
    # masks must equal plain SuBSENSE when the shrink map is only 0/255.
    rng = np.random.default_rng(1)
    frames = np.tile(rng.integers(90, 150, (1, 24, 32, 3), np.uint8), (8, 1, 1, 1))
    m1 = np.asarray(run_video(get_algorithm("subsenseShrink")(), jnp.asarray(frames))[1])
    m2 = np.asarray(run_video(get_algorithm("subsense")(), jnp.asarray(frames))[1])
    assert (m1 == m2).all()


def test_subsense_shrink_smoke():
    """Fast-tier representative: the fused SuBSENSE+shrink step compiles
    and runs on a tiny clip with the box-model state advancing."""
    rng = np.random.default_rng(7)
    frames = np.tile(rng.integers(90, 150, (1, 24, 32, 3), np.uint8), (2, 1, 1, 1))
    algo = get_algorithm("subsenseShrink")()
    st, masks = run_video(algo, jnp.asarray(frames))
    assert np.asarray(masks).shape == (2, 24, 32)
    assert int(st["yzbx_t"]) == 2
    assert np.asarray(st["box_up"]).shape[-1] == 3
