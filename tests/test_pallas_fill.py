"""Raster flood-fill kernel vs the XLA fixed-point (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tracking_tpu.ops.morphology import _masked_or_scan, fill_holes
from tracking_tpu.ops.pallas_fill import flood_reach_pallas


def _xla_reach(bg, reach0):
    import jax

    def body(state):
        reach, _, i = state
        r = reach
        r = r | _masked_or_scan(r, bg, 1, False)
        r = r | _masked_or_scan(r, bg, 1, True)
        r = r | _masked_or_scan(r, bg, 0, False)
        r = r | _masked_or_scan(r, bg, 0, True)
        return r, jnp.any(r != reach), i + 1

    r, _, _ = jax.lax.while_loop(
        lambda s: s[1] & (s[2] < 64),
        body,
        (reach0, jnp.array(True), jnp.zeros((), jnp.int32)),
    )
    return r


def _cases(rng):
    H, W = 40, 70
    # random salt
    yield rng.uniform(size=(H, W)) < 0.3
    # blobs with holes
    m = np.zeros((H, W), bool)
    m[5:25, 10:40] = True
    m[10:20, 15:35] = False  # hole
    m[28:38, 45:65] = True
    m[30:36, 50:60] = False  # hole
    yield m
    # spiral (multi-round propagation)
    m = np.zeros((H, W), bool)
    m[4, 4:60] = True
    m[4:36, 60] = True
    m[36, 8:61] = True
    m[8:37, 8] = True
    m[8, 8:55] = True
    yield m
    # empty and full
    yield np.zeros((H, W), bool)
    yield np.ones((H, W), bool)


@pytest.mark.parametrize("seed_mode", ["corner", "border"])
def test_flood_reach_matches_xla(seed_mode):
    rng = np.random.default_rng(3)
    for fg in _cases(rng):
        bg = jnp.asarray(~fg)
        seeds = np.zeros(fg.shape, bool)
        if seed_mode == "corner":
            seeds[0, 0] = True
        else:
            seeds[0, :] = seeds[-1, :] = seeds[:, 0] = seeds[:, -1] = True
        reach0 = jnp.asarray(seeds) & bg
        want = np.asarray(_xla_reach(bg, reach0))
        got = np.asarray(flood_reach_pallas(bg, reach0, interpret=True))
        np.testing.assert_array_equal(want, got)


def test_fill_holes_unchanged_on_cpu():
    """fill_holes keeps its XLA path off-TPU; behavior is the oracle here."""
    rng = np.random.default_rng(5)
    m = (rng.uniform(size=(24, 40)) < 0.2).astype(np.uint8) * 255
    out = np.asarray(fill_holes(jnp.asarray(m), seed="corner"))
    assert out.dtype == np.uint8 and set(np.unique(out)) <= {0, 255}
