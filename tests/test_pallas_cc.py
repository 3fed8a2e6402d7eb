"""Raster CC kernel vs the XLA pointer-jumping labeler (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tracking_tpu.ops.cc import label_components
from tracking_tpu.ops.pallas_cc import label_components_pallas


def _cases(rng):
    H, W = 40, 70
    yield rng.uniform(size=(H, W)) < 0.35  # dense random: many merges
    yield rng.uniform(size=(H, W)) < 0.05  # sparse specks
    m = np.zeros((H, W), bool)
    m[5:25, 10:40] = True
    m[10:20, 15:35] = False
    m[28:38, 45:65] = True
    yield m
    # diagonal staircase (8-conn joins, 4-conn separates)
    m = np.zeros((H, W), bool)
    for k in range(30):
        m[k, k] = True
    yield m
    # spiral: multi-round cross-tile propagation
    m = np.zeros((H, W), bool)
    m[4, 4:60] = True
    m[4:36, 60] = True
    m[36, 8:61] = True
    m[8:37, 8] = True
    m[8, 8:55] = True
    yield m
    yield np.zeros((H, W), bool)
    yield np.ones((H, W), bool)


@pytest.mark.parametrize("conn", [4, 8])
def test_label_components_pallas_matches_xla(conn):
    rng = np.random.default_rng(9)
    for fg in _cases(rng):
        mask = jnp.asarray(fg.astype(np.uint8) * 255)
        want = np.asarray(label_components(mask, connectivity=conn))
        got = np.asarray(
            label_components_pallas(mask, connectivity=conn, interpret=True)
        )
        np.testing.assert_array_equal(want, got)


def test_label_components_pallas_padded_shape():
    # non-multiple-of-tile shapes exercise the padded-index conversion
    rng = np.random.default_rng(2)
    fg = rng.uniform(size=(37, 101)) < 0.3
    mask = jnp.asarray(fg.astype(np.uint8) * 255)
    want = np.asarray(label_components(mask))
    got = np.asarray(label_components_pallas(mask, interpret=True))
    np.testing.assert_array_equal(want, got)
