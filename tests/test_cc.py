"""Connected components + blob stats vs cv2.connectedComponentsWithStats."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from tracking_tpu.ops.cc import extract_blobs, label_components
from tracking_tpu.ops.hist import equalize_hist


def _random_blob_mask(rng, h=64, w=96, n_seeds=8):
    mask = np.zeros((h, w), np.uint8)
    for _ in range(n_seeds):
        y, x = rng.integers(5, h - 5), rng.integers(5, w - 5)
        rh, rw = rng.integers(2, 10), rng.integers(2, 12)
        mask[max(0, y - rh) : y + rh, max(0, x - rw) : x + rw] = 255
    return mask


@pytest.mark.parametrize("conn", [4, 8])
def test_labels_match_cv2_partition(rng, conn):
    for _ in range(3):
        mask = _random_blob_mask(rng)
        ours = np.asarray(label_components(jnp.asarray(mask), conn))
        n_cv, cv_lab = cv2.connectedComponents((mask > 0).astype(np.uint8), connectivity=conn)
        # same partition: bijection between our labels and cv2 labels
        fg = mask > 0
        pairs = set(zip(ours[fg].tolist(), cv_lab[fg].tolist()))
        assert len(pairs) == n_cv - 1  # one-to-one
        assert len({a for a, _ in pairs}) == len({b for _, b in pairs}) == n_cv - 1
        assert (ours[~fg] == -1).all()


def test_blob_stats_match_cv2(rng):
    mask = _random_blob_mask(rng, 80, 120, 10)
    blobs = extract_blobs(jnp.asarray(mask), max_blobs=32)
    n, lab, stats, cents = cv2.connectedComponentsWithStats((mask > 0).astype(np.uint8), connectivity=8)
    ours = sorted(
        [
            (int(a), float(cx), float(cy), int(x0), int(y0), int(x1), int(y1))
            for a, cx, cy, x0, y0, x1, y1 in zip(
                np.asarray(blobs.area),
                np.asarray(blobs.cx),
                np.asarray(blobs.cy),
                np.asarray(blobs.x0),
                np.asarray(blobs.y0),
                np.asarray(blobs.x1),
                np.asarray(blobs.y1),
            )
            if a > 0
        ]
    )
    refs = sorted(
        [
            (
                int(stats[i, cv2.CC_STAT_AREA]),
                float(cents[i][0]),
                float(cents[i][1]),
                int(stats[i, cv2.CC_STAT_LEFT]),
                int(stats[i, cv2.CC_STAT_TOP]),
                int(stats[i, cv2.CC_STAT_LEFT] + stats[i, cv2.CC_STAT_WIDTH] - 1),
                int(stats[i, cv2.CC_STAT_TOP] + stats[i, cv2.CC_STAT_HEIGHT] - 1),
            )
            for i in range(1, n)
        ]
    )
    assert len(ours) == len(refs)
    for o, r in zip(ours, refs):
        assert o[0] == r[0]
        np.testing.assert_allclose(o[1:3], r[1:3], atol=1e-4)
        assert o[3:] == r[3:]


def test_max_blobs_truncates_smallest(rng):
    mask = np.zeros((32, 64), np.uint8)
    # 4 blobs with distinct areas
    mask[2:4, 2:4] = 255  # 4 px
    mask[10:14, 10:14] = 255  # 16 px
    mask[20:26, 20:28] = 255  # 48 px
    mask[2:4, 50:53] = 255  # 6 px
    blobs = extract_blobs(jnp.asarray(mask), max_blobs=2)
    areas = sorted(int(a) for a in np.asarray(blobs.area) if a > 0)
    assert areas == [16, 48]


def test_empty_mask():
    blobs = extract_blobs(jnp.zeros((16, 16), jnp.uint8), max_blobs=4)
    assert (np.asarray(blobs.area) == 0).all()
    lab = np.asarray(label_components(jnp.zeros((8, 8), jnp.uint8)))
    assert (lab == -1).all()


def test_equalize_hist_matches_cv2(rng):
    img = rng.integers(0, 256, (48, 64), dtype=np.uint8)
    ours = np.asarray(equalize_hist(jnp.asarray(img)))
    ref = cv2.equalizeHist(img)
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


def test_extract_blobs_mxu_matches_scatter_path():
    """The TPU stats path (one-hot MXU contractions) must agree with the
    scatter formulation: ints exactly, centroids to f32 tolerance."""
    import jax.numpy as jnp

    from tracking_tpu.ops.cc import _extract_blobs_mxu, extract_blobs, label_components

    rng = np.random.default_rng(17)
    cases = [
        (rng.uniform(size=(48, 64)) < 0.3),
        (rng.uniform(size=(48, 64)) < 0.03),
        np.zeros((48, 64), bool),
    ]
    m = np.zeros((48, 64), bool)
    m[5:20, 10:30] = True
    m[30:40, 40:60] = True
    m[33:36, 45:50] = False
    cases.append(m)
    for fg in cases:
        mask = jnp.asarray(fg.astype(np.uint8) * 255)
        want = extract_blobs(mask, max_blobs=16)
        lab = label_components(mask)
        got = _extract_blobs_mxu(lab, 16, n_cand=512)
        for name in ("area", "x0", "y0", "x1", "y1", "label"):
            np.testing.assert_array_equal(
                np.asarray(getattr(want, name)),
                np.asarray(getattr(got, name)),
                err_msg=name,
            )
        for name in ("cx", "cy"):
            np.testing.assert_allclose(
                np.asarray(getattr(want, name)),
                np.asarray(getattr(got, name)),
                rtol=1e-5, atol=1e-4, err_msg=name,
            )
