"""Blob property/filter layer (ops/blobs.py) vs cv2 + brute-force oracles.

Reference surface: package_bgs/jmo/blob.h:81-830 (CBlob properties and the
CBlobGet* evaluator family), BlobResult.h:109-180 (Filter/GetNthBlob).
"""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from tracking_tpu.ops import blobs as B


def _scene():
    """Three well-separated blobs: a filled square, a disk, a thin bar."""
    m = np.zeros((96, 128), np.uint8)
    m[10:30, 10:30] = 255  # 20x20 square, area 400
    cv2.circle(m, (80, 24), 10, 255, -1)
    m[60:64, 20:100] = 255  # 4x80 bar
    return m


@pytest.fixture(scope="module")
def scene_table():
    m = _scene()
    img = np.arange(96 * 128, dtype=np.float32).reshape(96, 128) % 251
    t = B.blob_properties(jnp.asarray(m), image=jnp.asarray(img), max_blobs=8)
    return m, img, t


def _rows_by_area(t):
    order = np.argsort(-np.asarray(t.area))
    return order


def test_area_centroid_bbox_match_cv2(scene_table):
    m, _, t = scene_table
    n, lab, stats, cents = cv2.connectedComponentsWithStats(m, connectivity=8)
    ours = {}
    for k in range(8):
        if bool(t.valid[k]):
            ours[int(t.area[k])] = k
    assert len(ours) == n - 1
    for i in range(1, n):
        k = ours[stats[i, cv2.CC_STAT_AREA]]
        assert np.isclose(float(t.minx[k]), stats[i, cv2.CC_STAT_LEFT])
        assert np.isclose(float(t.miny[k]), stats[i, cv2.CC_STAT_TOP])
        assert np.isclose(float(t.maxx[k]), stats[i, cv2.CC_STAT_LEFT] + stats[i, cv2.CC_STAT_WIDTH] - 1)
        cx = float(t.sumx[k] / t.area[k])
        assert np.isclose(cx, cents[i][0], atol=1e-3)


def test_moments_match_numpy(scene_table):
    m, img, t = scene_table
    ys, xs = np.nonzero(m[10:30, 10:30])
    ys, xs = ys + 10.0, xs + 10.0
    k = int(np.asarray(t.area).tolist().index(400))
    assert np.isclose(float(t.sumxx[k]), (xs * xs).sum(), rtol=1e-6)
    assert np.isclose(float(t.sumyy[k]), (ys * ys).sum(), rtol=1e-6)
    assert np.isclose(float(t.sumxy[k]), (xs * ys).sum(), rtol=1e-6)
    assert np.isclose(float(B.get_moment(t, 1, 0)[k]), xs.sum(), rtol=1e-6)
    sel = m[10:30, 10:30] > 0
    vals = img[10:30, 10:30][sel]
    assert np.isclose(float(t.mean[k]), vals.mean(), rtol=1e-5)
    assert np.isclose(float(t.stddev[k]), vals.std(), rtol=1e-4)


def test_perimeter_crack_length(scene_table):
    m, _, t = scene_table
    k = int(np.asarray(t.area).tolist().index(400))
    # isolated 20x20 square: crack perimeter = 4*20
    assert float(t.perimeter[k]) == 80.0
    assert float(t.extern_perimeter[k]) == 0.0
    # square touching the border
    m2 = np.zeros((32, 64), np.uint8)
    m2[0:10, 0:10] = 255
    t2 = B.blob_properties(jnp.asarray(m2), max_blobs=4)
    assert float(t2.perimeter[0]) == 40.0
    assert float(t2.extern_perimeter[0]) == 20.0
    assert float(B.get_exterior(t2)[0]) == 1.0


def test_hull_perimeter_vs_cv2(scene_table):
    m, _, t = scene_table
    for k in range(8):
        if not bool(t.valid[k]) or float(t.area[k]) < 50:
            continue
        sub = (np.asarray(B.paint_blobs(
            jnp.asarray(_lab(m)), B._invalidate(t, jnp.arange(8) == k))
        ) * 255).astype(np.uint8)
        cnts, _ = cv2.findContours(sub, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_NONE)
        hull = cv2.convexHull(np.vstack([c.reshape(-1, 2) for c in cnts]))
        ref = cv2.arcLength(hull, True) + 4.0  # contour is 1px inside the extent
        assert abs(float(t.hull_perimeter[k]) - ref) / ref < 0.08


def _lab(m):
    from tracking_tpu.ops.cc import label_components
    return label_components(jnp.asarray(m))


def test_shape_features_formulas(scene_table):
    m, _, t = scene_table
    k = int(np.asarray(t.area).tolist().index(400))
    P, A = 80.0, 400.0
    assert np.isclose(float(B.get_compactness(t)[k]), P * P / (4 * np.pi * A), rtol=1e-5)
    # rectangle model recovers the square exactly: length = breadth = 20
    assert np.isclose(float(B.get_length(t)[k]), 20.0, rtol=1e-5)
    assert np.isclose(float(B.get_breadth(t)[k]), 20.0, rtol=1e-5)
    assert np.isclose(float(B.get_elongation(t)[k]), 1.0, rtol=1e-5)
    # the 4x80 bar: length 80, breadth 4, elongation 20
    kb = int(np.asarray(t.area).tolist().index(320))
    assert np.isclose(float(B.get_length(t)[kb]), 80.0, rtol=1e-5)
    assert np.isclose(float(B.get_elongation(t)[kb]), 20.0, rtol=1e-5)
    assert np.isclose(float(B.get_x_center(t)[kb]), 20 + (99 - 20) / 2.0)
    assert np.isclose(float(B.get_diff_y(t)[kb]), 3.0)


def test_moment_ellipse_on_synthetic_ellipse():
    m = np.zeros((128, 160), np.uint8)
    cv2.ellipse(m, (80, 64), (50, 20), 30.0, 0, 360, 255, -1)
    t = B.blob_properties(jnp.asarray(m), max_blobs=4)
    cx, cy, major, minor, ang = (float(v[0]) for v in B.moment_ellipse(t))
    assert abs(cx - 80) < 0.5 and abs(cy - 64) < 0.5
    assert abs(major - 100) / 100 < 0.03
    assert abs(minor - 40) / 40 < 0.03
    # cv2 y-down angle 30° → same convention here
    assert abs(np.degrees(ang) - 30.0) < 1.5
    assert abs(float(B.get_axis_ratio(t)[0]) - 0.4) < 0.02
    assert np.isclose(float(B.get_area_ellipse_ratio(t)[0]),
                      np.pi * (major / 2) * (minor / 2) / float(t.area[0]), rtol=1e-5)


def test_filter_include_exclude(scene_table):
    m, _, t = scene_table
    kept = B.filter_blobs(t, B.get_area(t), B.B_GREATER, 350.0)
    areas = sorted(float(a) for a in np.asarray(kept.area) if a > 0)
    assert areas == [400.0]  # square only (disk≈317, bar=320)
    excl = B.filter_blobs(t, B.get_area(t), B.B_GREATER, 350.0, action=B.B_EXCLUDE)
    assert int(B.get_num_blobs(excl)) == int(B.get_num_blobs(t)) - 1
    inside = B.filter_blobs(t, B.get_area(t), B.B_INSIDE, 300.0, 390.0)
    assert int(B.get_num_blobs(inside)) == 2
    outside = B.filter_blobs(t, B.get_area(t), B.B_OUTSIDE, 300.0, 390.0)
    assert int(B.get_num_blobs(outside)) == 1


def test_nth_blob_and_paint(scene_table):
    m, _, t = scene_table
    first = B.nth_blob(t, B.get_area(t), 0)
    assert float(first.area) == 400.0
    second = B.nth_blob(t, B.get_area(t), 1)
    assert float(second.area) == 320.0
    kept = B.filter_blobs(t, B.get_area(t), B.B_GREATER_OR_EQUAL, 350.0)
    painted = np.asarray(B.paint_blobs(_lab(m), kept))
    assert painted.sum() == 400
    assert painted[10:30, 10:30].all()


def test_distance_and_inside(scene_table):
    m, _, t = scene_table
    k = int(np.asarray(t.area).tolist().index(400))
    d = B.get_distance_from_point(t, 19.5, 19.5)
    assert float(d[k]) < 1e-5
    assert float(B.get_xy_inside(t, 15, 15)[k]) == 1.0
    assert float(B.get_xy_inside(t, 50, 15)[k]) == 0.0
