"""Consensus v2: frame-global slot updates + read-only grouped-DMA walk
kernel (ops/pallas_consensus2, bgs/lbsp_family._apply_updates_global).

Parity strategy mirrors tests/test_pallas_consensus.py: the walk kernel in
interpret mode must match the XLA consensus scan bit-exactly; the global-
slot update must match a naive per-pixel application of the same decisions;
and a SuBSENSE v2 end-to-end run must agree with v1 on real video (same
model distributionally — only the slot-index draws and write timing differ).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tracking_tpu.bgs.lbsp_family as LF
from tracking_tpu.ops import lbsp
from tracking_tpu.ops.pallas_consensus import pack_pending_vals
from tracking_tpu.ops.pallas_consensus2 import _group_size, consensus_walk_pallas


def _thr_fn(delta, rel, div, hi):
    """The SuBSENSE closed-form LBSP threshold (same as
    tests/test_pallas_consensus._thr_fn / lbsp_family.SuBSENSE._thr_fn)."""

    def thr(v):
        vv = v.astype(jnp.float32)
        base = jnp.clip(jnp.rint(vv * rel / div), 0, 255)
        lo = jnp.ceil(vv * rel / 4.0)
        return jnp.clip(
            base + delta.astype(jnp.float32),
            jnp.minimum(base, lo),
            jnp.maximum(base, hi),
        ).astype(jnp.int32)

    return thr


def test_group_size_divides():
    for n in (50, 35, 30, 20, 12, 9, 7, 1):
        g = _group_size(n)
        assert n % g == 0 and 1 <= g <= 10


@pytest.mark.parametrize("which", ["v2", "v3"])
@pytest.mark.parametrize("C", [1, 3])
def test_walk_kernel_matches_xla(C, which):
    """The read-only walk kernels (interpret) == the XLA consensus scan.
    v2 = pallas_consensus2's grouped-DMA walk, with N=20 -> G=10 -> 2 DMA
    groups so the group loop, double-buffering and speculative-prefetch
    cleanup all execute; v3 = pallas_consensus.consensus_read_pallas
    (full-bank blocks, no write-back)."""
    rng = np.random.default_rng(11 + C)
    H, W, N = 24, 40, 20
    planes = tuple(
        jnp.asarray(rng.integers(0, 256, (H, W), np.uint8)) for _ in range(C)
    )
    colors = tuple(
        jnp.asarray(rng.integers(0, 256, (N, H, W), np.uint8)) for _ in range(C)
    )
    descs = tuple(
        jnp.asarray(rng.integers(0, 1 << 16, (N, H, W), np.uint16))
        for _ in range(C)
    )
    # half the image near-background (samples == plane) so whole tiles
    # converge inside group 0 and the second group's DMA is skipped there
    colors = tuple(
        c.at[:, : H // 2].set(jnp.broadcast_to(p[: H // 2], (N, H // 2, W)))
        for c, p in zip(colors, planes)
    )
    delta = jnp.asarray(2, jnp.int32)
    rel, div = 0.333, (3.0 if C == 1 else 1.0)
    hi = float(np.rint(255 * rel))
    thr_fn = _thr_fn(delta, rel, div, hi)
    intra, nb = LF._intra_descriptor(planes, thr_fn)
    descs = tuple(
        d.at[: N // 2, : H // 2].set(jnp.broadcast_to(i[: H // 2], (N // 2, H // 2, W)))
        for d, i in zip(descs, intra)
    )
    min_cd, desc_off = 30, 3
    R = jnp.asarray(rng.uniform(1.0, 6.0, (H, W)).astype(np.float32))
    unstable = jnp.asarray(rng.integers(0, 2, (H, W)).astype(np.int32))
    stab_off = min_cd // 5
    ct_f = R * min_cd - jnp.where(unstable != 0, 0, stab_off)
    color_thr = ct_f.astype(jnp.int32) // (2 if C == 1 else 1)
    desc_thr = (
        (1 << jnp.floor(R + 0.5).astype(jnp.int32))
        + desc_off
        + jnp.where(unstable != 0, desc_off, 0)
    )
    required = 2

    def body(carry, sd):
        count, mind, mins = carry
        s_colors, s_descs = sd
        cd, dd = [], []
        for ci in range(C):
            cdist = jnp.abs(
                planes[ci].astype(jnp.int16) - s_colors[ci].astype(jnp.int16)
            ).astype(jnp.int32)
            intra_d = lbsp.popcount16(jnp.bitwise_xor(intra[ci], s_descs[ci]))
            inter_d = LF._inter_dist_1ch(nb[ci], s_colors[ci], s_descs[ci], thr_fn)
            cd.append(cdist)
            dd.append((intra_d + inter_d) // 2)
        if C == 1:
            sum_d = jnp.minimum((dd[0] // 4) * 15 + cd[0], 255)
            good = (cd[0] <= color_thr) & (dd[0] <= desc_thr) & (sum_d <= color_thr)
            td, ts = dd[0], sum_d
        else:
            sum_c = [jnp.minimum((dd[ci] // 2) * 15 + cd[ci], 255) for ci in range(C)]
            sc = (color_thr * 3) // 2
            ok = jnp.ones((H, W), bool)
            for ci in range(C):
                ok &= (cd[ci] <= sc) & (sum_c[ci] <= sc)
            td, ts = sum(dd), sum(sum_c)
            good = ok & (td <= desc_thr * 3) & (ts <= color_thr * 3)
        live = good & (count < required)
        mind = jnp.where(live, jnp.minimum(mind, td), mind)
        mins = jnp.where(live, jnp.minimum(mins, ts), mins)
        return (count + live.astype(jnp.int32), mind, mins), None

    c0 = (
        jnp.zeros((H, W), jnp.int32),
        jnp.full((H, W), 16 * C, jnp.int32),
        jnp.full((H, W), 255 * C, jnp.int32),
    )
    (cnt_x, mind_x, mins_x), _ = jax.lax.scan(body, c0, (colors, descs))

    if which == "v3":
        from tracking_tpu.ops.pallas_consensus import consensus_read_pallas

        walk = consensus_read_pallas
    else:
        walk = consensus_walk_pallas
    cnt_p, mind_p, mins_p, intra_p = walk(
        planes, colors, descs, delta, R, unstable,
        required=jnp.asarray(required), rel=rel, div=div, hi_const=hi,
        min_cd=min_cd, desc_off=desc_off, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(cnt_x), np.asarray(cnt_p))
    np.testing.assert_array_equal(np.asarray(mind_x), np.asarray(mind_p))
    np.testing.assert_array_equal(np.asarray(mins_x), np.asarray(mins_p))
    for ci in range(C):
        np.testing.assert_array_equal(
            np.asarray(intra[ci], np.int32), np.asarray(intra_p[ci])
        )


@pytest.mark.parametrize("C", [1, 3])
def test_apply_updates_global_matches_naive(C):
    """_apply_updates_global == a naive full-bank select applying the same
    decisions with the same global slots and the v1 precedence (spread over
    self, 3x3 over 5x5)."""
    rng = np.random.default_rng(5 + C)
    H, W, N = 12, 18, 10
    colors = tuple(
        jnp.asarray(rng.integers(0, 256, (N, H, W), np.uint8)) for _ in range(C)
    )
    descs = tuple(
        jnp.asarray(rng.integers(0, 1 << 16, (N, H, W), np.uint16))
        for _ in range(C)
    )
    planes = tuple(
        jnp.asarray(rng.integers(0, 256, (H, W), np.uint8)) for _ in range(C)
    )
    intras = tuple(
        jnp.asarray(rng.integers(0, 1 << 16, (H, W), np.uint16)) for _ in range(C)
    )
    fire3 = jnp.asarray(rng.integers(0, 2, (H, W)).astype(bool))
    fire5 = jnp.asarray(rng.integers(0, 2, (H, W)).astype(bool))
    fires = fire3.astype(jnp.uint8) | (fire5.astype(jnp.uint8) << 1)
    upd1 = jnp.asarray(rng.integers(0, 2, (H, W)).astype(np.int32))
    o3 = jnp.asarray(rng.integers(0, 8, (H, W)).astype(np.int32))
    o5 = jnp.asarray(rng.integers(0, 24, (H, W)).astype(np.int32))
    s1, s3, s5 = 4, 7, 4  # deliberate s1 == s5 collision
    bg0 = tuple(jnp.sum(c.astype(jnp.int32), 0) for c in colors)

    vals = pack_pending_vals(planes, intras, fires)
    from tracking_tpu.ops.pallas_consensus import nb3_to_nb5_idx

    u3 = nb3_to_nb5_idx(o3)
    nc, nd, bg = LF._apply_updates_global(
        upd1, u3, o5, jnp.asarray(s1), jnp.asarray(s3), jnp.asarray(s5),
        vals, colors, descs, bg0,
    )

    # naive: resolve picks with the shared helper, then apply with
    # full-bank selects in v1 precedence order
    ok3, ok5, nb_col, nb_desc = LF._resolve_spread_xla(
        vals, u3, o5, colors[0].dtype, descs[0].dtype,
        lambda ci, dy, dx: LF._shift_clamped(vals[ci], dy, dx),
    )
    slot_axis = jnp.arange(N)[:, None, None]
    okn = ok3 | ok5
    slotn = jnp.where(ok3, s3, s5)
    m1 = (upd1 != 0)[None] & (slot_axis == s1)
    mn = okn[None] & (slot_axis == slotn[None])
    for ci in range(C):
        own_c = (vals[ci] & 0xFF).astype(jnp.uint8)
        exp_c = jnp.where(mn, nb_col[ci][None], jnp.where(m1, own_c[None], colors[ci]))
        np.testing.assert_array_equal(np.asarray(exp_c), np.asarray(nc[ci]))
        own_d = ((vals[ci] >> 8) & 0xFFFF).astype(jnp.uint16)
        exp_d = jnp.where(mn, nb_desc[ci][None], jnp.where(m1, own_d[None], descs[ci]))
        np.testing.assert_array_equal(np.asarray(exp_d), np.asarray(nd[ci]))
        # carried bg sum stays consistent with the actual bank
        np.testing.assert_array_equal(
            np.asarray(jnp.sum(exp_c.astype(jnp.int32), 0)), np.asarray(bg[ci])
        )


def test_subsense_v2_behaves_like_v1():
    """SuBSENSE v2 vs v1 on real video through the motion window: the models
    differ only in slot-draw granularity and write timing, so settled masks
    must agree closely and the carried bg_sum must equal the bank sum."""
    from tracking_tpu.io.video import read_video
    from tracking_tpu.runner import run_video

    path = "/root/reference/dataset/video.avi"
    if not os.path.exists(path):
        pytest.skip("reference video unavailable")
    frames = jnp.asarray(read_video(path, max_frames=140))

    os.environ["TRACKING_TPU_CONSENSUS"] = "v1"
    try:
        a1 = LF.SuBSENSE()
        s1 = a1.init(*frames.shape[1:3], frames.shape[3])
        assert "pend_ctrl" in s1 and "bg_sum" not in s1
        _, m1 = run_video(a1, frames, state=jax.jit(a1.warm_start)(s1, frames[0]))
        os.environ["TRACKING_TPU_CONSENSUS"] = "v2"
        a2 = LF.SuBSENSE()
        s2 = a2.init(*frames.shape[1:3], frames.shape[3])
        assert "bg_sum" in s2 and "pend_ctrl" not in s2
        s2, m2 = run_video(a2, frames, state=jax.jit(a2.warm_start)(s2, frames[0]))
    finally:
        os.environ.pop("TRACKING_TPU_CONSENSUS", None)
    m1n, m2n = np.asarray(m1), np.asarray(m2)
    assert (m1n[60:] > 0).mean() > 0.005  # non-vacuity: motion window seen
    agree = (m1n[30:] == m2n[30:]).mean()
    assert agree > 0.99, f"v1/v2 agreement {agree:.5f}"
    for ci in range(len(s2["colors"])):
        np.testing.assert_array_equal(
            np.asarray(jnp.sum(s2["colors"][ci].astype(jnp.int32), 0)),
            np.asarray(s2["bg_sum"][ci]),
        )
