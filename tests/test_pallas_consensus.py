"""Pallas fused consensus + deferred bank updates vs the XLA formulation
(interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tracking_tpu.bgs import lbsp_family as LF
from tracking_tpu.ops import lbsp
from tracking_tpu.ops.pallas_consensus import (
    NB3_IN_NB5,
    NB5,
    consensus_lobster_pallas,
    consensus_pallas,
    nb3_to_nb5_idx,
    pack_pending_ctrl,
    pack_pending_vals,
)


def test_offset_tables_match_lbsp_family():
    assert tuple(map(tuple, LF._NB5)) == NB5
    assert tuple(map(tuple, LF._NB3)) == tuple(NB5[k] for k in NB3_IN_NB5)


def _rand_pending(rng, H, W, C, N, with_5x5=True):
    """Random draws in both raw form (for the legacy-pick oracle) and packed
    pending-log form."""
    d = dict(
        upd1=jnp.asarray(rng.random((H, W)) < 0.3),
        slot1=jnp.asarray(rng.integers(0, N, (H, W)).astype(np.int32)),
        fire3=jnp.asarray(rng.random((H, W)) < 0.4),
        fire5=jnp.asarray(rng.random((H, W)) < (0.4 if with_5x5 else 0.0)),
        o3=jnp.asarray(rng.integers(0, 8, (H, W)).astype(np.int32)),
        o5=jnp.asarray(rng.integers(0, 24, (H, W)).astype(np.int32)),
        slot3=jnp.asarray(rng.integers(0, N, (H, W)).astype(np.int32)),
        slot5=jnp.asarray(rng.integers(0, N, (H, W)).astype(np.int32)),
        planes=tuple(
            jnp.asarray(rng.integers(0, 256, (H, W), np.uint8)) for _ in range(C)
        ),
        intras=tuple(
            jnp.asarray(rng.integers(0, 65536, (H, W)).astype(np.uint16))
            for _ in range(C)
        ),
    )
    fires = d["fire3"].astype(jnp.uint8) | (d["fire5"].astype(jnp.uint8) << 1)
    ctrl = pack_pending_ctrl(
        d["upd1"], d["slot1"], nb3_to_nb5_idx(d["o3"]), d["o5"],
        d["slot3"], d["slot5"],
    )
    vals = pack_pending_vals(d["planes"], d["intras"], fires)
    return d, ctrl, vals


def _legacy_apply(d, colors, descs):
    """The validated pre-deferral write formulation (_pick_neighbor select
    chains + [N, H, W] slot selects) — the oracle for the pending replay."""
    C, N = len(colors), colors[0].shape[0]
    src_arrays = tuple(d["planes"]) + tuple(d["intras"])
    p3 = LF._pick_neighbor(d["o3"], LF._NB3, (d["fire3"],) + src_arrays)
    p5 = LF._pick_neighbor(d["o5"], LF._NB5, (d["fire5"],) + src_arrays)
    ok3, ok5 = p3[0], p5[0]
    okn = ok3 | ok5
    slotn = jnp.where(ok3, d["slot3"], d["slot5"])
    nb_col = tuple(jnp.where(ok3, p3[1 + ci], p5[1 + ci]) for ci in range(C))
    nb_desc = tuple(
        jnp.where(ok3, p3[1 + C + ci], p5[1 + C + ci]) for ci in range(C)
    )
    slot_axis = jnp.arange(N)[:, None, None]
    m1 = d["upd1"][None] & (d["slot1"][None] == slot_axis)
    mn = okn[None] & (slotn[None] == slot_axis)
    new_colors = tuple(
        jnp.where(mn, nb_col[ci][None], jnp.where(m1, d["planes"][ci][None], colors[ci]))
        for ci in range(C)
    )
    new_descs = tuple(
        jnp.where(mn, nb_desc[ci][None], jnp.where(m1, d["intras"][ci][None], descs[ci]))
        for ci in range(C)
    )
    return new_colors, new_descs


def _rand_banks(rng, H, W, C, N):
    colors = tuple(
        jnp.asarray(rng.integers(0, 256, (N, H, W), np.uint8)) for _ in range(C)
    )
    descs = tuple(
        jnp.asarray(rng.integers(0, 65536, (N, H, W)).astype(np.uint16))
        for _ in range(C)
    )
    return colors, descs


@pytest.mark.parametrize("C,with_5x5", [(1, True), (3, True), (3, False)])
def test_apply_pending_xla_matches_legacy(C, with_5x5):
    rng = np.random.default_rng(11 * C + with_5x5)
    H, W, N = 24, 40, 9
    colors, descs = _rand_banks(rng, H, W, C, N)
    d, ctrl, vals = _rand_pending(rng, H, W, C, N, with_5x5)
    exp_c, exp_d = _legacy_apply(d, colors, descs)
    got_c, got_d, bg = LF._apply_pending_xla(ctrl, vals, colors, descs)
    for ci in range(C):
        np.testing.assert_array_equal(np.asarray(exp_c[ci]), np.asarray(got_c[ci]))
        np.testing.assert_array_equal(np.asarray(exp_d[ci]), np.asarray(got_d[ci]))
        np.testing.assert_array_equal(
            np.asarray(jnp.sum(exp_c[ci].astype(jnp.int32), axis=0)),
            np.asarray(bg[ci]),
        )


def _thr_fn(delta, rel, div, hi):
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


@pytest.mark.parametrize("C,delta_v", [(1, 0), (3, 0), (3, -3), (3, 5)])
def test_pallas_consensus_matches_xla(C, delta_v):
    rng = np.random.default_rng(C + delta_v)
    H, W, N = 24, 40, 9
    planes = tuple(
        jnp.asarray(rng.integers(0, 256, (H, W), np.uint8)) for _ in range(C)
    )
    colors0, descs0 = _rand_banks(rng, H, W, C, N)
    d, ctrl, vals = _rand_pending(rng, H, W, C, N)
    delta = jnp.asarray(delta_v, jnp.int32)
    rel, div = 0.333, (3.0 if C == 1 else 1.0)
    hi = float(np.rint(255 * rel))
    thr_fn = _thr_fn(delta, rel, div, hi)
    intra, nb = LF._intra_descriptor(planes, thr_fn)
    # thresholds derive from R + the old unstable mask, in-kernel on the
    # Pallas path and via the reference formula (:327-328) here
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

    # XLA reference: replay the pending log, then the consensus scan
    # (mirrors the SuBSENSE step's XLA path)
    colors, descs, bg_x = LF._apply_pending_xla(ctrl, vals, colors0, descs0)

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

    cnt_p, mind_p, mins_p, intra_p, bg_p, col_p, desc_p = consensus_pallas(
        planes, colors0, descs0, ctrl, vals, delta, R, unstable,
        required=jnp.asarray(required), rel=rel, div=div, hi_const=hi,
        min_cd=min_cd, desc_off=desc_off, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(cnt_x), np.asarray(cnt_p))
    np.testing.assert_array_equal(np.asarray(mind_x), np.asarray(mind_p))
    np.testing.assert_array_equal(np.asarray(mins_x), np.asarray(mins_p))
    for ci in range(C):  # in-kernel intra descriptors match the XLA ones
        np.testing.assert_array_equal(
            np.asarray(intra[ci], np.int32), np.asarray(intra_p[ci])
        )
        # the pending replay and bg sums match the XLA apply bit-exactly
        np.testing.assert_array_equal(np.asarray(colors[ci]), np.asarray(col_p[ci]))
        np.testing.assert_array_equal(np.asarray(descs[ci]), np.asarray(desc_p[ci]))
        np.testing.assert_array_equal(np.asarray(bg_x[ci]), np.asarray(bg_p[ci]))


@pytest.mark.parametrize("C", [1, 3])
def test_pallas_lobster_consensus_matches_xla(C):
    rng = np.random.default_rng(7 + C)
    H, W, N = 24, 40, 7
    rel, offset = 0.365, 0.0
    div = 2.0 if C == 1 else 1.0
    c_sc = 15 if C == 1 else 45
    d_sc = 4 if C == 1 else 6
    c_tot, d_tot, req = 90, 12, 2
    planes = tuple(
        jnp.asarray(rng.integers(0, 256, (H, W), np.uint8)) for _ in range(C)
    )
    colors0, descs0 = _rand_banks(rng, H, W, C, N)
    # 3×3-only pending log, the LOBSTER shape
    d, ctrl, vals = _rand_pending(rng, H, W, C, N, with_5x5=False)

    def thr_fn(v):
        raw = (v.astype(jnp.float32) * rel + offset) / div
        return jnp.clip(jnp.rint(raw), 0, 255).astype(jnp.int32)

    intra, nb = LF._intra_descriptor(planes, thr_fn)
    colors, descs, bg_x = LF._apply_pending_xla(ctrl, vals, colors0, descs0)

    def body(count, sd):
        s_colors, s_descs = sd
        cd, dd = [], []
        for ci in range(C):
            cd.append(
                jnp.abs(
                    planes[ci].astype(jnp.int16) - s_colors[ci].astype(jnp.int16)
                ).astype(jnp.int32)
            )
            dd.append(LF._inter_dist_1ch(nb[ci], s_colors[ci], s_descs[ci], thr_fn))
        good = jnp.ones((H, W), bool)
        for ci in range(C):
            good &= (cd[ci] <= c_sc) & (dd[ci] <= d_sc)
        if C > 1:
            good &= (sum(cd) <= c_tot) & (sum(dd) <= d_tot)
        return count + (good & (count < req)).astype(jnp.int32), None

    cnt_x, _ = jax.lax.scan(body, jnp.zeros((H, W), jnp.int32), (colors, descs))
    cnt_p, intra_p, bg_p, col_p, desc_p = consensus_lobster_pallas(
        planes, colors0, descs0, ctrl, vals, rel=rel, offset=offset, div=div,
        c_sc=c_sc, d_sc=d_sc, c_tot=c_tot, d_tot=d_tot, req=req, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(cnt_x), np.asarray(cnt_p))
    for ci in range(C):
        np.testing.assert_array_equal(
            np.asarray(intra[ci], np.int32), np.asarray(intra_p[ci])
        )
        np.testing.assert_array_equal(np.asarray(colors[ci]), np.asarray(col_p[ci]))
        np.testing.assert_array_equal(np.asarray(descs[ci]), np.asarray(desc_p[ci]))
        np.testing.assert_array_equal(np.asarray(bg_x[ci]), np.asarray(bg_p[ci]))


def test_fused_step_matches_xla_path():
    """The whole-step fused kernel (consensus + feedback + pending pack,
    TRACKING_TPU_FUSED_INTERP) reproduces the XLA step bit-for-bit: masks
    AND every carried state leaf over several frames, including t=0
    last_color/last_desc adoption, ROI/required derivation in-kernel, and
    the packed flags word."""
    import os

    from tracking_tpu.runner import run_video

    rng = np.random.default_rng(5)
    H, W, C, T = 48, 64, 3, 5
    base = rng.integers(0, 200, (1, H, W, C), np.uint8)
    frames = np.repeat(base, T, axis=0)
    for i in range(T):
        frames[i, 10 + i : 22 + i, 8 + 2 * i : 28 + 2 * i] = 255
    frames = jnp.asarray(frames)

    a_ref = LF.SuBSENSE()
    s0 = a_ref.init(H, W, C)
    s0 = jax.jit(a_ref.warm_start)(s0, frames[0])
    st_ref, m_ref = run_video(a_ref, frames, state=s0)

    os.environ["TRACKING_TPU_FUSED_INTERP"] = "1"
    try:
        a_fused = LF.SuBSENSE()
        st_f, m_f = run_video(a_fused, frames, state=s0)
    finally:
        os.environ.pop("TRACKING_TPU_FUSED_INTERP", None)

    np.testing.assert_array_equal(np.asarray(m_f), np.asarray(m_ref))
    ref_leaves, ref_tree = jax.tree_util.tree_flatten(st_ref)
    f_leaves, f_tree = jax.tree_util.tree_flatten(st_f)
    assert ref_tree == f_tree
    for a, b in zip(ref_leaves, f_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
