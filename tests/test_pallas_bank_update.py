"""Bank-update kernel (in-kernel spread picks) vs the XLA formulation."""

import jax.numpy as jnp
import numpy as np
import pytest

from tracking_tpu.bgs import lbsp_family as LF
from tracking_tpu.ops.pallas_bank_update import (
    NB3_IN_NB5,
    NB5,
    bank_update_pallas,
    nb3_to_nb5_idx,
)


def test_offset_tables_match_lbsp_family():
    assert tuple(map(tuple, LF._NB5)) == NB5
    assert tuple(map(tuple, LF._NB3)) == tuple(NB5[k] for k in NB3_IN_NB5)


@pytest.mark.parametrize("C,with_5x5", [(1, True), (3, True), (3, False)])
def test_bank_update_matches_xla(C, with_5x5):
    rng = np.random.default_rng(11 * C + with_5x5)
    H, W, N = 24, 40, 9
    planes = tuple(
        jnp.asarray(rng.integers(0, 256, (H, W), np.uint8)) for _ in range(C)
    )
    intras = tuple(
        jnp.asarray(rng.integers(0, 65536, (H, W)).astype(np.uint16))
        for _ in range(C)
    )
    colors = tuple(
        jnp.asarray(rng.integers(0, 256, (N, H, W), np.uint8)) for _ in range(C)
    )
    descs = tuple(
        jnp.asarray(rng.integers(0, 65536, (N, H, W)).astype(np.uint16))
        for _ in range(C)
    )
    upd1 = jnp.asarray(rng.random((H, W)) < 0.3)
    slot1 = jnp.asarray(rng.integers(0, N, (H, W)).astype(np.int32))
    fire3 = jnp.asarray(rng.random((H, W)) < 0.4)
    fire5 = jnp.asarray(rng.random((H, W)) < (0.4 if with_5x5 else 0.0))
    o3 = jnp.asarray(rng.integers(0, 8, (H, W)).astype(np.int32))
    o5 = jnp.asarray(rng.integers(0, 24, (H, W)).astype(np.int32))
    slot3 = jnp.asarray(rng.integers(0, N, (H, W)).astype(np.int32))
    slot5 = jnp.asarray(rng.integers(0, N, (H, W)).astype(np.int32))

    # XLA reference — the step's select formulation
    src_arrays = tuple(planes) + tuple(intras)
    p3 = LF._pick_neighbor(o3, LF._NB3, (fire3,) + src_arrays)
    p5 = LF._pick_neighbor(o5, LF._NB5, (fire5,) + src_arrays)
    ok3, ok5 = p3[0], p5[0]
    okn = ok3 | ok5
    slotn = jnp.where(ok3, slot3, slot5)
    nb_col = tuple(jnp.where(ok3, p3[1 + ci], p5[1 + ci]) for ci in range(C))
    nb_desc = tuple(
        jnp.where(ok3, p3[1 + C + ci], p5[1 + C + ci]) for ci in range(C)
    )
    slot_axis = jnp.arange(N)[:, None, None]
    m1 = upd1[None] & (slot1[None] == slot_axis)
    mn = okn[None] & (slotn[None] == slot_axis)
    want_colors = tuple(
        jnp.where(mn, nb_col[ci][None], jnp.where(m1, planes[ci][None], colors[ci]))
        for ci in range(C)
    )
    want_descs = tuple(
        jnp.where(mn, nb_desc[ci][None], jnp.where(m1, intras[ci][None], descs[ci]))
        for ci in range(C)
    )

    fires = fire3.astype(jnp.uint8) | (fire5.astype(jnp.uint8) << 1)
    got_colors, got_descs = bank_update_pallas(
        upd1, slot1, fires, nb3_to_nb5_idx(o3), o5, slot3, slot5,
        planes, intras, colors, descs, interpret=True,
    )
    for ci in range(C):
        np.testing.assert_array_equal(
            np.asarray(want_colors[ci]), np.asarray(got_colors[ci])
        )
        np.testing.assert_array_equal(
            np.asarray(want_descs[ci]), np.asarray(got_descs[ci])
        )
