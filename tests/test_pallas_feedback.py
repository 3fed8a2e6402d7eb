"""Fused feedback kernel vs the whole-array XLA formulation (interpret mode).

Both paths call the same per-pixel ``_core`` on identical inputs, so every
output — including the stochastic update decisions, which derive from the
same pre-generated bit field — must match exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tracking_tpu.ops.pallas_feedback import (
    FeedbackConsts,
    derive_draws,
    feedback_pallas,
    feedback_xla,
)

K = FeedbackConsts(
    t_incr=0.5, t_decr=0.25, t_lower=2.0, v_incr=1.0, v_decr=0.1,
    r_var=0.01, rdist_min=3.0, ratio_min=0.1, ghost_s_min=0.995,
    ghost_d_max=0.004,
)


def _random_inputs(rng, C, H, W):
    f = lambda lo, hi: jnp.asarray(rng.uniform(lo, hi, (H, W)).astype(np.float32))
    i = lambda lo, hi: jnp.asarray(rng.integers(lo, hi, (H, W)).astype(np.int32))
    b = lambda: jnp.asarray(rng.integers(0, 2, (H, W)).astype(np.int32))
    tensors = dict(
        count=i(0, 4), mind=i(0, 16 * C + 1), mins=i(0, 255 * C + 1),
        required=jnp.full((H, W), 2, jnp.int32), roi=b(),
        planes=tuple(i(0, 256) for _ in range(C)),
        intras=tuple(i(0, 65536) for _ in range(C)),
        last_colors=tuple(i(0, 256) for _ in range(C)),
        last_descs=tuple(i(0, 65536) for _ in range(C)),
        bits=tuple(
            jnp.asarray(
                rng.integers(0, 2 ** 32, (H, W), dtype=np.uint64).astype(np.uint32)
            ).view(jnp.int32)
            for _ in range(4)
        ),
        mean_last=f(0, 1), dmin_lt=f(0, 1), dmin_st=f(0, 1),
        raw_lt=f(0, 1), raw_st=f(0, 1), final_lt=f(0, 1), final_st=f(0, 1),
        R=f(1, 4), T=f(2, 256), v=f(0.05, 40),
        last_final=b(), blinks_old=b(), last_blink_mask=b(),
        last_raw=b(), last_dil_inv=b(),
    )
    scalars = (
        jnp.float32(1 / 25.0), jnp.float32(1 / 6.0),
        jnp.float32(2.0), jnp.float32(256.0), jnp.int32(3),
    )
    return tensors, scalars


@pytest.mark.parametrize("C,use3", [(1, True), (3, True), (3, False)])
def test_feedback_pallas_matches_xla(C, use3):
    rng = np.random.default_rng(11 + C + use3)
    H, W = 24, 40
    tensors, scalars = _random_inputs(rng, C, H, W)
    want = feedback_xla(tensors, scalars, C=C, N=50, use3x3_global=use3, k=K)
    got = feedback_pallas(
        tensors, scalars, C=C, N=50, use3x3_global=use3, k=K, interpret=True
    )
    for name, a, b in zip(want._fields, want, got):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype == np.int32:
            # decisions must be bit-identical (they drive bank writes)
            np.testing.assert_array_equal(a, b, err_msg=name)
        else:
            # f32 maps may differ by FMA-fusion rounding (~1 ulp)
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6, err_msg=name)


def test_derive_draws_ranges_and_rates():
    rng = np.random.default_rng(0)
    bits = jnp.asarray(
        rng.integers(0, 2 ** 32, (4, 64, 64), dtype=np.uint64).astype(np.uint32)
    ).view(jnp.int32)
    u_cd, u_self, u_nb, s_cd, s_self, s3, s5, o3, o5 = derive_draws(bits, 50)
    for u in (u_cd, u_self, u_nb):
        assert float(u.min()) >= 0.0 and float(u.max()) < 1.0
        assert abs(float(u.mean()) - 0.5) < 0.02
    for s in (s_cd, s_self, s3, s5):
        assert int(s.min()) >= 0 and int(s.max()) <= 49
    # pattern sizes are 8 / 24 (rand()%8 / %24, RandUtils.h:51,73)
    assert int(o3.max()) <= 7 and int(o5.max()) <= 23 and int(o3.min()) >= 0
    # Bernoulli(1/16) via u*16 < 1
    rate = float((np.asarray(u_self) * 16.0 < 1.0).mean())
    assert abs(rate - 1 / 16) < 0.01
