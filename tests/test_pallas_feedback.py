"""Feedback-stage RNG derivation properties (ops/pallas_feedback).

The standalone feedback Pallas kernel was deleted as a superseded negative
result (PERF.md "Negative results"); the deployed feedback_xla path is
exercised by every SuBSENSE test, and the fused-step kernel that shares its
``_core`` has its own bit-exact parity test (test_pallas_consensus).
"""

import jax.numpy as jnp
import numpy as np

from tracking_tpu.ops.pallas_feedback import derive_draws

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
