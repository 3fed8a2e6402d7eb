"""Batched constant-velocity Kalman filters for blob tracks.

The reference delegates Kalman prediction/smoothing to OpenCV legacy's
``CvBlobTrackPostProcKalman`` / the CC tracker's per-blob filters (selected in
``ustc_src/trackingMain.cpp:653-662``; implementation lives in OpenCV's legacy
module, outside the repo). Capability parity here: a bank of K independent
filters over blob state [x, y, w, h] with constant-velocity dynamics,
vectorized over the fixed-capacity track table — one ``[K, 8]`` state tensor
and batched 8×8 matrix algebra instead of K tiny per-object filters.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

DIM_X = 8  # x, y, w, h, vx, vy, vw, vh
DIM_Z = 4  # x, y, w, h


class KalmanParams(NamedTuple):
    F: jnp.ndarray  # [8, 8] transition
    H: jnp.ndarray  # [4, 8] measurement
    Q: jnp.ndarray  # [8, 8] process noise
    R: jnp.ndarray  # [4, 4] measurement noise
    P0: jnp.ndarray  # [8, 8] initial covariance


def default_params(process_noise: float = 1e-2, measurement_noise: float = 1e-1) -> KalmanParams:
    F = np.eye(DIM_X, dtype=np.float32)
    for i in range(4):
        F[i, i + 4] = 1.0
    H = np.zeros((DIM_Z, DIM_X), dtype=np.float32)
    H[:4, :4] = np.eye(4)
    Q = np.eye(DIM_X, dtype=np.float32) * process_noise
    R = np.eye(DIM_Z, dtype=np.float32) * measurement_noise
    P0 = np.eye(DIM_X, dtype=np.float32)
    return KalmanParams(
        jnp.asarray(F), jnp.asarray(H), jnp.asarray(Q), jnp.asarray(R), jnp.asarray(P0)
    )


def kalman_init(capacity: int, params: KalmanParams) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Return (x [K, 8], P [K, 8, 8]) zero-initialized filter bank."""
    x = jnp.zeros((capacity, DIM_X), jnp.float32)
    P = jnp.broadcast_to(params.P0, (capacity, DIM_X, DIM_X)).copy()
    return x, P


def kalman_reset_slot(x, P, mask, z0, params: KalmanParams):
    """Re-initialize masked slots from a measurement (new track birth)."""
    newx = jnp.concatenate([z0, jnp.zeros_like(z0)], axis=-1)
    x = jnp.where(mask[:, None], newx, x)
    P = jnp.where(mask[:, None, None], params.P0[None], P)
    return x, P


def kalman_predict(x, P, params: KalmanParams):
    """x' = Fx; P' = FPFᵀ + Q, batched over the leading track axis."""
    xp = jnp.einsum("ij,kj->ki", params.F, x)
    Pp = jnp.einsum("ij,kjl,ml->kim", params.F, P, params.F) + params.Q[None]
    return xp, Pp


def kalman_update(x, P, z, gate_mask, params: KalmanParams):
    """Measurement update for slots where gate_mask; others pass through.

    z: [K, 4] measurements; gate_mask: [K] bool.
    """
    H, R = params.H, params.R
    y = z - jnp.einsum("ij,kj->ki", H, x)  # innovation
    S = jnp.einsum("ij,kjl,ml->kim", H, P, H) + R[None]
    S_inv = jnp.linalg.inv(S)
    K = jnp.einsum("kij,mj,kmn->kin", P, H, S_inv)  # P Hᵀ S⁻¹
    x_new = x + jnp.einsum("kij,kj->ki", K, y)
    KH = jnp.einsum("kij,jm->kim", K, H)
    P_new = jnp.einsum("kij,kjm->kim", jnp.eye(DIM_X)[None] - KH, P)
    x = jnp.where(gate_mask[:, None], x_new, x)
    P = jnp.where(gate_mask[:, None, None], P_new, P)
    return x, P
