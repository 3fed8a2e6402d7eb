"""MRF label relaxation with time constraints (tb/MRF.cpp, ``MRF_TC``).

The reference minimizes, per pixel and label L ∈ {0 bg, 1 fg}:

    E(L) = local_evidence(L) + Doubleton2(L) + TimeEnergy2(L)

- ``Doubleton2`` (``MRF.cpp:131-186``): ±beta (2.8) per 8-neighbor agreeing /
  disagreeing with L in the *current* labeling.
- ``TimeEnergy2`` (``MRF.cpp:65-128``): ±beta_time (0.9) per 8-neighbor *and
  the center* of the previous frame's labeling vs L·255.
- ``local_evidence`` (``MRF.cpp:213-269``): squared Mahalanobis of the
  gray background pixel vs the dominant GMM mode's gray mean; the FG
  hypothesis shifts the mean by 2.5σ toward the pixel.

``ICM2`` (``MRF.cpp:307-338``) runs two raster-order Gauss–Seidel sweeps.
TPU reformulation: red/black checkerboard sweeps — each half-sweep updates
disjoint pixels from the latest values of the other color, which is the
parallel scheduling of Gauss–Seidel; two full sweeps = four half-sweeps.

(Reference bugs, not reproduced: ``InitEvidence2`` clobbers its outer loop
variable so only row 0 of ``classes``/``old_labeling`` is refreshed each
frame (``MRF.cpp:224-244``), and the T2FMRF wrappers discard the smoothed
mask entirely (``T2FMRF_UM.cpp:86-99``). This op implements the intended
semantics.)
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

BETA = 2.8  # MRF.cpp:28
BETA_TIME = 0.9  # MRF.cpp:55


def _neighbor_sum8(x: jnp.ndarray) -> jnp.ndarray:
    """Sum of the 8 neighbors with zero padding outside (border pixels simply
    have fewer neighbors, matching the reference's boundary `if`s)."""
    p = jnp.pad(x, 1)
    out = jnp.zeros_like(x)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            out = out + lax.dynamic_slice(p, (1 + dy, 1 + dx), x.shape)
    return out


def _neighbor_count8(shape) -> jnp.ndarray:
    ones = jnp.ones(shape, jnp.float32)
    return _neighbor_sum8(ones)


def icm_relax(
    mask_u8: jnp.ndarray,
    gray: jnp.ndarray,
    mu0_gray: jnp.ndarray,
    var0: jnp.ndarray,
    old_labeling_u8: jnp.ndarray,
    *,
    sweeps: int = 2,
    enabled=True,
) -> jnp.ndarray:
    """ICM relaxation of a 0/255 mask. Returns the smoothed 0/255 mask.

    gray/mu0_gray/var0: per-pixel gray value, dominant-mode gray mean and
    variance (``InitEvidence2``, ``MRF.cpp:246-268``).
    """
    var0 = jnp.where(var0 == 0, 1.0, var0)
    d_bg = gray - mu0_gray
    ev0 = d_bg * d_bg / (2.0 * var0)
    shift = 2.5 * jnp.sqrt(var0)
    d_fg = jnp.where(gray >= mu0_gray, d_bg - shift, d_bg + shift)
    ev1 = d_fg * d_fg / (2.0 * var0)

    # Time energy is constant across sweeps: agree(L)·(−βt) + disagree·(+βt),
    # over 8 neighbors + center of the previous labeling.
    old1 = (old_labeling_u8 > 0).astype(jnp.float32)
    n_old1 = _neighbor_sum8(old1) + old1
    n_tot = _neighbor_count8(gray.shape) + 1.0
    time0 = BETA_TIME * (2.0 * n_old1 - n_tot)  # E_time(label=0)
    time1 = BETA_TIME * (n_tot - 2.0 * n_old1)  # E_time(label=1)

    cls = (mask_u8 > 0).astype(jnp.float32)
    yy, xx = jnp.meshgrid(
        jnp.arange(mask_u8.shape[0]), jnp.arange(mask_u8.shape[1]), indexing="ij"
    )
    red = ((yy + xx) % 2 == 0).astype(jnp.float32)
    cnt = _neighbor_count8(gray.shape)

    def half_sweep(cls, color):
        n1 = _neighbor_sum8(cls)
        # Doubleton: label-1 energy = β·(disagree − agree) = β·(cnt − 2·n1)
        d1 = BETA * (cnt - 2.0 * n1)
        d0 = -d1
        e0 = ev0 + d0 + time0
        e1 = ev1 + d1 + time1
        new = jnp.where(e0 < e1, 0.0, 1.0)
        return jnp.where(color == 1.0, new, cls)

    for _ in range(sweeps):
        cls = half_sweep(cls, red)
        cls = half_sweep(cls, 1.0 - red)

    out = (cls * 255.0).astype(jnp.uint8)
    return jnp.where(enabled, out, mask_u8)
