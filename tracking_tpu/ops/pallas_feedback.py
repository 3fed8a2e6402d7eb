"""SuBSENSE feedback / update-decision stage (shared per-pixel math).

Covers everything between the sample consensus and the morphology post-proc
of ``pl/BackgroundSubtractorSuBSENSE.cpp:327-431`` — the unstable-region
mask, rolling means, ghost detection, the stochastic model-update decisions,
the R/T/v feedback controllers, blink bookkeeping and the
nonzero-descriptor map. The stage is purely elementwise, so XLA fuses it
into the surrounding consensus inputs/outputs for free: a standalone Pallas
kernel version measured 0.81 ms in isolation and ~1 ms WORSE end-to-end
(the pallas_call boundary forced 59 full-map HBM materializations) and was
deleted after two rounds as a parity-tested artifact — the negative result
lives in PERF.md ("Negative results"). :func:`_core` is also the feedback
epilogue of the opt-in fused whole-step kernel
(``pallas_consensus.consensus_feedback_pallas``).

Randomness: the reference draws ``rand() % rate`` per pixel. Here ONE
``jax.random.bits`` call produces 4 u32 words per pixel and
:func:`derive_draws` slices them into 2 uniform floats (23-bit,
f32-mantissa exact) and 2 slot + 2 offset integers (16-bit fixed-point
scaling ``(field*K)>>16``, exact in i32, bias ≤ 2^-16) — so the CPU/XLA
fallback and the TPU kernel consume *bit-identical* draw streams and make
*bit-identical* decisions. Mutually-exclusive decisions share draws
(cooldown-vs-self update, 3×3-vs-5×5 spread target/slot): per-decision
marginals are unchanged and a pixel takes exactly one branch.

The per-pixel math lives in :func:`_core`, plain jnp on values;
:func:`feedback_xla` and the fused-step kernel both call it, so the paths
cannot drift.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class FeedbackConsts(NamedTuple):
    """Compile-time constants (values in bgs/lbsp_family.py; reference
    ``BackgroundSubtractorSuBSENSE.cpp:19-32``)."""

    t_incr: float
    t_decr: float
    t_lower: float  # FEEDBACK_T_LOWER (also the cooldown resample rate)
    v_incr: float
    v_decr: float
    r_var: float
    rdist_min: float  # UNSTABLE_REG_RDIST_MIN
    ratio_min: float  # UNSTABLE_REG_RATIO_MIN
    ghost_s_min: float  # GHOSTDET_S_MIN
    ghost_d_max: float  # GHOSTDET_D_MAX


class FeedbackOut(NamedTuple):
    # masks / ints (i32)
    is_fg: jnp.ndarray
    unstable: jnp.ndarray
    nz: jnp.ndarray
    curr_blink: jnp.ndarray
    blinks_pre: jnp.ndarray  # (curr|last_blink_mask) & last_dil_inv (:624,:637)
    upd1: jnp.ndarray
    slot1: jnp.ndarray
    fire3: jnp.ndarray
    fire5: jnp.ndarray
    o3: jnp.ndarray
    o5: jnp.ndarray
    slot3: jnp.ndarray
    slot5: jnp.ndarray
    # f32 maps
    mean_last: jnp.ndarray
    dmin_lt: jnp.ndarray
    dmin_st: jnp.ndarray
    raw_lt: jnp.ndarray
    raw_st: jnp.ndarray
    T: jnp.ndarray
    v: jnp.ndarray
    R: jnp.ndarray


def _popcount16_i32(x):
    x = x & 0xFFFF
    x = x - ((x >> 1) & 0x5555)
    x = (x & 0x3333) + ((x >> 2) & 0x3333)
    x = (x + (x >> 4)) & 0x0F0F
    return (x + (x >> 8)) & 0x1F


def _field(b, lo, nbits):
    """Bits [lo, lo+nbits) of an i32 word (mask kills arithmetic sign-fill)."""
    return (b >> lo) & ((1 << nbits) - 1)


def derive_draws(bits, n_samples):
    """[4, ...] i32 random words → the step's 9 per-pixel draws:
    (u_cd, u_self, u_nb, slot_cd, slot_self, slot3, slot5, o3, o5).
    Mutually-exclusive decisions share a field: u_cd/u_self (a pixel is FG
    xor BG), slot_cd/slot_self (same write), slot3/slot5 (one spread
    target), so 4 words cover all 9 draws with ≥16-bit granularity."""
    u1 = _field(bits[0], 9, 23).astype(jnp.float32) * (2.0 ** -23)
    u_nb = _field(bits[1], 9, 23).astype(jnp.float32) * (2.0 ** -23)
    slot1 = (_field(bits[2], 0, 16) * n_samples) >> 16
    slotn = (_field(bits[2], 16, 16) * n_samples) >> 16
    # pattern sizes are 8 / 24 (rand()%8 / %24, RandUtils.h:51,73) — NOT the
    # 9/25 window sizes (that off-by-one double-weighted offset 0)
    o3 = (_field(bits[3], 0, 16) * 8) >> 16
    o5 = (_field(bits[3], 16, 16) * 24) >> 16
    return u1, u1, u_nb, slot1, slot1, slotn, slotn, o3, o5


def _core(
    count, mind, mins, required, roi,
    planes, intras, last_colors, last_descs, bits,
    mean_last, dmin_lt, dmin_st, raw_lt, raw_st, final_lt, final_st,
    R, T, v, last_final, blinks_old, last_blink_mask, last_raw, last_dil_inv,
    a_lt, a_st, lr_lower, lr_upper, cooldown,
    *, C, N, use3x3_global, k: FeedbackConsts, as_i32: bool = True,
) -> FeedbackOut:
    """Per-pixel feedback math on plain values (a VMEM tile or a full
    array). Integer tensors i32 (masks 0/1), float tensors f32. Scalars:
    a_lt/a_st/lr_lower/lr_upper f32, cooldown i32. Shapes all [h, w]."""
    max_color, max_desc = 255 * C, 16 * C

    roi_b = roi != 0
    is_fg = (count < required) & roi_b
    is_bg = jnp.logical_not(is_fg) & roi_b

    # unstable-region mask from the PRE-update means (:327-331 runs first)
    unstable = (
        (R > k.rdist_min)
        | ((raw_lt - final_lt) > k.ratio_min)
        | ((raw_st - final_st) > k.ratio_min)
    )

    # rolling means (:358-380)
    color_ld = sum(jnp.abs(last_colors[ci] - planes[ci]) for ci in range(C))
    desc_ld = sum(_popcount16_i32(last_descs[ci] ^ intras[ci]) for ci in range(C))
    nld = (
        color_ld.astype(jnp.float32) / max_color
        + desc_ld.astype(jnp.float32) / max_desc
    ) / 2.0
    mean_last = mean_last * (1 - a_st) + nld * a_st

    nmd_base = (
        mins.astype(jnp.float32) / max_color + mind.astype(jnp.float32) / max_desc
    ) / 2.0
    nmd_fg = jnp.minimum(
        1.0,
        nmd_base
        + (required - count).astype(jnp.float32) / required.astype(jnp.float32),
    )
    nmd = jnp.where(is_fg, nmd_fg, nmd_base)
    dmin_lt = dmin_lt * (1 - a_lt) + nmd * a_lt
    dmin_st = dmin_st * (1 - a_st) + nmd * a_st
    fg_f = is_fg.astype(jnp.float32)
    raw_lt = raw_lt * (1 - a_lt) + fg_f * a_lt
    raw_st = raw_st * (1 - a_st) + fg_f * a_st

    # stochastic update decisions (:360-405); Bernoulli(1/rate) as u·rate<1
    (u_cd, u_self, u_nb, slot_cd, slot_self, slot3, slot5, o3, o5) = (
        derive_draws(bits, N)
    )
    lr_f = jnp.maximum(jnp.ceil(T), 1.0)  # pre-feedback T(x)
    upd_cd = is_fg & (cooldown > 0) & (u_cd * k.t_lower < 1.0)
    upd_self = is_bg & (u_self * lr_f < 1.0)
    upd1 = upd_cd | upd_self
    slot1 = jnp.where(upd_cd, slot_cd, slot_self)

    use3_src = use3x3_global & jnp.logical_not(unstable)
    ghost = (raw_st > k.ghost_s_min) & (mean_last < k.ghost_d_max)
    rate5_f = jnp.floor(lr_f / 2.0) + 1.0
    lower_f = jnp.maximum(lr_lower, 1.0)
    fire_lo = ghost & (u_nb * lower_f < 1.0)
    fire3 = is_bg & use3_src & ((u_nb * lr_f < 1.0) | fire_lo)
    fire5 = is_bg & jnp.logical_not(use3_src) & ((u_nb * rate5_f < 1.0) | fire_lo)

    # feedback controllers (:406-429)
    dmin_max = jnp.maximum(dmin_lt, dmin_st)
    dmin_min = jnp.minimum(dmin_lt, dmin_st)
    last_final_fg = last_final != 0
    t_up = last_final_fg | ((dmin_min < k.ratio_min) & is_fg)
    T_inc = T + k.t_incr / (dmin_max * v)
    T_dec = T - k.t_decr * v / dmin_max
    T = jnp.where(
        t_up,
        jnp.where(T < lr_upper, T_inc, T),
        jnp.where(T > lr_lower, T_dec, T),
    )
    T = jnp.clip(T, lr_lower, lr_upper)

    v_up = (dmin_max > k.ratio_min) & (blinks_old != 0)
    v_dec_amt = jnp.where(
        last_final_fg, k.v_decr / 4, jnp.where(unstable, k.v_decr / 2, k.v_decr)
    )
    v_decd = jnp.maximum(v - v_dec_amt, k.v_decr)
    v = jnp.where(v_up, v + k.v_incr, jnp.where(v > k.v_decr, v_decd, v))

    r_limit = jnp.square(1.0 + dmin_min * 2.0)
    R = jnp.where(
        R < r_limit,
        R + k.r_var * (v - k.v_decr),
        jnp.maximum(R - k.r_var / v, 1.0),
    )

    # nonzero-descriptor map (:430-431); ratio reduced by the caller
    nz_thresh = 2 if C == 1 else 4
    nz = sum(_popcount16_i32(intras[ci]) for ci in range(C)) >= nz_thresh

    # blink bookkeeping (:624-637, the parts not needing this frame's final)
    curr_blink = is_fg != (last_raw != 0)
    blinks_pre = (curr_blink | (last_blink_mask != 0)) & (last_dil_inv != 0)

    if as_i32:
        i32 = lambda m: m.astype(jnp.int32)  # noqa: E731  (Pallas outputs)
    else:
        i32 = lambda m: m  # noqa: E731  (XLA path: keep masks as bools)
    return FeedbackOut(
        is_fg=i32(is_fg), unstable=i32(unstable), nz=i32(nz),
        curr_blink=i32(curr_blink), blinks_pre=i32(blinks_pre),
        upd1=i32(upd1), slot1=slot1, fire3=i32(fire3), fire5=i32(fire5),
        o3=o3, o5=o5, slot3=slot3, slot5=slot5,
        mean_last=mean_last, dmin_lt=dmin_lt, dmin_st=dmin_st,
        raw_lt=raw_lt, raw_st=raw_st, T=T, v=v, R=R,
    )


def feedback_xla(tensors, scalars, *, C, N, use3x3_global, k) -> FeedbackOut:
    """The deployed formulation on every backend: whole-array elementwise
    maps that XLA fuses with the consensus kernel's inputs/outputs.
    ``scalars``: (a_lt, a_st, lr_lower, lr_upper, cooldown)."""
    a_lt, a_st, lr_lower, lr_upper, cooldown = scalars
    tensors = {
        kk: (
            tuple(x.astype(jnp.int32) for x in vv)
            if isinstance(vv, tuple)
            else (vv if vv.dtype == jnp.float32 else vv.astype(jnp.int32))
        )
        for kk, vv in tensors.items()
    }
    return _core(
        **tensors, a_lt=a_lt, a_st=a_st, lr_lower=lr_lower,
        lr_upper=lr_upper, cooldown=cooldown,
        C=C, N=N, use3x3_global=use3x3_global, k=k, as_i32=False,
    )
