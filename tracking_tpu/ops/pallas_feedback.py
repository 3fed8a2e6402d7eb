"""Pallas TPU kernel: fused SuBSENSE feedback / update-decision stage.

Covers everything between the sample consensus and the morphology post-proc
of ``pl/BackgroundSubtractorSuBSENSE.cpp:327-431`` — the unstable-region
mask, rolling means, ghost detection, the stochastic model-update decisions,
the R/T/v feedback controllers, blink bookkeeping and the
nonzero-descriptor map. In the XLA formulation this stage is ~25 separate
[H, W] map passes plus 9 independent ``jax.random`` field generations;
fused, every map crosses HBM exactly once per direction.

Randomness: the reference draws ``rand() % rate`` per pixel. Here ONE
``jax.random.bits`` call produces 4 u32 words per pixel and
:func:`derive_draws` slices them into 2 uniform floats (23-bit,
f32-mantissa exact) and 2 slot + 2 offset integers (16-bit fixed-point
scaling ``(field*K)>>16``, exact in i32, bias ≤ 2^-16) — so the CPU/XLA
fallback and the TPU kernel consume *bit-identical* draw streams and make
*bit-identical* decisions. Mutually-exclusive decisions share draws
(cooldown-vs-self update, 3×3-vs-5×5 spread target/slot): per-decision
marginals are unchanged and a pixel takes exactly one branch.

The per-pixel math lives in :func:`_core`, plain jnp on values; the Pallas
kernel and :func:`feedback_xla` both call it, so the two paths cannot
drift (validated exactly by the interpret-mode parity test).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BH, BW = 16, 256


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


N_INT_OUT = 13
N_F32_OUT = 8


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


def _tensor_args(
    count, mind, mins, required, roi, planes, intras, last_colors,
    last_descs, bits, mean_last, dmin_lt, dmin_st, raw_lt, raw_st,
    final_lt, final_st, R, T, v, last_final, blinks_old, last_blink_mask,
    last_raw, last_dil_inv,
):
    """Flatten to (int_tensors, f32_tensors) in a fixed order."""
    ints = (
        [count, mind, mins, required, roi]
        + list(planes) + list(intras) + list(last_colors) + list(last_descs)
        + [bits[i] for i in range(4)]
        + [last_final, blinks_old, last_blink_mask, last_raw, last_dil_inv]
    )
    f32s = [mean_last, dmin_lt, dmin_st, raw_lt, raw_st, final_lt, final_st, R, T, v]
    return ints, f32s


def _unflatten(C, ints, f32s):
    i = iter(ints)

    def take(n):
        return tuple(next(i) for _ in range(n))

    count, mind, mins, required, roi = take(5)
    planes, intras, last_colors, last_descs = (take(C) for _ in range(4))
    bits = take(4)
    last_final, blinks_old, last_blink_mask, last_raw, last_dil_inv = take(5)
    (mean_last, dmin_lt, dmin_st, raw_lt, raw_st, final_lt, final_st,
     R, T, v) = f32s
    return dict(
        count=count, mind=mind, mins=mins, required=required, roi=roi,
        planes=planes, intras=intras, last_colors=last_colors,
        last_descs=last_descs, bits=bits, mean_last=mean_last,
        dmin_lt=dmin_lt, dmin_st=dmin_st, raw_lt=raw_lt, raw_st=raw_st,
        final_lt=final_lt, final_st=final_st, R=R, T=T, v=v,
        last_final=last_final, blinks_old=blinks_old,
        last_blink_mask=last_blink_mask, last_raw=last_raw,
        last_dil_inv=last_dil_inv,
    )


def feedback_xla(tensors, scalars, *, C, N, use3x3_global, k) -> FeedbackOut:
    """XLA fallback: the same math, whole-array (CPU path + parity oracle).
    ``tensors``: dict as produced by the caller (see ``_unflatten`` keys),
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


def _make_kernel(C, N, use3x3_global, k):
    n_int_in = 5 + 4 * C + 4 + 5
    n_f32_in = 10

    def kernel(*refs):
        fscal = refs[0]  # SMEM [1,4]: a_lt, a_st, lr_lower, lr_upper
        iscal = refs[1]  # SMEM [1,1]: cooldown
        # inputs arrive in native dtype (u8 planes/masks, u16 descs, i32
        # counts); widen per-tile in VMEM — casting whole maps outside the
        # kernel would burn HBM bandwidth
        ints = [r[...].astype(jnp.int32) for r in refs[2 : 2 + n_int_in]]
        f32s = [r[...] for r in refs[2 + n_int_in : 2 + n_int_in + n_f32_in]]
        outs = refs[2 + n_int_in + n_f32_in :]
        t = _unflatten(C, ints, f32s)
        res = _core(
            **t,
            a_lt=fscal[0, 0], a_st=fscal[0, 1],
            lr_lower=fscal[0, 2], lr_upper=fscal[0, 3],
            cooldown=iscal[0, 0],
            C=C, N=N, use3x3_global=use3x3_global, k=k,
        )
        for ref, val in zip(outs, res):
            ref[...] = val

    return kernel


@partial(jax.jit, static_argnames=("C", "N", "use3x3_global", "k", "interpret"))
def feedback_pallas(
    tensors, scalars, *, C, N, use3x3_global, k, interpret=False
) -> FeedbackOut:
    """Fused feedback stage. Same contract as :func:`feedback_xla`."""
    a_lt, a_st, lr_lower, lr_upper, cooldown = scalars
    ints, f32s = _tensor_args(**tensors)
    H, W = ints[0].shape
    ph, pw = (-H) % BH, (-W) % BW

    def pad(a, dt=None):
        a = a if dt is None or a.dtype == dt else a.astype(dt)
        if ph == 0 and pw == 0:
            return a
        return jnp.pad(a, ((0, ph), (0, pw)))

    # bool→u8 only (1-byte copies); numeric tensors pass in native dtype
    # and widen per-tile inside the kernel
    args = (
        jnp.stack(
            [jnp.float32(a_lt), jnp.float32(a_st),
             jnp.float32(lr_lower), jnp.float32(lr_upper)]
        ).reshape(1, 4),
        jnp.asarray(cooldown, jnp.int32).reshape(1, 1),
        *[pad(a, jnp.uint8 if a.dtype == jnp.bool_ else None) for a in ints],
        *[pad(a, jnp.float32) for a in f32s],
    )
    Hp, Wp = H + ph, W + pw
    grid = (Hp // BH, Wp // BW)
    spec2 = pl.BlockSpec((BH, BW), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    fscal_spec = pl.BlockSpec((1, 4), lambda i, j: (0, 0), memory_space=pltpu.SMEM)
    iscal_spec = pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)
    n_in = len(ints) + len(f32s)
    out_shape = (
        [jax.ShapeDtypeStruct((Hp, Wp), jnp.int32)] * N_INT_OUT
        + [jax.ShapeDtypeStruct((Hp, Wp), jnp.float32)] * N_F32_OUT
    )
    res = pl.pallas_call(
        _make_kernel(C, N, use3x3_global, k),
        grid=grid,
        in_specs=[fscal_spec, iscal_spec] + [spec2] * n_in,
        out_specs=[spec2] * (N_INT_OUT + N_F32_OUT),
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    return FeedbackOut(*(a[:H, :W] for a in res))
