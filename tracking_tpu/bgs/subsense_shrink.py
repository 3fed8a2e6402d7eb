"""subsenseShrink — the USTC SuBSENSE + Lab shrink-box overlay (SURVEY §2.9).

Reference: ``ustc_src/bgs_subsense_optical_flow/qt_cmake_bgs_sof/
subsenseshrink.{h,cpp}`` — a SuBSENSE subclass whose ``operator()`` first
computes a "shrink box" foreground mask (``getRandShrinkFGMask`` → one
``Yzbx::getSingleShrinkFGMask``, randMaskNum=1) and then raises the
sample-consensus requirement by 5 at pixels where that mask's byte reads
positive as a *signed char* (``FG.at<char>(y,x) > 0``,
``subsenseshrink.cpp:242-248``) — so 255-valued raw-FG pixels do NOT get the
offset, only the gray-difference values 1..127 painted into unstable regions
(a faithful signedness quirk). The directory name mentions optical flow but
contains none (SURVEY §2.9 note).

Yzbx box model (``subsenseshrink.cpp:507-668``), in CIELab (the cvtColor is
fed BGR as if RGB — faithful channel swap; bounds ±10 on L, ±5 on a/b at
init, ``:528-545``):
- raw FG where any channel leaves [BoxDown, BoxUp];
- FG = close₃(dilate₃(median₉(erode₃(rawFG))));
- unstable area = median₉(any-channel box gap > 30);
- when the tracked noise rate < 0.2, unstable wide boxes (gap > 10) shrink
  by 1 with prob 5/20 per channel per frame;
- boxes grow to envelop the input wherever far from the last SuBSENSE FG
  (dilated; the reference uses a 30×30 ellipse — approximated here by a
  29×29 square max-window), plus a 1/20-probability ±learnStep(3) margin
  grow;
- noise rate = (Σ rawFG∧unstable − Σ FG∧unstable)/(Σ unstable − Σ FG∧unstable);
- output byte = rawFG (255) overwritten with gray(RGB→gray of the saturated
  box-exceedance) inside FG∧unstable.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tracking_tpu.bgs.lbsp_family import SuBSENSE, SuBSENSEConfig
from tracking_tpu.core.registry import register
from tracking_tpu.ops.filters import binary_median_blur, median_blur
from tracking_tpu.ops.morphology import dilate, erode, morph_close

_CROSS = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], bool)  # MORPH_ELLIPSE 3×3


def _rgb2lab_u8(img: jnp.ndarray) -> jnp.ndarray:
    """OpenCV CV_RGB2Lab on u8 with channel 0 taken as R (the reference feeds
    BGR through an RGB conversion — faithful).

    The 8U path applies sRGB inverse companding before XYZ (round 5; same
    finding as LbpMrf's Luv front end — cv2's 8U Lab LUT bakes gamma in;
    without it L was off by up to 78 levels, mean 56). The overlay's box
    bounds are relative so the mask effect is small (golden gate already
    0.9995) but the model Lab values are now within ±1 of the oracle's."""
    r = img[..., 0].astype(jnp.float32) / 255.0
    g = img[..., 1].astype(jnp.float32) / 255.0
    b = img[..., 2].astype(jnp.float32) / 255.0
    gam = lambda c: jnp.where(
        c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4
    )
    r, g, b = gam(r), gam(g), gam(b)
    x = (0.412453 * r + 0.357580 * g + 0.180423 * b) / 0.950456
    y = 0.212671 * r + 0.715160 * g + 0.072169 * b
    z = (0.019334 * r + 0.119193 * g + 0.950227 * b) / 1.088754
    thr = 0.008856

    def f(t):
        return jnp.where(t > thr, jnp.cbrt(t), 7.787 * t + 16.0 / 116.0)

    fx, fy, fz = f(x), f(y), f(z)
    l = jnp.where(y > thr, 116.0 * jnp.cbrt(y) - 16.0, 903.3 * y)
    a = 500.0 * (fx - fy) + 128.0
    bb = 200.0 * (fy - fz) + 128.0
    return jnp.stack(
        [
            jnp.clip(jnp.rint(l * 255.0 / 100.0), 0, 255),
            jnp.clip(jnp.rint(a), 0, 255),
            jnp.clip(jnp.rint(bb), 0, 255),
        ],
        -1,
    ).astype(jnp.uint8)


@dataclasses.dataclass(frozen=True)
class SuBSENSEShrinkConfig(SuBSENSEConfig):
    learnStep: int = 3  # subsenseshrink.h:63


@register("subsenseShrink", aliases=("subsense-shrink", "yzbx"))
class SuBSENSEShrink(SuBSENSE):
    Config = SuBSENSEShrinkConfig

    def init(self, h: int, w: int, c: int = 3) -> dict:
        st = super().init(h, w, c)
        st["box_up"] = jnp.zeros((h, w, 3), jnp.uint8)
        st["box_down"] = jnp.zeros((h, w, 3), jnp.uint8)
        st["yzbx_noise_rate"] = jnp.asarray(0.2, jnp.float32)
        st["yzbx_t"] = jnp.zeros((), jnp.int32)
        st["yzbx_key"] = jax.random.PRNGKey(11)
        return st

    def _yzbx(self, state, frame):
        cfg = self.config
        f3 = frame if frame.ndim == 3 else jnp.repeat(frame[..., None], 3, -1)
        h, w = f3.shape[:2]
        lab = _rgb2lab_u8(f3).astype(jnp.int32)
        t = state["yzbx_t"]
        keys = jax.random.split(state["yzbx_key"], 8)

        init_margin = jnp.asarray([10, 5, 5], jnp.int32)
        up0 = jnp.clip(lab + init_margin, 0, 255)
        down0 = jnp.clip(lab - init_margin, 0, 255)

        up = jnp.where(t == 0, up0, state["box_up"].astype(jnp.int32))
        down = jnp.where(t == 0, down0, state["box_down"].astype(jnp.int32))

        gap = jnp.maximum(up - down, 0) // 2
        bg = jnp.all((lab <= up) & (lab >= down), axis=-1)
        raw = jnp.where(bg, jnp.uint8(0), jnp.uint8(255))
        # saturated box-exceedance → gray (subsenseshrink.cpp:577-584)
        dif = jnp.maximum(lab - up, 0) + jnp.maximum(down - lab, 0)
        dif = jnp.clip(dif, 0, 255).astype(jnp.float32)
        graydif = jnp.clip(
            jnp.rint(0.299 * dif[..., 0] + 0.587 * dif[..., 1] + 0.114 * dif[..., 2]),
            0, 255,
        ).astype(jnp.uint8)

        fg = erode(raw, se=_CROSS)
        fg = binary_median_blur(fg, 9)
        fg = dilate(fg, se=_CROSS)
        fg = morph_close(fg, se=_CROSS)
        fg_b = fg > 0

        unstable_raw = jnp.where(
            jnp.any(gap > 30, axis=-1), jnp.uint8(255), jnp.uint8(0)
        )
        unstable = binary_median_blur(unstable_raw, 9) > 0

        # shrink wide unstable boxes when the noise rate is low (:613-620)
        shrinkable = unstable[..., None] & (gap > 10)
        r = jax.random.randint(keys[1], (h, w, 3), 0, 20)
        do_shrink = (state["yzbx_noise_rate"] < 0.2) & shrinkable & (r < 5)
        up = jnp.where(do_shrink, up - 1, up)
        down = jnp.where(do_shrink, down + 1, down)

        # grow boxes far from the last SuBSENSE FG (:632-655);
        # 30×30 ellipse dilation ≈ 29×29 square max-window
        last_fg = (state["last_final"] > 0).astype(jnp.int32)
        pad = jnp.pad(last_fg, 14)
        far = (
            jax.lax.reduce_window(pad, 0, jax.lax.max, (29, 29), (1, 1), "VALID") == 0
        )[..., None]
        up = jnp.where(far, jnp.maximum(up, lab), up)
        down = jnp.where(far, jnp.minimum(down, lab), down)
        r2 = jax.random.randint(keys[2], (h, w, 3), 0, 20)
        up = jnp.where(far & (r2 < 1), jnp.maximum(up, lab - cfg.learnStep), up)
        r3 = jax.random.randint(keys[3], (h, w, 3), 0, 20)
        down = jnp.where(far & (r3 < 1), jnp.minimum(down, lab + cfg.learnStep), down)

        raw_un = jnp.sum((raw > 0) & unstable)
        fg_un = jnp.sum(fg_b & unstable)
        un = jnp.sum(unstable)
        denom = (un - fg_un).astype(jnp.float32)
        noise_rate = jnp.where(
            denom > 0, (raw_un - fg_un).astype(jnp.float32) / denom,
            state["yzbx_noise_rate"],
        )

        out = jnp.where(fg_b & unstable, graydif, raw)
        out = jnp.where(t == 0, jnp.zeros_like(out), out)
        box_state = {
            "box_up": jnp.clip(up, 0, 255).astype(jnp.uint8),
            "box_down": jnp.clip(down, 0, 255).astype(jnp.uint8),
            "yzbx_noise_rate": jnp.where(t == 0, jnp.asarray(0.2, jnp.float32), noise_rate),
            "yzbx_t": t + 1,
            "yzbx_key": keys[0],
        }
        return out, box_state

    def step(self, state, frame):
        shrink_fg, box_state = self._yzbx(state, frame)
        # signed-char read: only bytes 1..127 count as positive (:243-246)
        positive = (shrink_fg >= 1) & (shrink_fg <= 127)
        offset = jnp.where(
            positive & (state["yzbx_t"] > 5), jnp.int32(5), jnp.int32(0)
        )
        st = dict(state)
        st["shrink_req_offset"] = offset
        new_state, fg, bg = super().step(st, frame)
        new_state.update(box_state)
        return new_state, fg, bg
