"""KDE — ustc type 32 (Elgammal non-parametric kernel-density BGS, ae/).

Reference: wrapper ``package_bgs/ae/KDE.cpp`` (defaults SequenceLength=50,
TimeWindowSize=100, SDEstimationFlag=1, lUseColorRatiosFlag=1, th=1e-7,
alpha=0.3, framesToLearn=10) over ``NPBGSubtractor.cpp``/``NPBGmodel.cpp``/
``KernelTable.cpp``.

Phases:
1. frames 0..framesToLearn−1: store the (color-ratio converted) frame into a
   zero-initialized 50-deep sample ring (only 10 slots get real data —
   faithful; the remaining zeros contribute near-zero kernel mass).
2. at frame == framesToLearn: **Estimation** — per-pixel-channel histogram of
   |consecutive-sample diffs| (20 bins, overflow clamps to bin 19,
   ``BuildAbsDiffHist`` ``NPBGSubtractor.cpp:152-191``), median via cumsum,
   ``σ = max(1.04·(bin − (x2−median)/(x2−x1)), 0.5)`` quantized to 80 kernel
   bins over [0.5, 36.5] (``EstimateSDsFromAbsDiffHist`` ``:193-241``).
3. afterwards, per frame: KDE probability — color-ratio *subset* path
   (``NPBGSubtraction_Subset_Kernel`` ``:940-1010``): per sample, a
   brightness gate on channel 0 (±3 when s<β/α, else ×(1±α) — the β_u=100
   branch is unreachable for u8 with α=0.3), and when it passes the product
   of the two chromaticity-channel Gaussian kernels; p > th ⇒ background.
   The reference's ``sum < th·S`` early-exit with ``p = sum/j`` makes the
   *same decision* as the full sum with ``p = sum/S`` (exit ⇒ sum ≥ th·S ⇒
   sum/j ≥ th; no exit ⇒ sum/S < th), so we compute the full sum — exact
   mask parity, scan-free.
4. model update (``SequenceBGUpdate_Pairs`` ``:660-851``): every 2nd update
   tick (rate = max(TimeWindow/SampleSize, 2)) once the 2-frame temporal
   buffer has filled, each pixel whose two buffered masks are both BG gets
   the buffered frame pair written over the ring slots [qtop, qtop+1] (and
   the abs-diff histogram incrementally patched with wrapping u8 counters —
   faithful); a stuck-FG counter force-clears masks after 500 frames
   (ResetMaskTh, ``NPBGmodel.cpp:116``). SD re-estimation never reruns
   (UpdateSDRate=0, ``:838``).

Deliberate divergences from reference UB: ``UpdateBGFlag`` and ``PixelQTop``
are read uninitialized in the reference (``NPBGSubtractor.h:98``,
``NPBGmodel.cpp:104``); we define update=on and qtop=0. The reference's
``AddFrame``/``NBBGSubtraction`` also convert the *caller's* frame buffer
in place (``NPBGSubtractor.cpp:305-309``) — not reproduced.

Kernel values are computed directly (σ-bin → C1·exp(C2·d²)/norm with the
table's exact normalization ``KernelTable.cpp:86-117``) instead of a
[80×511] LUT gather — same numbers, pure VPU math.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tracking_tpu.bgs.base import BGSAlgorithm, State, StepResult
from tracking_tpu.core.config import BGSConfig
from tracking_tpu.core.registry import register

SEGMAMIN, SEGMAMAX, SEGMABINS = 0.5, 36.5, 80  # NPBGSubtractor.h:67-70
HISTBINS = 20  # Abshistbins, NPBGSubtractor.cpp:325
PI = 3.14159  # KernelTable.cpp:52


def _kernel_tables():
    """Per-σ-bin (C1·/norm, C2) so kernel(bin, d) = c1n[bin]·exp(c2[bin]·d²).

    Matches KernelLUTable exactly: σ_bin = 0.5 + bin·(36/80); norm =
    2·Σ_{x=0..255} C1·e^{C2·x²} − C1 (KernelTable.cpp:88-109).
    """
    step = (SEGMAMAX - SEGMAMIN) / SEGMABINS
    sig = SEGMAMIN + step * np.arange(SEGMABINS)
    c1 = 1.0 / (np.sqrt(2 * PI) * sig)
    c2 = -1.0 / (2.0 * sig * sig)
    x = np.arange(256)
    norm = 2.0 * (c1[:, None] * np.exp(c2[:, None] * x * x)).sum(1) - c1
    return (c1 / norm).astype(np.float32), c2.astype(np.float32)


_C1N, _C2 = _kernel_tables()


def bgr_to_sngnrn(frame: jnp.ndarray) -> jnp.ndarray:
    """BGR2SnGnRn (NPBGSubtractor.cpp:64-93): [s, g-ratio, r-ratio] u8."""
    b = frame[..., 0].astype(jnp.int32)
    g = frame[..., 1].astype(jnp.int32)
    r = frame[..., 2].astype(jnp.int32)
    s = 255.0 / (b + g + r + 30).astype(jnp.float32)
    r2 = ((g + 10).astype(jnp.float32) * s).astype(jnp.int32)
    r3 = ((r + 10).astype(jnp.float32) * s).astype(jnp.int32)
    out0 = ((b + g + r) // 3).astype(jnp.uint8)
    out1 = jnp.minimum(r2, 255).astype(jnp.uint8)
    out2 = jnp.minimum(r3, 255).astype(jnp.uint8)
    return jnp.stack([out0, out1, out2], axis=-1)


@dataclasses.dataclass(frozen=True)
class KDEConfig(BGSConfig):
    framesToLearn: int = 10
    SequenceLength: int = 50
    TimeWindowSize: int = 100
    SDEstimationFlag: bool = True
    lUseColorRatiosFlag: bool = True
    th: float = 10e-8
    alpha: float = 0.3
    showOutput: bool = True
    updateBG: bool = True  # reference reads this flag uninitialized


@register("KDE", type_id=32, aliases=("kde",))
class KDE(BGSAlgorithm):
    Config = KDEConfig

    def init(self, h: int, w: int, c: int = 3) -> State:
        cfg = self.config
        S = cfg.SequenceLength
        tb_len = max(cfg.TimeWindowSize // S, 2)
        c = max(c, 1)
        return {
            "t": jnp.zeros((), jnp.int32),
            "seq": jnp.zeros((S, h, w, c), jnp.uint8),
            "qtop": jnp.zeros((h, w), jnp.int32),
            "hist": jnp.zeros((h, w, c, HISTBINS), jnp.uint8),
            "sd_bins": jnp.zeros((h, w, c), jnp.uint8),
            "tb": jnp.zeros((tb_len, h, w, c), jnp.uint8),
            "tb_mask": jnp.zeros((tb_len, h, w), jnp.uint8),
            "tb_top": jnp.zeros((), jnp.int32),
            "tb_count": jnp.zeros((), jnp.int32),
            "acc_mask": jnp.zeros((h, w), jnp.int32),
            "time_index": jnp.zeros((), jnp.int32),
        }

    # -- estimation ---------------------------------------------------------
    def _estimate(self, seq):
        S = self.config.SequenceLength
        a = seq[: S - 1].astype(jnp.int32)
        b = seq[1:S].astype(jnp.int32)
        diff = jnp.minimum(jnp.abs(a - b), HISTBINS - 1)  # [S-1, H, W, C]
        onehot = diff[..., None] == jnp.arange(HISTBINS)
        hist = jnp.sum(onehot, axis=0).astype(jnp.uint8)  # [H, W, C, 20]
        sd_bins = self._sds_from_hist(hist, S)
        return hist, sd_bins

    def _sds_from_hist(self, hist, S):
        histsum = (S - 1) & 0xFF
        median_count = histsum // 2
        cum = jnp.cumsum(hist.astype(jnp.int32), axis=-1)
        med_bin = jnp.argmax(cum >= median_count, axis=-1)
        x2 = jnp.take_along_axis(cum, med_bin[..., None], -1)[..., 0]
        hb = jnp.take_along_axis(hist.astype(jnp.int32), med_bin[..., None], -1)[..., 0]
        x1 = x2 - hb
        v = 1.04 * (
            med_bin.astype(jnp.float32)
            - (x2 - median_count).astype(jnp.float32)
            / jnp.maximum((x2 - x1).astype(jnp.float32), 1.0)
        )
        v = jnp.maximum(v, SEGMAMIN)
        factor = (SEGMABINS - 1) / (SEGMAMAX - SEGMAMIN)
        b = jnp.where(
            v >= SEGMAMAX,
            SEGMABINS - 1,
            jnp.floor((v - SEGMAMIN) * factor + 0.5).astype(jnp.int32),
        )
        return b.astype(jnp.uint8)

    # -- subtraction ---------------------------------------------------------
    def _probability(self, img, seq, sd_bins):
        cfg = self.config
        S = cfg.SequenceLength
        c1n = jnp.asarray(_C1N)
        c2 = jnp.asarray(_C2)
        x = img.astype(jnp.float32)  # [H, W, C]
        g = seq.astype(jnp.float32)  # [S, H, W, C]
        sd = sd_bins.astype(jnp.int32)

        def kern(ch):
            d = g[..., ch] - x[None, ..., ch]
            return c1n[sd[..., ch]][None] * jnp.exp(c2[sd[..., ch]][None] * d * d)

        if img.shape[-1] == 1:
            return jnp.mean(kern(0), axis=0)
        if cfg.lUseColorRatiosFlag:
            # subset gate on channel 0 (NPBGSubtraction ':658-705')
            alpha = cfg.alpha
            beta = 3.0
            g0 = g[..., 0]
            near = g0 < beta / alpha
            x1 = jnp.where(near, jnp.trunc(g0 - beta), jnp.trunc(g0 * (1 - alpha) + 0.5))
            x2 = jnp.where(near, jnp.trunc(g0 + beta), jnp.trunc(g0 * (1 + alpha) + 0.5))
            gate = (x1 < x[None, ..., 0]) & (x[None, ..., 0] < x2)
            contrib = jnp.where(gate, kern(1) * kern(2), 0.0)
            return jnp.mean(contrib, axis=0)
        return jnp.mean(kern(0) * kern(1) * kern(2), axis=0)

    # -- pair update ---------------------------------------------------------
    def _update_pairs(self, st, img, mask):
        cfg = self.config
        S = cfg.SequenceLength
        rate = max(cfg.TimeWindowSize // S, 2)
        tb_len = st["tb"].shape[0]
        top = st["tb_top"]
        nxt = (top + 1) % tb_len

        do_pairs = (st["time_index"] % rate == 0) & (st["tb_count"] >= tb_len)
        pix_ok = do_pairs & (st["tb_mask"][top] == 0) & (st["tb_mask"][nxt] == 0)

        f1, f2 = st["tb"][top], st["tb"][nxt]  # pair to insert
        q1 = st["qtop"]
        q2 = (st["qtop"] + 1) % S
        idx = jnp.arange(S)[:, None, None]
        sel1 = (idx == q1[None]) & pix_ok[None]
        sel2 = (idx == q2[None]) & pix_ok[None]
        old1 = jnp.take_along_axis(st["seq"], q1[None, ..., None], axis=0)[0]
        old2 = jnp.take_along_axis(st["seq"], q2[None, ..., None], axis=0)[0]
        seq = jnp.where(sel1[..., None], f1[None], st["seq"])
        seq = jnp.where(sel2[..., None], f2[None], seq)

        # wrapping-u8 histogram patch (faithful to the uchar counters)
        if cfg.SDEstimationFlag:
            def bins_of(a, b):
                d = jnp.minimum(
                    jnp.abs(a.astype(jnp.int32) - b.astype(jnp.int32)), HISTBINS - 1
                )
                return d[..., None] == jnp.arange(HISTBINS)

            delta = (
                bins_of(f1, f2).astype(jnp.uint8) - bins_of(old1, old2).astype(jnp.uint8)
            )
            hist = jnp.where(
                pix_ok[..., None, None], st["hist"] + delta, st["hist"]
            )
        else:
            hist = st["hist"]
        qtop = jnp.where(pix_ok, (st["qtop"] + 2) % S, st["qtop"])

        # stuck-FG suppression then store current frame+mask into the buffer
        acc = jnp.where(mask > 0, st["acc_mask"] + 1, 0)
        mask_stored = jnp.where(acc > 500, jnp.uint8(0), mask)
        tb = st["tb"].at[top].set(img)
        tb_mask = st["tb_mask"].at[top].set(mask_stored)

        return dict(
            st,
            seq=seq,
            qtop=qtop,
            hist=hist,
            acc_mask=acc,
            tb=tb,
            tb_mask=tb_mask,
            tb_top=nxt,
            tb_count=st["tb_count"] + 1,
            time_index=st["time_index"] + 1,
        )

    # -- step -----------------------------------------------------------------
    def step(self, state: State, frame: jnp.ndarray) -> StepResult:
        cfg = self.config
        S = cfg.SequenceLength
        f3 = frame if frame.ndim == 3 else frame[..., None]
        img = (
            bgr_to_sngnrn(f3)
            if (cfg.lUseColorRatiosFlag and f3.shape[-1] == 3)
            else f3
        )
        t = state["t"]

        def learn(st):
            idx = jnp.arange(S)[:, None, None, None]
            seq = jnp.where(idx == (t % S), img[None], st["seq"])
            return dict(st, seq=seq, t=t + 1), jnp.zeros(frame.shape[:2], jnp.uint8)

        def detect(st):
            hist0, sd0 = jax.lax.cond(
                t == cfg.framesToLearn,
                lambda: self._estimate(st["seq"])
                if cfg.SDEstimationFlag
                else (
                    st["hist"],
                    jnp.full_like(
                        st["sd_bins"],
                        int(((1.0 - SEGMAMIN) * SEGMABINS) / (SEGMAMAX - SEGMAMIN)),
                    ),
                ),
                lambda: (st["hist"], st["sd_bins"]),
            )
            st = dict(st, hist=hist0, sd_bins=sd0)
            p = self._probability(img, st["seq"], st["sd_bins"])
            mask = jnp.where(p > cfg.th, jnp.uint8(0), jnp.uint8(255))
            if cfg.updateBG:
                st = self._update_pairs(st, img, mask)
            return dict(st, t=t + 1), mask

        new_state, fg = jax.lax.cond(t < cfg.framesToLearn, learn, detect, state)
        bg = jnp.zeros(frame.shape, jnp.uint8)
        return new_state, fg, bg
