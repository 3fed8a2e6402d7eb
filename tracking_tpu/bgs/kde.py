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
   sum/j ≥ th; no exit ⇒ sum/S < th), so we compute the full sum — decision
   parity in exact arithmetic, scan-free.  The reference evaluates kernels
   through the precomputed ``KernelLUTable`` (quantized sample bins,
   ``KernelTable.cpp``) while we compute ``c1n·exp(c2·d²)`` directly —
   numerically equal up to float rounding, so pixels whose density sits
   exactly at ``th`` can flip; measured residue 7e-5 of pixels (golden
   gate 0.9995 in tests/test_golden_cpp.py).
4. model update (``SequenceBGUpdate_Pairs`` ``:660-851``): every 2nd update
   tick (rate = max(TimeWindow/SampleSize, 2)) once the 2-frame temporal
   buffer has filled, each pixel whose two buffered masks are both BG gets
   the buffered frame pair written over the ring slots [qtop, qtop+1] (and
   the abs-diff histogram incrementally patched with wrapping u8 counters —
   faithful); a stuck-FG counter force-clears masks after 500 frames
   (ResetMaskTh, ``NPBGmodel.cpp:116``). SD re-estimation never reruns
   (UpdateSDRate=0, ``:838``).

Reference-UB handling: ``UpdateBGFlag`` is read uninitialized in the
reference (``NPBGSubtractor(){}`` never sets it, ``NPBGSubtractor.h:98``;
KDE.cpp never calls ``SetUpdateFlag``) — we define update=on, the author's
documented intent (``KDE.cpp:84-86``), and the golden oracle compiles the
reference with ``SetUpdateFlag(1)`` to pin the same choice. ``PixelQTop``
*is* defined at first use: every learn-phase ``AddFrame`` memsets it to the
ring ``Top`` (``NPBGmodel.cpp:124``), so it starts at ``framesToLearn`` —
updates write into the zero slots after the learned samples. The reference's
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


def bgr_to_sngnrn(frame: jnp.ndarray):
    """BGR2SnGnRn (NPBGSubtractor.cpp:64-93): (s, g-ratio, r-ratio) u8 planes."""
    b = frame[..., 0].astype(jnp.int32)
    g = frame[..., 1].astype(jnp.int32)
    r = frame[..., 2].astype(jnp.int32)
    s = 255.0 / (b + g + r + 30).astype(jnp.float32)
    r2 = ((g + 10).astype(jnp.float32) * s).astype(jnp.int32)
    r3 = ((r + 10).astype(jnp.float32) * s).astype(jnp.int32)
    out0 = ((b + g + r) // 3).astype(jnp.uint8)
    out1 = jnp.minimum(r2, 255).astype(jnp.uint8)
    out2 = jnp.minimum(r3, 255).astype(jnp.uint8)
    return (out0, out1, out2)


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
        # channel-tuple layout: every per-channel array keeps H×W minor
        # (a C=3 or bins=20 minor axis tiles onto 128 lanes at <16%
        # efficiency; the per-pixel take_along_axis reads were full-map
        # gathers — 69 ms/frame before, see PERF.md)
        return {
            "t": jnp.zeros((), jnp.int32),
            "seq": tuple(jnp.zeros((S, h, w), jnp.uint8) for _ in range(c)),
            # = PixelQTop after the last learn-phase AddFrame memset
            # (NPBGmodel.cpp:124): the slot just past the learned samples.
            "qtop": jnp.full(
                (h, w),
                self.config.framesToLearn % self.config.SequenceLength,
                jnp.int32,
            ),
            "hist": tuple(
                jnp.zeros((HISTBINS, h, w), jnp.uint8) for _ in range(c)
            ),
            "c1n_px": tuple(jnp.zeros((h, w), jnp.float32) for _ in range(c)),
            "c2_px": tuple(jnp.zeros((h, w), jnp.float32) for _ in range(c)),
            "tb": tuple(jnp.zeros((tb_len, h, w), jnp.uint8) for _ in range(c)),
            "tb_mask": jnp.zeros((tb_len, h, w), jnp.uint8),
            "tb_top": jnp.zeros((), jnp.int32),
            "tb_count": jnp.zeros((), jnp.int32),
            "acc_mask": jnp.zeros((h, w), jnp.int32),
            "time_index": jnp.zeros((), jnp.int32),
        }

    # -- estimation (runs once, at the end of learning) -----------------------
    def _estimate(self, seq):
        S = self.config.SequenceLength
        hist = []
        for ch in range(len(seq)):
            a = seq[ch][: S - 1].astype(jnp.int32)
            b = seq[ch][1:S].astype(jnp.int32)
            diff = jnp.minimum(jnp.abs(a - b), HISTBINS - 1)  # [S-1, H, W]
            hist.append(
                jnp.stack(
                    [jnp.sum(diff == k, axis=0) for k in range(HISTBINS)]
                ).astype(jnp.uint8)
            )
        hist = tuple(hist)
        return (hist,) + self._sds_from_hist(hist, S)

    def _sds_from_hist(self, hist, S):
        """Per-channel σ bins → per-pixel kernel constants (one-time cost;
        the hot path then reads c1n/c2 maps with zero gathers)."""
        histsum = (S - 1) & 0xFF
        median_count = histsum // 2
        c1n_px, c2_px = [], []
        for ch in range(len(hist)):
            h = hist[ch].astype(jnp.int32)  # [20, H, W]
            cum = jnp.zeros_like(h[0])
            found = jnp.zeros(h.shape[1:], bool)
            med_bin = jnp.zeros_like(h[0])
            x2 = jnp.zeros_like(h[0])
            hb = jnp.zeros_like(h[0])
            for k in range(HISTBINS):
                cum = cum + h[k]
                hit = (cum >= median_count) & jnp.logical_not(found)
                med_bin = jnp.where(hit, k, med_bin)
                x2 = jnp.where(hit, cum, x2)
                hb = jnp.where(hit, h[k], hb)
                found = found | hit
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
            c1n_px.append(
                sum(
                    jnp.where(b == k, float(_C1N[k]), 0.0)
                    for k in range(SEGMABINS)
                )
            )
            c2_px.append(
                sum(
                    jnp.where(b == k, float(_C2[k]), 0.0)
                    for k in range(SEGMABINS)
                )
            )
        return tuple(c1n_px), tuple(c2_px)

    # -- subtraction ---------------------------------------------------------
    def _probability(self, img, seq, c1n_px, c2_px):
        cfg = self.config
        C = len(img)

        def kern(ch):
            d = seq[ch].astype(jnp.float32) - img[ch].astype(jnp.float32)[None]
            return c1n_px[ch][None] * jnp.exp(c2_px[ch][None] * d * d)

        if C == 1:
            return jnp.mean(kern(0), axis=0)
        if cfg.lUseColorRatiosFlag:
            # subset gate on channel 0 (NPBGSubtraction ':658-705')
            alpha = cfg.alpha
            beta = 3.0
            g0 = seq[0].astype(jnp.float32)
            near = g0 < beta / alpha
            x1 = jnp.where(near, jnp.trunc(g0 - beta), jnp.trunc(g0 * (1 - alpha) + 0.5))
            x2 = jnp.where(near, jnp.trunc(g0 + beta), jnp.trunc(g0 * (1 + alpha) + 0.5))
            x0 = img[0].astype(jnp.float32)[None]
            gate = (x1 < x0) & (x0 < x2)
            contrib = jnp.where(gate, kern(1) * kern(2), 0.0)
            return jnp.mean(contrib, axis=0)
        return jnp.mean(kern(0) * kern(1) * kern(2), axis=0)

    # -- pair update ---------------------------------------------------------
    def _update_pairs(self, st, img, mask):
        cfg = self.config
        S = cfg.SequenceLength
        C = len(img)
        rate = max(cfg.TimeWindowSize // S, 2)
        tb_len = st["tb"][0].shape[0]
        top = st["tb_top"]
        nxt = (top + 1) % tb_len

        do_pairs = (st["time_index"] % rate == 0) & (st["tb_count"] >= tb_len)
        pix_ok = do_pairs & (st["tb_mask"][top] == 0) & (st["tb_mask"][nxt] == 0)

        f1 = tuple(st["tb"][ch][top] for ch in range(C))  # pair to insert
        f2 = tuple(st["tb"][ch][nxt] for ch in range(C))
        q1 = st["qtop"]
        q2 = (st["qtop"] + 1) % S
        idx = jnp.arange(S)[:, None, None]
        sel1 = (idx == q1[None]) & pix_ok[None]
        sel2 = (idx == q2[None]) & pix_ok[None]
        # one-hot reads over the (dynamic per-pixel) queue positions
        old1 = tuple(
            sum(
                jnp.where(q1 == s_, st["seq"][ch][s_], 0).astype(jnp.uint8)
                for s_ in range(S)
            )
            for ch in range(C)
        )
        old2 = tuple(
            sum(
                jnp.where(q2 == s_, st["seq"][ch][s_], 0).astype(jnp.uint8)
                for s_ in range(S)
            )
            for ch in range(C)
        )
        seq = tuple(
            jnp.where(sel2, f2[ch][None], jnp.where(sel1, f1[ch][None], st["seq"][ch]))
            for ch in range(C)
        )

        # wrapping-u8 histogram patch (faithful to the uchar counters)
        if cfg.SDEstimationFlag:
            hist = []
            for ch in range(C):
                d_add = jnp.minimum(
                    jnp.abs(f1[ch].astype(jnp.int32) - f2[ch].astype(jnp.int32)),
                    HISTBINS - 1,
                )
                d_rem = jnp.minimum(
                    jnp.abs(
                        old1[ch].astype(jnp.int32) - old2[ch].astype(jnp.int32)
                    ),
                    HISTBINS - 1,
                )
                planes = []
                for k in range(HISTBINS):
                    delta = (d_add == k).astype(jnp.uint8) - (d_rem == k).astype(
                        jnp.uint8
                    )
                    planes.append(
                        jnp.where(pix_ok, st["hist"][ch][k] + delta, st["hist"][ch][k])
                    )
                hist.append(jnp.stack(planes))
            hist = tuple(hist)
        else:
            hist = st["hist"]
        qtop = jnp.where(pix_ok, (st["qtop"] + 2) % S, st["qtop"])

        # stuck-FG suppression then store current frame+mask into the buffer
        acc = jnp.where(mask > 0, st["acc_mask"] + 1, 0)
        mask_stored = jnp.where(acc > 500, jnp.uint8(0), mask)
        tb = tuple(st["tb"][ch].at[top].set(img[ch]) for ch in range(C))
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
        if cfg.lUseColorRatiosFlag and f3.shape[-1] == 3:
            img = bgr_to_sngnrn(f3)
        else:
            img = tuple(f3[..., ch] for ch in range(f3.shape[-1]))
        C = len(img)
        t = state["t"]

        def learn(st):
            seq = tuple(
                jnp.where(
                    (jnp.arange(S) == (t % S))[:, None, None],
                    img[ch][None],
                    st["seq"][ch],
                )
                for ch in range(C)
            )
            return dict(st, seq=seq, t=t + 1), jnp.zeros(frame.shape[:2], jnp.uint8)

        def detect(st):
            if cfg.SDEstimationFlag:
                est = lambda: self._estimate(st["seq"])  # noqa: E731
            else:
                b0 = int(((1.0 - SEGMAMIN) * SEGMABINS) / (SEGMAMAX - SEGMAMIN))
                est = lambda: (  # noqa: E731
                    st["hist"],
                    tuple(
                        jnp.full_like(st["c1n_px"][ch], float(_C1N[b0]))
                        for ch in range(C)
                    ),
                    tuple(
                        jnp.full_like(st["c2_px"][ch], float(_C2[b0]))
                        for ch in range(C)
                    ),
                )
            hist0, c1n0, c2n0 = jax.lax.cond(
                t == cfg.framesToLearn,
                est,
                lambda: (st["hist"], st["c1n_px"], st["c2_px"]),
            )
            st = dict(st, hist=hist0, c1n_px=c1n0, c2_px=c2n0)
            p = self._probability(img, st["seq"], st["c1n_px"], st["c2_px"])
            mask = jnp.where(p > cfg.th, jnp.uint8(0), jnp.uint8(255))
            if cfg.updateBG:
                st = self._update_pairs(st, img, mask)
            return dict(st, t=t + 1), mask

        new_state, fg = jax.lax.cond(t < cfg.framesToLearn, learn, detect, state)
        bg = jnp.zeros(frame.shape, jnp.uint8)
        return new_state, fg, bg
