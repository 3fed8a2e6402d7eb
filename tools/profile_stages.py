"""Floor-corrected per-stage profile of the flagship pipeline on real content.

Each measurement is a T-frame lax.scan inside ONE jit ending with a
device→host scalar fetch (the only reliable completion barrier on the
tunneled platform); the ~27 ms round-trip amortizes to 27/T ms/frame and is
subtracted. Stages are isolated by stubbing the stage out and measuring the
delta (stub-based isolation avoids the per-dispatch floor entirely).

Usage: python tools/profile_stages.py [stage ...]
Stages: full bgs consensus cc fill track assoc
"""

import os
import sys
import time

import cv2
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from __graft_entry__ import _flagship  # noqa: E402
from tracking_tpu.io.video import read_video  # noqa: E402
from tracking_tpu.runner.scan import make_step_fn  # noqa: E402

H, W, C = 720, 1280, 3
T = 64
FLOOR = 27.0 / T
# PROF_T0: first measured frame (default 1 = the quiet settling window;
# 65 = the motion peak window the distinct-content bench covers)
T0 = int(os.environ.get("PROF_T0", "1"))


def frames_720p():
    small = read_video("/root/reference/dataset/video.avi", max_frames=T0 + T)
    return jnp.asarray(
        np.stack([cv2.resize(f, (W, H)) for f in small[T0 : T0 + T]])
    )


def measure_scan(body, state0, frames, label, reps=3):
    @jax.jit
    def run(state, frames):
        state, out = jax.lax.scan(body, state, frames)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    float(run(state0, frames))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(state0, frames))
        best = min(best, time.perf_counter() - t0)
    ms = best / T * 1e3 - FLOOR
    print(f"{label}: {ms:.3f} ms/frame  ({1000.0 / ms:.1f} fps)")
    return ms


def main():
    which = set(sys.argv[1:]) or {"full", "bgs", "track"}
    frames = frames_720p()
    algo = _flagship()
    state0 = algo.init(H, W, C)
    state0 = jax.jit(algo.warm_start)(state0, frames[0])
    bgs_body = make_step_fn(algo)

    if "bgs" in which:
        measure_scan(bgs_body, state0, frames, "BGS step")

    if "full" in which or "track" in which:
        from tracking_tpu.track.tracker import BlobTracker

        tracker = BlobTracker()

        def body(carry, frame):
            bs, ts = carry
            bs, fg = bgs_body(bs, frame)
            ts, tracks = tracker.step(ts, fg)
            return (bs, ts), (fg, tracks.x)

        measure_scan(body, (state0, tracker.init()), frames, "BGS+tracking")

    if "track" in which:
        # tracking alone: feed the tracker a precomputed mask sequence
        from tracking_tpu.track.tracker import BlobTracker

        @jax.jit
        def get_masks(state, frames):
            def b(s, f):
                s, m = bgs_body(s, f)
                return s, m
            _, masks = jax.lax.scan(b, state, frames)
            return masks

        masks = get_masks(state0, frames)
        tracker = BlobTracker()

        def tbody(ts, m):
            ts, tracks = tracker.step(ts, m)
            return ts, tracks.x

        measure_scan(tbody, tracker.init(), masks, "tracking only")

        # sub-stages: blob extraction alone, then tracker minus each piece
        from tracking_tpu.ops.cc import extract_blobs

        def ebody(_, m):
            b = extract_blobs(m, max_blobs=64)
            return _, (b.area, b.cx)

        measure_scan(ebody, jnp.zeros(()), masks, "blob extraction only")

        import tracking_tpu.track.tracker as TT

        real_assoc = BlobTracker._associate
        def stub_assoc(self, pred_pos, active, blob_pos, blob_ok):
            K, B = pred_pos.shape[0], blob_pos.shape[0]
            return jnp.full(K, -1, jnp.int32), jnp.zeros(B, bool)
        BlobTracker._associate = stub_assoc
        try:
            tr2 = BlobTracker()
            def tbody2(ts, m):
                ts, tracks = tr2.step(ts, m)
                return ts, tracks.x
            measure_scan(tbody2, tr2.init(), masks, "tracking w/o associate")
        finally:
            BlobTracker._associate = real_assoc

        tr3 = BlobTracker(useMeanShiftCollision=False)
        def tbody3(ts, m):
            ts, tracks = tr3.step(ts, m)
            return ts, tracks.x
        measure_scan(tbody3, tr3.init(), masks, "tracking w/o meanshift")

    if "consensus" in which:
        # stub the consensus kernel with a cheap fake of identical shapes
        import tracking_tpu.ops.pallas_consensus as PC

        real = PC.consensus_pallas

        def stub(planes, colors, descs, pend_ctrl, pend_vals, lut_delta, R,
                 unstable, required, **kw):
            z = jnp.zeros(planes[0].shape, jnp.int32)
            count = (planes[0].astype(jnp.int32) > 100).astype(jnp.int32) * 2
            intra = tuple(planes[ci].astype(jnp.int32) * 257 & 0xFFFF for ci in range(len(planes)))
            bg = tuple(planes[ci].astype(jnp.int32) * 50 for ci in range(len(planes)))
            return count, z + 5, z + 80, intra, bg, colors, descs

        PC.consensus_pallas = stub
        try:
            body2 = make_step_fn(_flagship())
            measure_scan(body2, state0, frames, "BGS w/o consensus kernel")
        finally:
            PC.consensus_pallas = real

    if "walk0" in which or "walk50" in which:
        # isolate the sample-walk cost: required=0 exits every tile before
        # sample 0 (kernel cost = DMA + pending-apply + views/intra only);
        # required=N+1 never exits (worst-case full-N walk every tile).
        import tracking_tpu.ops.pallas_consensus as PC

        real = PC.consensus_pallas
        for name, req_val in (("walk0", 0), ("walk50", 99)):
            if name not in which:
                continue

            def forced(planes, colors, descs, pend_ctrl, pend_vals, lut_delta,
                       R, unstable, required, _rv=req_val, **kw):
                return real(planes, colors, descs, pend_ctrl, pend_vals,
                            lut_delta, R, unstable, _rv, **kw)

            PC.consensus_pallas = forced
            try:
                bodyw = make_step_fn(_flagship())
                measure_scan(bodyw, state0, frames, f"BGS required={req_val}")
            finally:
                PC.consensus_pallas = real

    if "post" in which:
        # stub the ENTIRE post-proc chain (close/fill/erode/median/dilate)
        import tracking_tpu.bgs.lbsp_family as LF

        saved = {
            n: getattr(LF, n)
            for n in ("morph_close", "fill_holes", "erode", "dilate",
                      "binary_median_blur")
        }
        LF.morph_close = lambda m, k: m
        LF.fill_holes = lambda m, *a, **kw: m
        LF.erode = lambda m, k: m
        LF.dilate = lambda m, k: m
        LF.binary_median_blur = lambda m, k: m
        try:
            body4 = make_step_fn(_flagship())
            measure_scan(body4, state0, frames, "BGS w/o post-proc chain")
        finally:
            for n, f in saved.items():
                setattr(LF, n, f)

    if "fill" in which:
        # lbsp_family binds fill_holes at import time — stub its module global
        import tracking_tpu.bgs.lbsp_family as LF

        src = LF.fill_holes
        LF.fill_holes = lambda mask, *a, **kw: mask
        try:
            body3 = make_step_fn(_flagship())
            measure_scan(body3, state0, frames, "BGS w/o fill_holes")
        finally:
            LF.fill_holes = src


if __name__ == "__main__":
    main()
