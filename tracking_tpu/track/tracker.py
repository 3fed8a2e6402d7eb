"""Multi-object blob tracker with fixed-capacity track tables.

Capability-parity replacement for OpenCV legacy's ``CvBlobTrackerAuto1``
pipeline assembled in ``ustc_src/trackingMain.cpp:609-683``:

- blob detection = connected components of the FG mask (``cvCreateBlobDetectorCC``,
  :626) with the CC detector's temporal-consistency rule: a candidate must be
  re-detected in consecutive frames (uniform motion) before becoming a track;
- blob tracking = per-track Kalman predict + nearest-blob association
  (``cvCreateBlobTrackerCCMSPF``'s CC association, :633 — the mean-shift
  particle-filter collision resolver is replaced by overlap-aware greedy
  assignment, an XLA-friendly equivalent);
- post-processing = Kalman smoothing (``PostProcKalman``, :653-662);
- deletion after a miss streak (legacy FrameCount/LostFrames logic).

TPU-native design: tracks live in a fixed-capacity table (pad-to-MAX, active
masks) so every step is static-shaped; association is a greedy argmin over the
[K, B] cost matrix run K times inside a ``fori_loop`` (K, B ≤ 64 — tiny).
The whole step is jit/vmap/scan-safe, so tracking runs on-device fused with
the BGS scan.

Where the CCMSPF approximation breaks vs the legacy particle filter:
identity through a crossing is carried by Kalman velocity plus mask-space
mean-shift refinement (tests/test_track.py::test_ccmspf_keeps_ids_through_
crossing proves the canonical two-object crossing). The legacy resolver
weights per-track particle sets by an appearance likelihood, so it can
additionally hold identities through LONG occlusions (many merged frames)
or matched-speed same-path crossings, where any appearance-free predictor —
including this one — may swap labels.
"""

from __future__ import annotations

import dataclasses
import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from tracking_tpu.core.config import BGSConfig
from tracking_tpu.ops.cc import Blobs, extract_blobs
from tracking_tpu.track import kalman


@dataclasses.dataclass(frozen=True)
class TrackerConfig(BGSConfig):
    maxTracks: int = 32
    maxBlobs: int = 64
    minBlobArea: int = 25  # drop specks (legacy CC detector's min size gate)
    newBlobDetectFrames: int = 5  # consecutive detections to confirm a track
    maxLostFrames: int = 10  # misses before a track dies
    gateDistance: float = 2.0  # association gate, in units of blob size
    candidateGate: float = 1.5  # candidate re-detection gate
    # CCMSPF parity: resolve colliding tracks with mean-shift on the FG mask
    useMeanShiftCollision: bool = True
    # tracker registry (trackingMain.cpp:49-68): CC and CCMSPF associate
    # detection blobs (CCMSPF adds the mean-shift collision resolver); the
    # MS family tracks positions by mean-shift over per-track color
    # backprojections (MS: color only; MSFG: × FG mask; MSPF: particle
    # jitter + mean-shift), with detections used only for births — as in
    # CvBlobTrackerAuto, where the detector feeds entries to any tracker.
    trackerType: str = "CCMSPF"  # CC | CCMSPF | MS | MSFG | MSPF
    minTrackMass: float = 4.0  # MS-family: window mass below this = miss
    # blob-detector registry (trackingMain.cpp:43-47): BD_CC confirms a
    # candidate only when its re-detections move with uniform velocity
    # (cvCreateBlobDetectorCC); BD_Simple needs consecutive presence only
    # (cvCreateBlobDetectorSimple).
    blobDetector: str = "BD_CC"  # BD_CC | BD_Simple
    uniformMotionTol: float = 0.7  # BD_CC velocity-consistency gate (×scale)


class TrackTable(NamedTuple):
    """Fixed-capacity track state (invalid slots: active=False)."""

    active: jnp.ndarray  # [K] bool
    ids: jnp.ndarray  # [K] int32 (stable track ids, -1 when inactive)
    kx: jnp.ndarray  # [K, 8] kalman state (x, y, w, h, v...)
    kP: jnp.ndarray  # [K, 8, 8] kalman covariance
    age: jnp.ndarray  # [K] int32 frames since birth
    lost: jnp.ndarray  # [K] int32 consecutive misses
    # candidate (pre-confirmation) blobs
    cand_pos: jnp.ndarray  # [K, 4] x, y, w, h
    cand_age: jnp.ndarray  # [K] int32 consecutive detections (0 = empty)
    next_id: jnp.ndarray  # [] int32
    # MS-family state: per-track color template + RNG (inert in CC modes)
    hist: jnp.ndarray  # [K, 512] f32 birth-window color histogram
    key: jnp.ndarray  # PRNGKey (MSPF particle jitter)
    cand_vel: jnp.ndarray  # [K, 2] last candidate step (BD_CC motion gate)


class Tracks(NamedTuple):
    """Per-frame tracker output (padded to maxTracks). x/y/w/h are the
    Kalman-filtered states (the reference's BlobTrackPostProc=Kalman path);
    rx/ry/rw/rh are the raw associated-blob measurements (post mean-shift
    refinement, pre filter) — the BlobTrackPostProc=None path — falling back
    to the filtered state on unmatched frames."""

    active: jnp.ndarray  # [K] bool
    ids: jnp.ndarray  # [K] int32
    x: jnp.ndarray  # [K] f32 center x
    y: jnp.ndarray  # [K] f32 center y
    w: jnp.ndarray  # [K] f32
    h: jnp.ndarray  # [K] f32
    rx: jnp.ndarray  # [K] f32 raw center x
    ry: jnp.ndarray  # [K] f32 raw center y
    rw: jnp.ndarray  # [K] f32
    rh: jnp.ndarray  # [K] f32


def _blob_xywh(blobs: Blobs) -> jnp.ndarray:
    """Blobs → [B, 4] (cx, cy, w, h) f32."""
    return jnp.stack(
        [
            blobs.cx,
            blobs.cy,
            blobs.w.astype(jnp.float32),
            blobs.h.astype(jnp.float32),
        ],
        axis=-1,
    )


class BlobTracker:
    """Functional tracker: ``state = init()``, ``state, tracks = step(state, mask)``."""

    def __init__(self, config: TrackerConfig | None = None, **kw):
        cfg = config or TrackerConfig()
        if kw:
            cfg = cfg.replace(**kw)
        self.config = cfg
        self.kparams = kalman.default_params()

    def empty_tracks(self, state: TrackTable) -> Tracks:
        """All-inactive per-frame output with the step's shapes/dtypes (the
        FGTrainFrames phase emits this while the FG detector trains alone)."""
        K = self.config.maxTracks
        z = jnp.zeros(K, jnp.float32)
        return Tracks(
            active=jnp.zeros(K, bool),
            ids=jnp.full(K, -1, jnp.int32),
            x=z, y=z, w=z, h=z, rx=z, ry=z, rw=z, rh=z,
        )

    def init(self) -> TrackTable:
        K = self.config.maxTracks
        kx, kP = kalman.kalman_init(K, self.kparams)
        return TrackTable(
            active=jnp.zeros(K, bool),
            ids=jnp.full(K, -1, jnp.int32),
            kx=kx,
            kP=kP,
            age=jnp.zeros(K, jnp.int32),
            lost=jnp.zeros(K, jnp.int32),
            cand_pos=jnp.zeros((K, 4), jnp.float32),
            cand_age=jnp.zeros(K, jnp.int32),
            next_id=jnp.zeros((), jnp.int32),
            hist=jnp.zeros((K, 512), jnp.float32),
            key=jax.random.PRNGKey(7),
            cand_vel=jnp.zeros((K, 2), jnp.float32),
        )

    # -- association ------------------------------------------------------
    def _associate(self, pred_pos, active, blob_pos, blob_ok):
        """Greedy min-cost assignment track↔blob.

        Cost = center distance normalized by mean blob/track size; gated.
        Returns (track_assign [K] int32 blob idx or -1, blob_taken [B] bool).
        """
        cfg = self.config
        K, B = pred_pos.shape[0], blob_pos.shape[0]
        d = jnp.linalg.norm(pred_pos[:, None, :2] - blob_pos[None, :, :2], axis=-1)
        scale = 0.5 * (
            jnp.maximum(pred_pos[:, None, 2:4].mean(-1), 1.0)
            + jnp.maximum(blob_pos[None, :, 2:4].mean(-1), 1.0)
        )
        cost = d / scale
        BIG = jnp.float32(1e9)
        cost = jnp.where(active[:, None] & blob_ok[None, :], cost, BIG)
        cost = jnp.where(cost <= cfg.gateDistance, cost, BIG)

        # TPU: the whole greedy loop runs inside ONE Pallas kernel call
        # (cost matrix in VMEM) — as an XLA while_loop each tiny iteration
        # costs ~45 us of sequential op overhead (0.36 ms/frame measured).
        # Bit-identical to the loop below (tests/test_track.py parity).
        if jax.default_backend() == "tpu" or os.environ.get(
            "TRACKING_TPU_ASSOC_INTERP"
        ):
            from tracking_tpu.ops.pallas_assoc import greedy_assign_pallas

            return greedy_assign_pallas(
                cost, interpret=jax.default_backend() != "tpu"
            )

        # early-exit greedy: stop as soon as the global min is gated (every
        # later iteration would be a no-op) — typical frames assign ~5
        # pairs, not min(K, B) = 64
        def cond(carry):
            i, ok, _, _, _ = carry
            return (i < min(K, B)) & ok

        def body(carry):
            i, _, cost, assign, taken = carry
            flat = jnp.argmin(cost)
            k, b = flat // B, flat % B
            ok = cost[k, b] < BIG
            assign = assign.at[k].set(jnp.where(ok, b, assign[k]))
            taken = taken.at[b].set(jnp.where(ok, True, taken[b]))
            cost = jnp.where(ok, cost.at[k, :].set(BIG).at[:, b].set(BIG), cost)
            return i + 1, ok, cost, assign, taken

        assign0 = jnp.full(K, -1, jnp.int32)
        taken0 = jnp.zeros(B, bool)
        _, _, _, assign, taken = jax.lax.while_loop(
            cond, body, (0, jnp.bool_(True), cost, assign0, taken0)
        )
        return assign, taken

    # -- one tracking step -------------------------------------------------
    def step(
        self,
        state: TrackTable,
        fg_mask: jnp.ndarray,
        frame: jnp.ndarray | None = None,
        blobs: Blobs | None = None,
        ctx=None,
    ) -> Tuple[TrackTable, Tracks]:
        """One tracker step on a foreground mask.

        ``blobs``: precomputed blob table — the spatially-sharded pipeline
        (parallel/spatial.run_video_spatial_tracked) extracts blobs with the
        row-sharded CC path and feeds the replicated table here.

        ``ctx``: a ``parallel.spatial.SpatialCtx`` when ``fg_mask`` is this
        shard's [h_loc, W] slab instead of the full frame — the CCMSPF
        mean-shift collision refinement then runs as psum-combined window
        moments over the owned rows (meanshift_refine_batch_sharded),
        bit-exact vs the full-frame refinement."""
        cfg = self.config
        K = cfg.maxTracks
        ttype = cfg.trackerType.upper()
        ms_family = ttype in ("MS", "MSFG", "MSPF")
        if blobs is None:
            blobs = extract_blobs(fg_mask, max_blobs=cfg.maxBlobs)
        blob_ok = blobs.area >= cfg.minBlobArea
        blob_pos = _blob_xywh(blobs)
        # fg_f is only consumed by the mean-shift paths (CCMSPF collision
        # refinement / MS family); computing it lazily keeps the sharded
        # caller (run_video_spatial_tracked, which passes a shard-local
        # slab) from materializing per-shard-different replicated state on
        # the CC / collision-disabled paths (ADVICE r3).
        fg_f = None
        if ms_family or (cfg.useMeanShiftCollision and ttype == "CCMSPF"):
            fg_f = (fg_mask > 0).astype(jnp.float32)
        if frame is not None and frame.ndim == 2:
            frame = jnp.repeat(frame[..., None], 3, -1)

        # 1) Kalman predict
        kx, kP = kalman.kalman_predict(state.kx, state.kP, self.kparams)
        pred_pos = kx[:, :4]
        new_key = state.key

        if not ms_family:
            # 2) associate active tracks ↔ blobs (CC / CCMSPF)
            assign, taken = self._associate(pred_pos, state.active, blob_pos, blob_ok)
            matched = assign >= 0
            z = blob_pos[jnp.clip(assign, 0, cfg.maxBlobs - 1)]

            # CCMSPF collision resolution (cvCreateBlobTrackerCCMSPF,
            # trackingMain.cpp:633): when two active tracks' predicted boxes
            # overlap, the CC measurement is ambiguous — refine each
            # colliding track's measurement by mean-shift over the FG mask.
            if cfg.useMeanShiftCollision and ttype == "CCMSPF":
                from tracking_tpu.track.meanshift import (
                    meanshift_refine_batch,
                    meanshift_refine_batch_sharded,
                )

                px, py = pred_pos[:, 0], pred_pos[:, 1]
                pw = jnp.maximum(pred_pos[:, 2], 4.0)
                ph = jnp.maximum(pred_pos[:, 3], 4.0)
                dx = jnp.abs(px[:, None] - px[None, :])
                dy = jnp.abs(py[:, None] - py[None, :])
                overlap = (
                    (dx < (pw[:, None] + pw[None, :]) / 2)
                    & (dy < (ph[:, None] + ph[None, :]) / 2)
                    & state.active[:, None]
                    & state.active[None, :]
                    & ~jnp.eye(K, dtype=bool)
                )
                colliding = jnp.any(overlap, axis=1) & matched
                if ctx is not None:
                    ms_y, ms_x, ms_mass = meanshift_refine_batch_sharded(
                        ctx, fg_f, py, px
                    )
                else:
                    ms_y, ms_x, ms_mass = meanshift_refine_batch(fg_f, py, px)
                ms_ok = colliding & (ms_mass > 0)
                z = z.at[:, 0].set(jnp.where(ms_ok, ms_x, z[:, 0]))
                z = z.at[:, 1].set(jnp.where(ms_ok, ms_y, z[:, 1]))
        else:
            # 2') MS family: per-track mean-shift over the color
            # backprojection (windowed; see track/meanshift.py). Without a
            # frame the templates are uniform, so the weight degrades to
            # the FG mask. Detections below only feed births.
            from tracking_tpu.track.meanshift import (
                meanshift_color_refine,
                particle_color_refine,
            )

            frame_u8 = (
                frame
                if frame is not None
                else jnp.zeros(fg_mask.shape + (3,), jnp.uint8)
            )
            use_fg = ttype in ("MSFG", "MSPF") or frame is None
            if ttype == "MSPF":
                new_key, sub = jax.random.split(state.key)
                keys = jax.random.split(sub, K)
                ms_y, ms_x, mass = jax.vmap(
                    lambda h_, k_, y_, x_: particle_color_refine(
                        frame_u8, fg_f, h_, k_, y_, x_, use_fg
                    )
                )(state.hist, keys, pred_pos[:, 1], pred_pos[:, 0])
            else:
                ms_y, ms_x, mass = jax.vmap(
                    lambda h_, y_, x_: meanshift_color_refine(
                        frame_u8, fg_f, h_, y_, x_, use_fg
                    )
                )(state.hist, pred_pos[:, 1], pred_pos[:, 0])
            matched = state.active & (mass >= cfg.minTrackMass)
            z = jnp.stack(
                [ms_x, ms_y, jnp.maximum(pred_pos[:, 2], 0.0),
                 jnp.maximum(pred_pos[:, 3], 0.0)],
                axis=1,
            )
            # suppress detections covering tracked objects (entries only)
            d = jnp.linalg.norm(
                z[:, None, :2] - blob_pos[None, :, :2], axis=-1
            )
            scale = 0.5 * (
                jnp.maximum(z[:, None, 2:4].mean(-1), 1.0)
                + jnp.maximum(blob_pos[None, :, 2:4].mean(-1), 1.0)
            )
            near = (d / scale <= cfg.gateDistance) & matched[:, None]
            taken = jnp.any(near, axis=0)

        kx, kP = kalman.kalman_update(kx, kP, z, matched, self.kparams)

        lost = jnp.where(matched, 0, state.lost + state.active.astype(jnp.int32))
        active = state.active & (lost <= cfg.maxLostFrames)
        age = state.age + state.active.astype(jnp.int32)

        # 3) candidate logic (CC-detector temporal consistency):
        #    unmatched valid blobs either extend an existing candidate
        #    (within candidateGate of its last position) or open a new one.
        free_blob = blob_ok & ~taken
        cand_live = state.cand_age > 0
        dcand = jnp.linalg.norm(
            state.cand_pos[:, None, :2] - blob_pos[None, :, :2], axis=-1
        )
        cscale = jnp.maximum(state.cand_pos[:, None, 2:4].mean(-1), 4.0)
        cmatch = (dcand / cscale <= cfg.candidateGate) & cand_live[:, None] & free_blob[None, :]
        # first matching free blob per candidate
        has_cmatch = jnp.any(cmatch, axis=1)
        cblob = jnp.argmax(cmatch, axis=1)
        new_vel = blob_pos[cblob][:, :2] - state.cand_pos[:, :2]
        # BD_CC uniform-motion gate: from the 3rd detection on, the step must
        # match the previous step; a violating chain restarts at age 1
        if cfg.blobDetector.upper() == "BD_CC":
            vel_ok = (state.cand_age < 2) | (
                jnp.linalg.norm(new_vel - state.cand_vel, axis=-1)
                <= cfg.uniformMotionTol * cscale[:, 0]
            )
        else:  # BD_Simple: consecutive presence suffices
            vel_ok = jnp.ones_like(has_cmatch)
        cand_pos = jnp.where(
            has_cmatch[:, None], blob_pos[cblob], state.cand_pos
        )
        cand_vel = jnp.where(has_cmatch[:, None], new_vel, 0.0)
        cand_age = jnp.where(
            has_cmatch, jnp.where(vel_ok, state.cand_age + 1, 1), 0
        )
        # blobs consumed by candidates
        consumed = jnp.zeros_like(free_blob).at[cblob].max(has_cmatch)
        free_blob = free_blob & ~consumed

        # 4) new candidates from remaining blobs → empty candidate slots
        empty_cand = cand_age == 0
        cand_slot_rank = jnp.cumsum(empty_cand.astype(jnp.int32)) - 1
        blob_rank = jnp.cumsum(free_blob.astype(jnp.int32)) - 1
        # blob b goes to the (blob_rank[b])-th empty slot
        n_empty = jnp.sum(empty_cand)
        place = free_blob & (blob_rank < n_empty)
        # scatter: for each candidate slot, find the blob whose rank matches
        slot_ranks = jnp.where(empty_cand, cand_slot_rank, -1)
        # build mapping slot → blob index
        blob_for_rank = jnp.full((K,), -1, jnp.int32)
        blob_idx = jnp.arange(cfg.maxBlobs)
        blob_for_rank = blob_for_rank.at[
            jnp.clip(jnp.where(place, blob_rank, K - 1), 0, K - 1)
        ].max(jnp.where(place, blob_idx, -1))
        slot_blob = blob_for_rank[jnp.clip(slot_ranks, 0, K - 1)]
        new_cand = empty_cand & (slot_ranks >= 0) & (slot_blob >= 0)
        cand_pos = jnp.where(
            new_cand[:, None], blob_pos[jnp.clip(slot_blob, 0, cfg.maxBlobs - 1)], cand_pos
        )
        cand_age = jnp.where(new_cand, 1, cand_age)

        # 5) promote mature candidates → new tracks in free slots
        mature = cand_age >= cfg.newBlobDetectFrames
        free_track = ~active
        track_rank = jnp.cumsum(free_track.astype(jnp.int32)) - 1
        mature_rank = jnp.cumsum(mature.astype(jnp.int32)) - 1
        n_free = jnp.sum(free_track)
        promote_c = mature & (mature_rank < n_free)
        # candidate c → (mature_rank[c])-th free track slot
        cand_for_rank = jnp.full((K,), -1, jnp.int32)
        cand_idx = jnp.arange(K)
        cand_for_rank = cand_for_rank.at[
            jnp.clip(jnp.where(promote_c, mature_rank, K - 1), 0, K - 1)
        ].max(jnp.where(promote_c, cand_idx, -1))
        slot_cand = cand_for_rank[jnp.clip(track_rank, 0, K - 1)]
        birth = free_track & (slot_cand >= 0) & (track_rank < jnp.sum(promote_c))
        birth_pos = cand_pos[jnp.clip(slot_cand, 0, K - 1)]
        kx, kP = kalman.kalman_reset_slot(kx, kP, birth, birth_pos, self.kparams)
        n_birth = jnp.sum(birth)

        # MS family: capture the color template at birth
        hist = state.hist
        if ms_family:
            from tracking_tpu.track.meanshift import window_color_hist

            if frame is not None:
                bh = jax.vmap(
                    lambda y_, x_: window_color_hist(frame, fg_f, y_, x_)
                )(birth_pos[:, 1], birth_pos[:, 0])
            else:
                # no frame: all-ones template ⇒ weight = FG mask directly
                # (keeps the window mass in FG-pixel units for minTrackMass)
                bh = jnp.ones((K, 512), jnp.float32)
            hist = jnp.where(birth[:, None], bh, hist)
        birth_order = jnp.cumsum(birth.astype(jnp.int32)) - 1
        ids = jnp.where(birth, state.next_id + birth_order, state.ids)
        next_id = state.next_id + n_birth
        active = active | birth
        age = jnp.where(birth, 0, age)
        lost = jnp.where(birth, 0, lost)
        cand_age = jnp.where(promote_c, 0, cand_age)

        ids = jnp.where(active, ids, -1)
        new_state = TrackTable(
            active=active,
            ids=ids,
            kx=kx,
            kP=kP,
            age=age,
            lost=lost,
            cand_pos=cand_pos,
            cand_age=cand_age,
            next_id=next_id,
            hist=hist if ms_family else state.hist,
            key=new_key,
            cand_vel=cand_vel,
        )
        tracks = Tracks(
            active=active,
            ids=ids,
            x=kx[:, 0],
            y=kx[:, 1],
            w=jnp.maximum(kx[:, 2], 0.0),
            h=jnp.maximum(kx[:, 3], 0.0),
            rx=jnp.where(matched, z[:, 0], kx[:, 0]),
            ry=jnp.where(matched, z[:, 1], kx[:, 1]),
            rw=jnp.where(matched, z[:, 2], jnp.maximum(kx[:, 2], 0.0)),
            rh=jnp.where(matched, z[:, 3], jnp.maximum(kx[:, 3], 0.0)),
        )
        return new_state, tracks
