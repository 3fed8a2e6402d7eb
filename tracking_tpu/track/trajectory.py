"""Trajectory generation, post-processing, and analysis.

Capability parity with the reference's module registries
(``ustc_src/trackingMain.cpp:37-132``):

- BlobTrackGen (YML / RawTracks, :640-650) → ``TrackRecorder``: host-side
  accumulation of per-frame track states, saved as YAML-like or CSV track
  files (track state save/load parity with ``trackingMain.cpp:685-758``).
- BlobTrackPostProc (Kalman, :653-662) is already folded into the tracker's
  Kalman bank (the emitted positions are the filtered states).
- BlobTrackAnalysis (HistPVS etc., :667-677) → ``TrajectoryAnalysis``:
  position/velocity histograms per scene with per-track abnormality scoring —
  the legacy "Histogram P V S" analyzers build 5-D sparse histograms of
  (position, velocity, state duration) and flag low-probability tracks.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Dict, List

import numpy as np


@dataclass
class TrackRecorder:
    """Accumulates (frame, id, x, y, w, h) rows; writes tracks files."""

    rows: List[tuple] = field(default_factory=list)

    def record(self, frame_idx: int, tracks, raw: bool = False) -> None:
        """raw=True records the pre-Kalman blob measurements (the
        BlobTrackPostProc=None path); default records the filtered states."""
        active = np.asarray(tracks.active)
        ids = np.asarray(tracks.ids)
        if raw:
            xs, ys = np.asarray(tracks.rx), np.asarray(tracks.ry)
            ws, hs = np.asarray(tracks.rw), np.asarray(tracks.rh)
        else:
            xs, ys = np.asarray(tracks.x), np.asarray(tracks.y)
            ws, hs = np.asarray(tracks.w), np.asarray(tracks.h)
        for k in np.nonzero(active)[0]:
            self.rows.append(
                (int(frame_idx), int(ids[k]), float(xs[k]), float(ys[k]), float(ws[k]), float(hs[k]))
            )

    def tracks_by_id(self) -> Dict[int, List[tuple]]:
        out: Dict[int, List[tuple]] = {}
        for row in self.rows:
            out.setdefault(row[1], []).append(row)
        return out

    def save_csv(self, path: str) -> None:
        """RawTracks-style output: frame,id,x,y,w,h per line."""
        with open(path, "w") as fh:
            fh.write("frame,id,x,y,w,h\n")
            for r in self.rows:
                fh.write("%d,%d,%.2f,%.2f,%.2f,%.2f\n" % r)

    def save_yml(self, path: str) -> None:
        """YML-style per-track sequences (BlobTrackGen YML parity)."""
        data = {
            f"track_{tid}": [
                {"frame": f, "x": x, "y": y, "w": w, "h": h}
                for (f, _tid, x, y, w, h) in rows
            ]
            for tid, rows in self.tracks_by_id().items()
        }
        with open(path, "w") as fh:
            json.dump(data, fh, indent=1)

    @classmethod
    def load_csv(cls, path: str) -> "TrackRecorder":
        rec = cls()
        with open(path) as fh:
            next(fh)
            for line in fh:
                f, i, x, y, w, h = line.strip().split(",")
                rec.rows.append((int(f), int(i), float(x), float(y), float(w), float(h)))
        return rec


class TrajectoryAnalysis:
    """Histogram-based trajectory analysis (the legacy HistP/HistPV/HistPVS
    family, ``cvCreateModuleBlobTrackAnalysisHist*``).

    Builds 2-D position / velocity / size histograms over all observed track
    states; a track's abnormality score is the mean negative log-frequency of
    its states — low-probability trajectories score high, mirroring the
    legacy analyzers' "abnormal track" flag. The P/PV/PVS variants enable the
    position, +velocity, +size (state) feature sets respectively
    (``trackingMain.cpp:110-121``)."""

    def __init__(
        self,
        frame_w: int,
        frame_h: int,
        pos_bins: int = 16,
        vel_bins: int = 9,
        size_bins: int = 9,
        use_vel: bool = True,
        use_size: bool = False,
    ):
        self.frame_w, self.frame_h = frame_w, frame_h
        self.pos_bins, self.vel_bins, self.size_bins = pos_bins, vel_bins, size_bins
        self.use_vel, self.use_size = use_vel, use_size
        self.pos_hist = np.zeros((pos_bins, pos_bins), np.float64)
        self.vel_hist = np.zeros((vel_bins, vel_bins), np.float64)
        self.size_hist = np.zeros((size_bins, size_bins), np.float64)
        self.total = 0

    @classmethod
    def hist_p(cls, frame_w, frame_h):
        return cls(frame_w, frame_h, use_vel=False, use_size=False)

    @classmethod
    def hist_pv(cls, frame_w, frame_h):
        return cls(frame_w, frame_h, use_vel=True, use_size=False)

    @classmethod
    def hist_pvs(cls, frame_w, frame_h):
        return cls(frame_w, frame_h, use_vel=True, use_size=True)

    def _pos_bin(self, x, y):
        bx = np.clip((x / self.frame_w * self.pos_bins).astype(int), 0, self.pos_bins - 1)
        by = np.clip((y / self.frame_h * self.pos_bins).astype(int), 0, self.pos_bins - 1)
        return bx, by

    def _vel_bin(self, vx, vy):
        half = self.vel_bins // 2
        scale = self.frame_w / 64.0
        bx = np.clip(np.round(vx / scale).astype(int) + half, 0, self.vel_bins - 1)
        by = np.clip(np.round(vy / scale).astype(int) + half, 0, self.vel_bins - 1)
        return bx, by

    def _size_bin(self, w, h):
        bw = np.clip((w / self.frame_w * self.size_bins).astype(int), 0, self.size_bins - 1)
        bh = np.clip((h / self.frame_h * self.size_bins).astype(int), 0, self.size_bins - 1)
        return bw, bh

    def update(self, recorder: TrackRecorder) -> None:
        for tid, rows in recorder.tracks_by_id().items():
            arr = np.array([(x, y, w, h) for (_f, _i, x, y, w, h) in rows])
            if len(arr) < 2:
                continue
            bx, by = self._pos_bin(arr[:, 0], arr[:, 1])
            np.add.at(self.pos_hist, (by, bx), 1)
            if self.use_vel:
                vel = np.diff(arr[:, :2], axis=0)
                vbx, vby = self._vel_bin(vel[:, 0], vel[:, 1])
                np.add.at(self.vel_hist, (vby, vbx), 1)
            if self.use_size:
                sbw, sbh = self._size_bin(arr[:, 2], arr[:, 3])
                np.add.at(self.size_hist, (sbh, sbw), 1)
            self.total += len(arr)

    def abnormality(self, recorder: TrackRecorder) -> Dict[int, float]:
        eps = 1e-9
        p_pos = self.pos_hist / max(self.pos_hist.sum(), 1)
        p_vel = self.vel_hist / max(self.vel_hist.sum(), 1)
        p_size = self.size_hist / max(self.size_hist.sum(), 1)
        scores: Dict[int, float] = {}
        for tid, rows in recorder.tracks_by_id().items():
            arr = np.array([(x, y, w, h) for (_f, _i, x, y, w, h) in rows])
            if len(arr) < 2:
                scores[tid] = 0.0
                continue
            bx, by = self._pos_bin(arr[:, 0], arr[:, 1])
            nll = -np.log(p_pos[by, bx] + eps).mean()
            if self.use_vel:
                vel = np.diff(arr[:, :2], axis=0)
                vbx, vby = self._vel_bin(vel[:, 0], vel[:, 1])
                nll -= np.log(p_vel[vby, vbx] + eps).mean()
            if self.use_size:
                sbw, sbh = self._size_bin(arr[:, 2], arr[:, 3])
                nll -= np.log(p_size[sbh, sbw] + eps).mean()
            scores[tid] = float(nll)
        return scores


class StartStopAnalysis:
    """HistSS analog (``cvCreateModuleBlobTrackAnalysisHistSS``): 2-D
    histograms over each track's start and stop positions; a track whose
    (start, stop) pair is rare scores as abnormal."""

    def __init__(self, frame_w: int, frame_h: int, bins: int = 16):
        self.frame_w, self.frame_h, self.bins = frame_w, frame_h, bins
        self.hist = np.zeros((bins, bins, bins, bins), np.float64)

    def _bin(self, x, y):
        bx = int(np.clip(x / self.frame_w * self.bins, 0, self.bins - 1))
        by = int(np.clip(y / self.frame_h * self.bins, 0, self.bins - 1))
        return bx, by

    def update(self, recorder: TrackRecorder) -> None:
        for _tid, rows in recorder.tracks_by_id().items():
            (x0, y0) = rows[0][2], rows[0][3]
            (x1, y1) = rows[-1][2], rows[-1][3]
            b = self._bin(x0, y0) + self._bin(x1, y1)
            self.hist[b] += 1

    def abnormality(self, recorder: TrackRecorder) -> Dict[int, float]:
        p = self.hist / max(self.hist.sum(), 1)
        out: Dict[int, float] = {}
        for tid, rows in recorder.tracks_by_id().items():
            b = self._bin(rows[0][2], rows[0][3]) + self._bin(rows[-1][2], rows[-1][3])
            out[tid] = float(-np.log(p[b] + 1e-9))
        return out


class TrackDistAnalysis:
    """TrackDist analog (``cvCreateModuleBlobTrackAnalysisTrackDist``):
    a track is normal when a previously-seen track follows a similar path —
    score = distance to the nearest stored trajectory (resampled to a fixed
    number of waypoints, mean Euclidean)."""

    def __init__(self, n_points: int = 16):
        self.n = n_points
        self.templates: List[np.ndarray] = []

    def _resample(self, rows) -> np.ndarray:
        arr = np.array([(x, y) for (_f, _i, x, y, _w, _h) in rows], np.float64)
        if len(arr) == 1:
            return np.repeat(arr, self.n, axis=0)
        t = np.linspace(0, len(arr) - 1, self.n)
        i0 = np.floor(t).astype(int)
        i1 = np.minimum(i0 + 1, len(arr) - 1)
        w = (t - i0)[:, None]
        return arr[i0] * (1 - w) + arr[i1] * w

    def update(self, recorder: TrackRecorder) -> None:
        for _tid, rows in recorder.tracks_by_id().items():
            if len(rows) >= 2:
                self.templates.append(self._resample(rows))

    def abnormality(self, recorder: TrackRecorder) -> Dict[int, float]:
        out: Dict[int, float] = {}
        for tid, rows in recorder.tracks_by_id().items():
            q = self._resample(rows)
            if not self.templates:
                out[tid] = 0.0
                continue
            dists = [
                float(np.linalg.norm(q - t, axis=1).mean()) for t in self.templates
            ]
            # skip the self-match (distance 0) when the track is stored
            dists = sorted(dists)
            d = dists[1] if len(dists) > 1 and dists[0] < 1e-9 else dists[0]
            out[tid] = d
        return out


class IORAnalysis:
    """IOR analog (``cvCreateModuleBlobTrackAnalysisIOR``): the legacy
    "integrator of rules" runs several sub-analyzers and flags a track
    abnormal if any rule does. Here: the max of the sub-analyzers'
    normalized abnormality scores (HistP + HistSS + TrackDist by default)."""

    def __init__(self, frame_w: int, frame_h: int, subs=None):
        self.subs = subs or [
            TrajectoryAnalysis.hist_p(frame_w, frame_h),
            StartStopAnalysis(frame_w, frame_h),
            TrackDistAnalysis(),
        ]

    def update(self, recorder: TrackRecorder) -> None:
        for s in self.subs:
            s.update(recorder)

    def abnormality(self, recorder: TrackRecorder) -> Dict[int, float]:
        per = [s.abnormality(recorder) for s in self.subs]
        out: Dict[int, float] = {}
        for tid in recorder.tracks_by_id():
            vals = []
            for scores in per:
                v = scores.get(tid, 0.0)
                mx = max(scores.values()) if scores else 0.0
                vals.append(v / mx if mx > 0 else 0.0)
            out[tid] = float(max(vals)) if vals else 0.0
        return out


def make_analysis(name: str, frame_w: int, frame_h: int):
    """Trajectory-analysis module registry by reference nickname
    (``trackingMain.cpp:110-121``): HistPVS (default), HistP, HistPV,
    HistSS, TrackDist, IOR, or None."""
    key = (name or "none").lower()
    if key == "histpvs":
        return TrajectoryAnalysis.hist_pvs(frame_w, frame_h)
    if key == "histp":
        return TrajectoryAnalysis.hist_p(frame_w, frame_h)
    if key == "histpv":
        return TrajectoryAnalysis.hist_pv(frame_w, frame_h)
    if key == "histss":
        return StartStopAnalysis(frame_w, frame_h)
    if key == "trackdist":
        return TrackDistAnalysis()
    if key == "ior":
        return IORAnalysis(frame_w, frame_h)
    if key == "none":
        return None
    raise ValueError(f"unknown trajectory analysis {name!r}")
