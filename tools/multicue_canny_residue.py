"""MultiCue: measure the per-ROI-Canny deviation's share of the golden
residue (VERDICT r4 #4).

The repo's SJN_MultiCueBGS runs Canny on the FULL reduced image and masks
edges per box; the reference (``SJN_MultiCueBGS.cpp:971-1056``,
EvaluateGhostRegion) crops each bounding box FIRST and runs cvCanny inside
the ROI — so gradients/hysteresis see replicated ROI borders, and edges
cannot propagate in from outside the box. The repo also scores the
partial Hausdorff against a chamfer field of full-image edges. This tool
quantifies what those deviations actually change:

- replays the repo implementation over the clip with the ghost-stage
  debug hook (bgs/multicue.py:_DEBUG_SINK) capturing, per frame, the
  reduced frame, the pre-ghost fore map, every candidate box and the
  repo's ghost verdicts;
- recomputes each box's verdict EXACTLY as the compiled oracle does:
  cv2 per-ROI Canny (the oracle binary links the same OpenCV 4.x) + the
  verbatim partial-undirected-Hausdorff (0.9 quantile of exact min
  distances, empty-set count fallbacks, > 10 ⇒ ghost);
- reports the flip count and the pixel mass of flipped boxes against the
  total golden residue (repo vs compiled C++ oracle over the same clip).

Writes MULTICUE_CANNY.json. Run on CPU:
  env PYTHONPATH=. JAX_PLATFORMS=cpu python tools/multicue_canny_residue.py
"""

import json
import os
import subprocess
import sys
import tempfile

import cv2
import numpy as np

sys.path.insert(0, ".")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 130
VIDEO = "/root/reference/dataset/video.avi"
ORACLE = os.path.join(os.path.dirname(__file__), "..", "tests", "oracle", "family_oracle")


def ref_hausdorff(edge_frame, edge_fore):
    """CalculateHausdorffDist verbatim (SJN_MultiCueBGS.cpp:1056-1110):
    0.9-quantile of per-model-point min distances; count fallbacks when
    either point set is empty."""
    pi = np.argwhere(edge_frame > 0)
    pm = np.argwhere(edge_fore > 0)
    if len(pi) == 0 and len(pm) > 0:
        return float(len(pm))
    if len(pi) > 0 and len(pm) == 0:
        return float(len(pi))
    if len(pi) == 0 and len(pm) == 0:
        return 0.0
    d2 = ((pm[:, None, :] - pi[None, :, :]) ** 2).sum(-1).min(axis=1)
    d2.sort()
    qidx = int(0.9 * len(d2))
    if qidx == len(d2):
        qidx -= 1
    return float(np.sqrt(d2[qidx]))


def main():
    import jax
    import jax.numpy as jnp

    import tracking_tpu.bgs.multicue as MC
    from tracking_tpu.core.registry import get_algorithm
    from tracking_tpu.io.video import read_video

    frames = read_video(VIDEO, max_frames=N)

    # golden residue vs the compiled C++ oracle (for the denominator)
    with tempfile.TemporaryDirectory() as tmp:
        subprocess.run(
            [ORACLE, "multicue", VIDEO, tmp, str(N)], check=True, capture_output=True
        )
        oracle_masks = np.stack(
            [cv2.imread(os.path.join(tmp, f"mask_{i:04d}.png"), 0) for i in range(N)]
        )

    dumps = []

    def sink(small_bgr, fore, left, right, upper, bottom, valid, ghost, nm, ni, close):
        dumps.append(
            dict(
                small=np.asarray(small_bgr),
                fore=np.asarray(fore),
                left=np.asarray(left),
                right=np.asarray(right),
                upper=np.asarray(upper),
                bottom=np.asarray(bottom),
                valid=np.asarray(valid),
                ghost=np.asarray(ghost),
            )
        )

    MC._DEBUG_SINK[0] = sink
    try:
        algo = get_algorithm("SJN_MultiCueBGS")()
        h, w, c = frames.shape[1:4]
        st = jax.jit(algo.warm_start)(algo.init(h, w, c), jnp.asarray(frames[0]))
        step = jax.jit(algo.step)
        masks = []
        for i, f in enumerate(frames):
            st, fg, _ = step(st, jnp.asarray(f))
            masks.append(np.asarray(fg))
            if i % 20 == 0:
                print(f"  frame {i}", flush=True)
        masks = np.stack(masks)
    finally:
        MC._DEBUG_SINK[0] = None

    residue = masks != oracle_masks
    residue_px = int(residue.sum())

    # per-box oracle verdicts on the repo's own inputs
    RH, RW = dumps[0]["fore"].shape
    scale_y, scale_x = (h / RH), (w / RW)
    total_boxes = flips = 0
    flip_px_upper_bound = 0
    flip_frames = set()
    for t, d in enumerate(dumps):
        for b in range(len(d["left"])):
            if not d["valid"][b]:
                continue
            l, r, u, bo = int(d["left"][b]), int(d["right"][b]), int(d["upper"][b]), int(d["bottom"][b])
            if r <= l or bo <= u:
                continue
            total_boxes += 1
            roi_bgr = d["small"][u:bo, l:r]
            gray = cv2.cvtColor(roi_bgr, cv2.COLOR_BGR2GRAY)
            edge_frame = cv2.Canny(gray, 100, 150)
            edge_fore = cv2.Canny(d["fore"][u:bo, l:r], 100, 150)
            ghost_ref = ref_hausdorff(edge_frame, edge_fore) > 10.0
            if bool(d["ghost"][b]) != ghost_ref:
                flips += 1
                flip_frames.add(t)
                # upper bound on affected mask pixels: the full box at
                # full resolution (the verdict erases/keeps the whole box)
                flip_px_upper_bound += int(
                    (bo - u) * scale_y * (r - l) * scale_x
                )

    out = {
        "n_frames": N,
        "golden_agreement": float((masks == oracle_masks).mean()),
        "residue_px": residue_px,
        "boxes_evaluated": total_boxes,
        "ghost_verdict_flips": flips,
        "flip_frames": sorted(flip_frames),
        "flip_px_upper_bound": flip_px_upper_bound,
        "canny_share_of_residue_upper_bound": (
            flip_px_upper_bound / residue_px if residue_px else 0.0
        ),
    }
    print(json.dumps(out, indent=1))
    with open("MULTICUE_CANNY.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
