"""Per-algorithm 720p fps sweep on the TPU — writes SWEEP.json at the repo
root so the survey in PERF.md is backed by a machine-readable artifact.

Usage: python tools/sweep_fps.py [algo ...]   (defaults to every registered
algorithm; a partial run merges into the existing SWEEP.json)

Same timing discipline as bench.py: scan-based chunks, device→host scalar
checksum fetch as the completion barrier, real content frames. fps is
steady-state (best of 3 post-compile chunks); the per-dispatch fetch floor
(~0.2 ms/frame at the default 32-frame chunk) is NOT subtracted — these are
end-to-end deployable numbers, slightly conservative vs PERF.md's
floor-corrected stage analysis.
"""

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    import cv2
    import jax
    import jax.numpy as jnp

    from tracking_tpu.core.registry import list_algorithms
    from tracking_tpu.io.video import read_video
    from tracking_tpu.runner.scan import make_step_fn

    h, w = 720, 1280
    t_chunk = int(os.environ.get("BENCH_CHUNK", "32"))

    small = read_video("/root/reference/dataset/video.avi", max_frames=t_chunk + 1)
    big = np.stack([cv2.resize(f, (w, h)) for f in small[1 : t_chunk + 1]])
    frames = jnp.asarray(big)
    first = jnp.asarray(cv2.resize(np.asarray(small[0]), (w, h)))

    registry = list_algorithms()
    algos = sys.argv[1:] or sorted(registry)

    out_path = os.path.join(ROOT, "SWEEP.json")
    results = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f).get("algorithms", {})

    for name in algos:
        cls = registry[name]
        try:
            algo = cls()
            state0 = algo.init(h, w, 3)
            state0 = jax.jit(algo.warm_start)(state0, first)
            body = make_step_fn(algo)

            @jax.jit
            def run_chunk(state, fr):
                state, masks = jax.lax.scan(body, state, fr)
                return state, jnp.sum(masks.astype(jnp.uint32))

            t0 = time.perf_counter()
            st, chk = run_chunk(state0, frames)
            _ = int(chk)
            compile_s = time.perf_counter() - t0

            best = 0.0
            for _ in range(3):
                start = time.perf_counter()
                st, chk = run_chunk(st, frames)
                _ = int(chk)
                best = max(best, t_chunk / (time.perf_counter() - start))
            results[name] = round(best, 1)
            print(
                f"{name:36s} {best:8.1f} fps   "
                f"({1000/best:7.2f} ms/frame, compile {compile_s:.0f}s)",
                flush=True,
            )
        except Exception as e:  # keep sweeping
            results[name] = f"FAILED: {type(e).__name__}"
            print(f"{name:36s} FAILED: {type(e).__name__}: {e}", flush=True)

        with open(out_path, "w") as f:
            json.dump(
                {
                    "metric": "720p_bgs_fps_per_chip_by_algorithm",
                    "unit": "frames/sec",
                    "chunk": t_chunk,
                    "platform": jax.devices()[0].platform,
                    "algorithms": dict(sorted(results.items())),
                },
                f,
                indent=1,
            )
            f.write("\n")


if __name__ == "__main__":
    main()
