"""Per-algorithm 720p fps sweep on the TPU.

Usage: python tools/sweep_fps.py [algo ...]   (defaults to the un-surveyed set)

Same timing discipline as bench.py: scan-based chunks, device→host scalar
checksum fetch as the completion barrier, real content frames.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import cv2
    import jax
    import jax.numpy as jnp

    from tracking_tpu.core.registry import list_algorithms
    from tracking_tpu.io.video import read_video
    from tracking_tpu.runner.scan import make_step_fn

    h, w = 720, 1280
    t_chunk = int(os.environ.get("BENCH_CHUNK", "8"))

    small = read_video("/root/reference/dataset/video.avi", max_frames=t_chunk + 1)
    big = np.stack([cv2.resize(f, (w, h)) for f in small[1 : t_chunk + 1]])
    frames = jnp.asarray(big)
    first = jnp.asarray(cv2.resize(np.asarray(small[0]), (w, h)))

    algos = sys.argv[1:] or [
        "DPAdaptiveMedianBGS", "DPMeanBGS", "DPWrenGABGS", "SigmaDeltaBGS",
        "DPPratiMediodBGS", "DPEigenbackgroundBGS", "IndependentMultimodalBGS",
        "DPTextureBGS", "MultiLayerBGS", "shrinkBGS", "SJN_MultiCueBGS",
        "LbpMrf", "subsenseShrink", "FuzzySugenoIntegral",
        "FuzzyChoquetIntegral", "T2FMRF_UM",
    ]
    registry = list_algorithms()
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
            print(f"{name:36s} {best:8.1f} fps   ({1000/best:7.2f} ms/frame, compile {compile_s:.0f}s)", flush=True)
        except Exception as e:  # keep sweeping
            print(f"{name:36s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
