"""Golden C++ oracle comparison on the real TPU (exercises the Pallas path).

The CPU suite validates the XLA fallback; this module validates the deployed
fast path (Pallas consensus + aliased bank updates). Skipped automatically
off-TPU — run manually with the axon platform active:

    env TPU_GOLDEN=1 PYTHONPATH=/root/.axon_site python -m pytest tests/test_tpu_golden.py -q --no-header -p no:cacheprovider

(TPU_GOLDEN=1 makes tests/conftest.py skip its CPU pin — without it pytest
forces CPU no matter the cwd and every test here skips.)
"""

import os
import subprocess
import tempfile

import numpy as np
import pytest

VIDEO = "/root/reference/dataset/video.avi"
ORACLE = os.path.join(os.path.dirname(__file__), "oracle", "subsense_oracle")


@pytest.mark.parametrize(
    "algo,gray,n",
    [
        ("subsense", True, 50),
        ("subsense", False, 40),
        ("lobster", True, 50),
        ("lobster", False, 40),
    ],
)
def test_tpu_pallas_path_matches_reference_cpp(algo, gray, n):
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("requires the real TPU (Pallas path)")
    if not os.path.exists(ORACLE) or not os.path.exists(VIDEO):
        pytest.skip("oracle binary/fixtures unavailable")
    import cv2
    import jax.numpy as jnp

    from tracking_tpu.core.registry import get_algorithm
    from tracking_tpu.io.video import read_video
    from tracking_tpu.runner.scan import run_video

    with tempfile.TemporaryDirectory() as tmp:
        subprocess.run(
            [ORACLE, algo, VIDEO, tmp, str(n)] + (["gray"] if gray else []),
            check=True,
            capture_output=True,
        )
        ref = np.stack(
            [cv2.imread(os.path.join(tmp, f"mask_{i:04d}.png"), 0) for i in range(n)]
        )
    frames = read_video(VIDEO, max_frames=n, gray=gray)
    _, masks = run_video(get_algorithm(algo)(), jnp.asarray(frames))
    agree = (np.asarray(masks) == ref).mean()
    assert agree > 0.999, f"TPU-path agreement {agree:.5f}"


def test_tpu_texture_kernel_matches_reference_cpp():
    """DPTexture's fused Pallas path (round 4) vs the compiled reference
    C++ (family_oracle `texture`, dp/TextureBGS.cpp) on the real TPU —
    same 0.995 agreement gate as the CPU golden suite."""
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("requires the real TPU (Pallas path)")
    oracle = os.path.join(os.path.dirname(__file__), "oracle", "family_oracle")
    if not os.path.exists(oracle) or not os.path.exists(VIDEO):
        pytest.skip("oracle binary/fixtures unavailable")
    import cv2
    import jax.numpy as jnp

    from tracking_tpu.core.registry import get_algorithm
    from tracking_tpu.io.video import read_video
    from tracking_tpu.runner.scan import run_video

    n = 40
    with tempfile.TemporaryDirectory() as tmp:
        subprocess.run(
            [oracle, "texture", VIDEO, tmp, str(n)], check=True, capture_output=True
        )
        ref = np.stack(
            [cv2.imread(os.path.join(tmp, f"mask_{i:04d}.png"), 0) for i in range(n)]
        )
    frames = read_video(VIDEO, max_frames=n)
    _, masks = run_video(get_algorithm("DPTextureBGS")(), jnp.asarray(frames))
    agree = (np.asarray(masks) == ref).mean()
    assert agree > 0.995, f"TPU texture-path agreement {agree:.5f}"
