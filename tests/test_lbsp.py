"""LBSP family: descriptor unit tests + golden tests vs the compiled
reference C++ (tests/oracle/subsense_oracle.cpp builds the reference sources
in place from /root/reference)."""

import os
import subprocess
import tempfile

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from tracking_tpu.core.registry import get_algorithm
from tracking_tpu.ops import lbsp
from tracking_tpu.runner import run_video

ORACLE_DIR = os.path.join(os.path.dirname(__file__), "oracle")
ORACLE_BIN = os.path.join(ORACLE_DIR, "subsense_oracle")
REF_PL = "/root/reference/package_bgs/pl"
VIDEO = "/root/reference/dataset/video.avi"

# LBSP bit offsets from LBSP_16bits_dbcross_1ch.i:27-42, (x, y) per bit 0..15
_REF_OFFSETS = {
    15: (-1, 1), 14: (1, -1), 13: (1, 1), 12: (-1, -1),
    11: (1, 0), 10: (0, -1), 9: (-1, 0), 8: (0, 1),
    7: (-2, -2), 6: (2, 2), 5: (2, -2), 4: (-2, 2),
    3: (0, 2), 2: (0, -2), 1: (2, 0), 0: (-2, 0),
}


def oracle_lbsp(img, ref, thr):
    """Direct numpy restatement of the reference's bit layout."""
    H, W = img.shape
    out = np.zeros((H, W), np.uint16)
    for bit, (x, y) in _REF_OFFSETS.items():
        ys = np.clip(np.arange(H)[:, None] + y, 0, H - 1)
        xs = np.clip(np.arange(W)[None, :] + x, 0, W - 1)
        val = img[ys, xs].astype(np.int32)
        out |= ((np.abs(val - ref.astype(np.int32)) > thr).astype(np.uint16)) << bit
    return out


def test_descriptor_matches_reference_layout(rng):
    img = rng.integers(0, 256, (32, 48), dtype=np.uint8)
    ref = rng.integers(0, 256, (32, 48), dtype=np.uint8)
    thr = np.full((32, 48), 20, np.int32)
    ours = np.asarray(
        lbsp.pack_bits(
            lbsp.descriptor_bits(lbsp.neighbor_stack(jnp.asarray(img)), jnp.asarray(ref), jnp.asarray(thr))
        )
    )
    want = oracle_lbsp(img, ref, thr)
    b = lbsp.BORDER
    np.testing.assert_array_equal(ours[b:-b, b:-b], want[b:-b, b:-b])


def test_popcount16(rng):
    x = rng.integers(0, 1 << 16, (100,), dtype=np.uint16)
    ours = np.asarray(lbsp.popcount16(jnp.asarray(x)))
    want = np.array([bin(v).count("1") for v in x])
    np.testing.assert_array_equal(ours, want)


def _ensure_oracle():
    if os.path.exists(ORACLE_BIN):
        return True
    if not os.path.exists(os.path.join(REF_PL, "BackgroundSubtractorSuBSENSE.cpp")):
        return False
    try:
        subprocess.run(
            [
                "g++", "-O2", "-std=c++11", "-include", "cv4_shim.h",
                "-o", "subsense_oracle", "subsense_oracle.cpp",
                f"{REF_PL}/BackgroundSubtractorSuBSENSE.cpp",
                f"{REF_PL}/BackgroundSubtractorLOBSTER.cpp",
                f"{REF_PL}/BackgroundSubtractorLBSP.cpp",
                f"{REF_PL}/LBSP.cpp",
                f"-I{REF_PL}", "-I.",
            ]
            + subprocess.run(
                ["pkg-config", "--cflags", "--libs", "opencv4"],
                capture_output=True, text=True, check=True,
            ).stdout.split(),
            cwd=ORACLE_DIR, check=True, capture_output=True,
        )
        return True
    except Exception:
        return False


@pytest.mark.parametrize(
    "algo_name,gray,n",
    [("subsense", True, 50), ("lobster", True, 50), ("subsense", False, 40)],
)
def test_golden_vs_reference_cpp(algo_name, gray, n):
    """Masks must agree with the compiled reference C++ at ≥99.9% of pixels
    (the residue is the stochastic rand() model updates)."""
    if not _ensure_oracle() or not os.path.exists(VIDEO):
        pytest.skip("reference oracle unavailable")
    with tempfile.TemporaryDirectory() as tmp:
        subprocess.run(
            [ORACLE_BIN, algo_name, VIDEO, tmp, str(n)] + (["gray"] if gray else []),
            check=True, capture_output=True,
        )
        ref = np.stack(
            [cv2.imread(os.path.join(tmp, f"mask_{i:04d}.png"), 0) for i in range(n)]
        )
    from tracking_tpu.io.video import read_video

    frames = read_video(VIDEO, max_frames=n, gray=gray)
    algo = get_algorithm(algo_name)()
    _, masks = run_video(algo, jnp.asarray(frames))
    masks = np.asarray(masks)
    agree = (masks == ref).mean()
    assert agree > 0.999, f"{algo_name}: agreement {agree:.5f}"
