"""Golden-mask test: USTC experimental shrinkBGS vs the reference's own
``ustc_src/shrinkBGS`` sources compiled in place (tests/oracle/shrink_oracle).

shrinkBGS is rand()-heavy (stochastic slot replacement + 3x3 neighbor
spread, shrinkbgs.cpp:408-435), so — exactly like the SuBSENSE golden suite
(tests/test_tpu_golden.py) — the gate is settled-mask agreement, not
bit-exactness: both models converge to near-identical sample banks on the
same content while individual slot draws differ.

Known structural deviations (documented in bgs/shrink.py): the scatter
neighbor-spread is reformulated as a gather (same per-pixel write
distribution), the bootstrap insert shares the self-update slot draw, and
the display-only "weighted" chain (which never touches the emitted mask,
shrinkbgs.cpp:72-89) is not implemented.

Build patches applied into temp copies (the reference tree is never
modified or vendored) are OpenCV 2.x->4.x mechanical rewrites only:
``<opencv/cv.hpp>`` (header removed in 4.x), ``cv::vector`` (2.x alias of
std::vector), unqualified ``string`` (2.x ``cv::string`` typedef), and
``static inline`` on the three free functions the header defines with
bodies (L1Check/img_cross/img_show) so a second TU can include it.
"""

import os
import subprocess

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from tracking_tpu.core.registry import get_algorithm
from tracking_tpu.io.video import read_video
from tracking_tpu.runner import run_video

ORACLE_DIR = os.path.join(os.path.dirname(__file__), "oracle")
ORACLE_BIN = os.path.join(ORACLE_DIR, "shrink_oracle")
USTC = "/root/reference/ustc_src/shrinkBGS"
VIDEO = "/root/reference/dataset/video.avi"
N = 130

_PATCHES = {
    f"{USTC}/shrinkbgs.h": [
        ("#include <opencv/cv.hpp>", ""),
        ("void drawHist(cv::vector<Vec3b> models);",
         "void drawHist(std::vector<Vec3b> models);"),
        ("bool L1Check(Vec3b input,Vec3b model,Vec3b threshold){",
         "static inline bool L1Check(Vec3b input,Vec3b model,Vec3b threshold){"),
        ("void img_cross(Mat &a,Mat &b,Mat &ret){",
         "static inline void img_cross(Mat &a,Mat &b,Mat &ret){"),
        ("cv::vector<Mat> mats1,mats2;", "std::vector<Mat> mats1,mats2;"),
        ("cv::vector<Mat> mats3;", "std::vector<Mat> mats3;"),
        ("void img_show(string str,Mat src){",
         "static inline void img_show(std::string str,Mat src){"),
    ],
    f"{USTC}/shrinkbgs.cpp": [
        ("cv::vector<Mat> mats1,mats2,mats3;",
         "std::vector<Mat> mats1,mats2,mats3;"),
        ("cv::vector<Vec3b> models;", "std::vector<Vec3b> models;"),
        ("void shrinkBGS::drawHist(cv::vector<Vec3b> models)",
         "void shrinkBGS::drawHist(std::vector<Vec3b> models)"),
    ],
}


def _ensure_oracle(tmpdir) -> bool:
    if os.path.exists(ORACLE_BIN):
        return True
    if not os.path.exists(f"{USTC}/shrinkbgs.cpp"):
        return False
    srcs = []
    for src, patches in _PATCHES.items():
        text = open(src, encoding="latin-1").read()
        for old, new in patches:
            assert old in text, f"patch anchor missing in {src}: {old!r}"
            text = text.replace(old, new)
        dst = os.path.join(str(tmpdir), os.path.basename(src))
        with open(dst, "w", encoding="latin-1") as f:
            f.write(text)
        srcs.append(dst)
    cv = subprocess.run(
        ["pkg-config", "--cflags", "--libs", "opencv4"],
        capture_output=True, text=True, check=True,
    ).stdout.split()
    try:
        subprocess.run(
            ["g++", "-O2", "-std=c++11", "-include", "cv4_shim.h",
             "-o", ORACLE_BIN, "shrink_oracle.cpp",
             os.path.join(str(tmpdir), "shrinkbgs.cpp"),
             f"-I{tmpdir}", f"-I{USTC}", "-I."] + cv,
            cwd=ORACLE_DIR, check=True, capture_output=True, text=True,
        )
        return True
    except subprocess.CalledProcessError as e:
        print(e.stderr[-4000:])
        return False


def test_golden_shrink_vs_reference_cpp(tmp_path):
    if not os.path.exists(VIDEO):
        pytest.skip("reference video unavailable")
    if not _ensure_oracle(tmp_path):
        pytest.skip("shrink oracle unavailable")
    out = str(tmp_path / "shrink_masks")
    os.makedirs(out, exist_ok=True)
    subprocess.run(
        [ORACLE_BIN, VIDEO, out, str(N)], check=True, capture_output=True
    )
    ref = np.stack(
        [cv2.imread(os.path.join(out, f"mask_{i:04d}.png"), 0) for i in range(N)]
    )
    frames = jnp.asarray(read_video(VIDEO, max_frames=N))
    algo = get_algorithm("shrinkBGS")()
    _, masks = run_video(algo, frames)
    masks = np.asarray(masks)
    # Early window (bootstrap phase, small FG): measured 0.968.
    early = slice(1, 30)
    agree_early = (masks[early] == ref[early]).mean()
    assert agree_early >= 0.95, f"early agreement {agree_early:.5f}"
    # Settled window: measured 0.933. On this fixture shrinkBGS (both
    # implementations) collapses into a ~50%-FG ghost regime — lr anneals
    # to 0 under the wide mask (shrinkbgs.cpp:502-505) so thresholds
    # freeze and FG sticks; independent stochastic draws then compound at
    # the huge mask boundary, which bounds achievable agreement well below
    # the deterministic families' 0.999 gates.
    settled = slice(40, N)
    agree = (masks[settled] == ref[settled]).mean()
    assert agree >= 0.90, f"settled agreement {agree:.5f}"
    # both implementations must be IN that regime (same FG magnitude)
    ref_fg = (ref[settled] > 0).mean()
    our_fg = (masks[settled] > 0).mean()
    assert abs(ref_fg - our_fg) < 0.08, (ref_fg, our_fg)
    # non-vacuity: the oracle saw real foreground in the window
    assert ref_fg > 0.005
