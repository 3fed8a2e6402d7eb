"""Golden-mask tests vs the compiled reference C++ for the deterministic
BGS families (VERDICT round-1 item 4).

``tests/oracle/family_oracle.cpp`` compiles the reference's own dp / tb /
lb / av / db / bl / root-package sources in place from /root/reference
(never vendored) and replays each IBGS wrapper's exact call sequence and
constructor defaults; ``lbpmrf_oracle.cpp`` does the same for the ck
package. The family-oracle algorithms are rand()-free, so the gates are
tight:
measured agreement on dataset/video.avi (130 frames, color) is bit-exact
for most and ≥0.998 for the rest (the residue is float-accumulation
ordering in the temporal-mediod / SOM distance sums).

Reference call sequences: DPAdaptiveMedianBGS.cpp:46-75 (dp),
LBAdaptiveSOM.cpp:40-58 (lb), VuMeter.cpp:33-70 (av),
IndependentMultimodalBGS.cpp (db), T2FGMM_UM.cpp (tb).

Two reference bugs are sequential raster-order artifacts with no parallel
meaning, so four algorithms are *dual-gated* — a loose gate against the
verbatim reference plus a tight gate against a second oracle binary built
with only the buggy line corrected (patch applied programmatically at
build time in a temp dir; the reference source tree is never modified or
vendored):

1. ``tb/T2FMRF.cpp:331`` — the post-new-mode renormalization reads
   ``m_modes[posPixel + iLocal].weight`` (pixel index) instead of
   ``posGMode + iLocal`` (mode-array base), i.e. the significants fed to
   the second qsort come from an *earlier pixel's already-updated mode*.
   With only that index fixed, our T2FMRF_UM/UV agree 0.9999998 / 1.0.
2. ``tb/FuzzyUtils.cpp:449-457`` — ``Trier``'s ``index`` array is never
   re-initialized between pixels, so each pixel's sort permutation is
   composed onto the previous pixel's down the column-major walk (the
   comment at :429 says it is "supposé initialisé" per call). With an
   identity init per call, FuzzySugeno/Choquet agree ≥0.9998 (residue:
   the ``getNeighberhoodGrayPixel`` stale-slot anomaly at the interior
   column x == image height, PixelUtils.cpp:209-219, recurrently fed
   back through the background model).
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
ORACLE_BIN = os.path.join(ORACLE_DIR, "family_oracle")
ORACLE_BIN_FIXED = os.path.join(ORACLE_DIR, "family_oracle_fixed")
REF = "/root/reference/package_bgs"
VIDEO = "/root/reference/dataset/video.avi"
N = 130

# (oracle subcommand, registry name, min agreement vs verbatim reference,
#  min agreement vs intent-fixed reference or None)
CASES = [
    ("adaptive_median", "DPAdaptiveMedianBGS", 1.0, None),
    ("grimson_gmm", "DPGrimsonGMMBGS", 1.0, None),
    ("zivkovic", "DPZivkovicAGMMBGS", 1.0, None),
    ("mean", "DPMeanBGS", 1.0, None),
    ("wren_ga", "DPWrenGABGS", 1.0, None),
    ("prati_mediod", "DPPratiMediodBGS", 0.995, None),
    ("eigenbackground", "DPEigenbackgroundBGS", 1.0, None),
    ("t2fgmm_um", "T2FGMM_UM", 1.0, None),
    ("t2fgmm_uv", "T2FGMM_UV", 1.0, None),
    ("lb_gauss", "LBSimpleGaussian", 1.0, None),
    ("lb_fuzzygauss", "LBFuzzyGaussian", 1.0, None),
    ("lb_mog", "LBMixtureOfGaussians", 1.0, None),
    ("lb_som", "LBAdaptiveSOM", 0.9999, None),
    ("lb_fuzzysom", "LBFuzzyAdaptiveSOM", 0.9999, None),
    ("vumeter", "VuMeter", 1.0, None),
    # round-2 additions (wrapper sequences: T2FMRF_UM.cpp:46-123,
    # FuzzySugenoIntegral.cpp:31-170, SigmaDeltaBGS.cpp:20-55,
    # DPTextureBGS.cpp:39-133). Dual gates per the module docstring.
    ("t2fmrf_um", "T2FMRF_UM", 0.999, 0.9999),
    ("t2fmrf_uv", "T2FMRF_UV", 0.995, 0.9999),
    ("fuzzy_sugeno", "FuzzySugenoIntegral", 0.99, 0.9995),
    ("fuzzy_choquet", "FuzzyChoquetIntegral", 0.999, 0.9995),
    ("sigma_delta", "SigmaDeltaBGS", 1.0, None),
    ("texture", "DPTextureBGS", 0.995, None),
    # round-2 additions, complex families (KDE.cpp:34-96 with the
    # uninitialized UpdateBGFlag pinned to SetUpdateFlag(1) — see
    # family_oracle.cpp run_kde; SJN_MultiCueBGS::process is itself the
    # wrapper — measured 0.9889, residue = the documented structural
    # deviations in bgs/multicue.py: fixed-capacity codebooks, full-image
    # Canny, chamfer Hausdorff, 64-box cap; see the round-4 residue
    # profile in that docstring — near-exact before frame 60, motion-peak
    # blob-boundary/interior divergence after, no whole-box ghost flips).
    ("kde", "KDE", 0.9995, None),
    # gate tightened 0.98 -> 0.985 in round 4 (deterministic algorithm on a
    # fixed clip; 0.9889 measured, so the gate locks the achieved level).
    # CI-triage note (ADVICE r4): the ~0.004 margin is intentional — the
    # algorithm is rand()-free but agreement compares two float stacks
    # (XLA vs the compiled OpenCV oracle), so a toolchain change can move
    # the measured value by ~1e-3; if this gate flakes after an upgrade,
    # re-measure before suspecting a regression. Round 5 pinned the
    # per-ROI-Canny deviation at ≤ 2.1 % of the residue
    # (MULTICUE_CANNY.json; bgs/multicue.py docstring) — the remaining
    # residue is the documented capacity/chamfer/reduced-res terms.
    ("multicue", "SJN_MultiCueBGS", 0.985, None),
    # round-2 additions, root package (process() is the whole algorithm —
    # FrameDifferenceBGS.cpp:29-60 and siblings; MyBGS.cpp:6-28). All
    # rand()-free; the float ones get a hair of slack for accumulation /
    # saturate_cast rounding order.
    ("framediff", "FrameDifferenceBGS", 1.0, None),
    ("staticdiff", "StaticFrameDifferenceBGS", 1.0, None),
    ("wmm", "WeightedMovingMeanBGS", 0.9999, None),
    ("wmv", "WeightedMovingVarianceBGS", 0.9999, None),
    # abl/asbl measured 0.99975 / 0.99990: cv::MatExpr evaluates the
    # recurrent f32 background blend via addWeighted, whose per-element
    # multiply-accumulate runs in DOUBLE before the f32 store; our blend is
    # f32 end-to-end (no f64 on TPU), so ~2e-4 of pixels land on the other
    # side of the cvRound half-boundary after the u8 roundtrip.
    ("abl", "AdaptiveBackgroundLearning", 0.9995, None),
    ("asbl", "AdaptiveSelectiveBackgroundLearning", 0.9997, None),
    ("mybgs", "MyBGS", 1.0, None),
]

_SRCS = (
    [f"{REF}/dp/{n}.cpp" for n in (
        "AdaptiveMedianBGS", "GrimsonGMM", "ZivkovicAGMM", "MeanBGS",
        "WrenGA", "PratiMediodBGS", "Eigenbackground", "Image", "Error")]
    + [f"{REF}/tb/{n}.cpp" for n in (
        "T2FGMM", "T2FMRF", "MRF", "FuzzyUtils", "PixelUtils")]
    + [f"{REF}/dp/TextureBGS.cpp", f"{REF}/bl/sdLaMa091.cpp"]
    + [f"{REF}/lb/{n}.cpp" for n in (
        "BGModel", "BGModelGauss", "BGModelFuzzyGauss", "BGModelMog",
        "BGModelSom", "BGModelFuzzySom")]
    + [f"{REF}/av/TBackground.cpp", f"{REF}/av/TBackgroundVuMeter.cpp"]
    + [f"{REF}/db/imbs.cpp"]
    + [f"{REF}/ae/{n}.cpp" for n in ("NPBGSubtractor", "NPBGmodel", "KernelTable")]
    + [f"{REF}/sjn/SJN_MultiCueBGS.cpp"]
    + [f"{REF}/jmo/{n}.cpp" for n in (
        "MultiLayerBGS", "CMultiLayerBGS", "LocalBinaryPattern",
        "blob", "BlobResult", "BlobExtraction")]
    + [f"{REF}/{n}.cpp" for n in (
        "FrameDifferenceBGS", "StaticFrameDifferenceBGS",
        "WeightedMovingMeanBGS", "WeightedMovingVarianceBGS",
        "AdaptiveBackgroundLearning", "AdaptiveSelectiveBackgroundLearning")]
    + [f"{REF}/my/MyBGS.cpp"]
)

# OpenCV-4 API compatibility patches (2.x constructs removed in 4.x:
# IplImage(cv::Mat) / Mat(IplImage*) constructors). Pure mechanical
# rewrites with identical semantics, applied at build time into a temp
# copy for BOTH oracle binaries; a missing anchor is a hard error.
_COMPAT_PATCHES = {
    f"{REF}/sjn/SJN_MultiCueBGS.cpp": [
        ("IplImage* frame = new IplImage(img_input);",
         "IplImage frame_ipl = cvIplImage(img_input);"
         " IplImage* frame = &frame_ipl;"),
        ("delete frame;", "(void)frame;"),
        ("cv::Mat temp(result_image, TRUE);",
         "cv::Mat temp = cv::cvarrToMat(result_image, true);"),
        ("cv::Mat temp_img(frame, TRUE);",
         "cv::Mat temp_img = cv::cvarrToMat(frame, true);"),
        ("IplImage* img = new IplImage(temp_img);",
         "IplImage img_ipl = cvIplImage(temp_img); IplImage* img = &img_ipl;"),
        ("delete img;", "(void)img;"),
    ],
    f"{REF}/jmo/MultiLayerBGS.cpp": [
        ("org_img = new IplImage(img_input);",
         "{ IplImage org_ipl = cvIplImage(img_input);"
         " org_img = cvCloneImage(&org_ipl); }"),
        ("delete org_img;", "cvReleaseImage(&org_img);"),
        ("IplImage* img = new IplImage(img_input);",
         "IplImage img_ipl = cvIplImage(img_input); IplImage* img = &img_ipl;"),
        ("delete img;", "(void)img;"),
        ("img_merged = cv::Mat(merged_img);",
         "img_merged = cv::cvarrToMat(merged_img);"),
        ("img_foreground = cv::Mat(fg_mask_img);",
         "img_foreground = cv::cvarrToMat(fg_mask_img);"),
        ("img_background = cv::Mat(bg_img);",
         "img_background = cv::cvarrToMat(bg_img);"),
    ],
}

# One-line intent fixes for the two sequential-artifact bugs (see module
# docstring). Applied with str.replace into a build-time temp copy; an
# un-applied patch is a hard error so silent drift of the reference text
# can't produce a vacuous "fixed" oracle.
_FIXED_PATCHES = {
    f"{REF}/tb/T2FMRF.cpp": [(
        "m_modes[posGMode + iLocal].significants = "
        "m_modes[posPixel + iLocal].weight",
        "m_modes[posGMode + iLocal].significants = "
        "m_modes[posGMode + iLocal].weight",
    )],
    f"{REF}/tb/FuzzyUtils.cpp": [(
        "void FuzzyUtils::Trier(float* g,int n,int* index)\n{",
        "void FuzzyUtils::Trier(float* g,int n,int* index)\n{\n"
        "  for(int z = 0; z < n; z++) *(index+z) = z;"
        "  // intent fix: identity init per call\n",
    )],
}


def _compile_oracle(out_bin, srcs):
    cv = subprocess.run(
        ["pkg-config", "--cflags", "--libs", "opencv4"],
        capture_output=True, text=True, check=True,
    ).stdout.split()
    subprocess.run(
        ["g++", "-O2", "-std=c++11", "-include", "cv4_shim.h",
         "-o", out_bin, "family_oracle.cpp"] + srcs
        + [f"-I{REF}/{d}" for d in (
            "dp", "tb", "lb", "av", "db", "bl", "ae", "sjn", "jmo", "my")]
        + [f"-I{REF}"]
        + ["-I."] + cv,
        cwd=ORACLE_DIR, check=True, capture_output=True,
    )


def _prepared_srcs(tmpdir, *patch_sets):
    """Source list with the given patch dicts applied into temp copies
    (headers stay in place, so relative includes still resolve against the
    reference tree)."""
    srcs = []
    for src in _SRCS:
        patches = [p for ps in patch_sets for p in ps.get(src, [])]
        if patches:
            text = open(src, encoding="latin-1").read()
            for old, new in patches:
                assert old in text, f"patch anchor missing in {src}"
                text = text.replace(old, new)
            dst = os.path.join(str(tmpdir), os.path.basename(src))
            with open(dst, "w", encoding="latin-1") as f:
                f.write(text)
            srcs.append(dst)
        else:
            srcs.append(src)
    return srcs


def _ensure_oracle(tmpdir=None) -> bool:
    if os.path.exists(ORACLE_BIN):
        return True
    if not os.path.exists(f"{REF}/dp/AdaptiveMedianBGS.cpp") or tmpdir is None:
        return False
    try:
        _compile_oracle(
            "family_oracle", _prepared_srcs(tmpdir, _COMPAT_PATCHES)
        )
        return True
    except Exception:
        return False


def _ensure_fixed_oracle(tmpdir) -> bool:
    if os.path.exists(ORACLE_BIN_FIXED):
        return True
    if not os.path.exists(f"{REF}/dp/AdaptiveMedianBGS.cpp"):
        return False
    try:
        _compile_oracle(
            ORACLE_BIN_FIXED,
            _prepared_srcs(tmpdir, _COMPAT_PATCHES, _FIXED_PATCHES),
        )
        return True
    except Exception:
        return False


def _oracle_masks(algo: str, n: int, out_root, oracle_bin=ORACLE_BIN) -> np.ndarray:
    out = str(out_root / (algo + os.path.basename(oracle_bin)))
    os.makedirs(out, exist_ok=True)
    subprocess.run(
        [oracle_bin, algo, VIDEO, out, str(n)], check=True, capture_output=True
    )
    return np.stack(
        [cv2.imread(os.path.join(out, f"mask_{i:04d}.png"), 0) for i in range(n)]
    )


@pytest.fixture(scope="module")
def frames():
    if not os.path.exists(VIDEO):
        pytest.skip("reference video unavailable")
    return jnp.asarray(read_video(VIDEO, max_frames=max(N, 210)))


@pytest.mark.parametrize("oracle_name,our_name,gate,gate_fixed", CASES)
def test_golden_vs_reference_cpp(
    oracle_name, our_name, gate, gate_fixed, frames, tmp_path
):
    if not _ensure_oracle(tmp_path):
        pytest.skip("reference oracle unavailable")
    ref = _oracle_masks(oracle_name, N, tmp_path)
    algo = get_algorithm(our_name)()
    _, masks = run_video(algo, frames[:N])
    masks = np.asarray(masks)
    agree = (masks == ref).mean()
    assert agree >= gate, f"{oracle_name}: agreement {agree:.5f} < {gate}"
    # non-vacuity: the oracle saw real foreground in the window
    assert (ref > 0).mean() > 0.005
    if gate_fixed is not None and _ensure_fixed_oracle(tmp_path):
        ref_fixed = _oracle_masks(
            oracle_name, N, tmp_path, oracle_bin=ORACLE_BIN_FIXED
        )
        agree_fixed = (masks == ref_fixed).mean()
        assert agree_fixed >= gate_fixed, (
            f"{oracle_name} vs intent-fixed oracle: "
            f"{agree_fixed:.6f} < {gate_fixed}"
        )


def test_golden_multilayer_crop(frames, tmp_path):
    """MultiLayerBGS vs the compiled reference (MultiLayerBGS.cpp process()
    itself, LEARN mode defaults) on a 64×128 motion crop × 60 frames — a
    bounded slice of the full-frame run for the single-core CPU CI host;
    the crop covers the moving object (frames 30..90, rows 96..160, cols
    0..128 of dataset/video.avi — measured frame-diff activity) so the
    comparison is non-vacuous. The crop is fed to the oracle as a lossless
    PNG sequence (cv::VideoCapture printf pattern)."""
    if not _ensure_oracle(tmp_path):
        pytest.skip("reference oracle unavailable")
    n = 60
    crop = np.asarray(frames[30 : 30 + n, 96:160, 0:128])
    seq = tmp_path / "mlseq"
    os.makedirs(seq, exist_ok=True)
    for i, f in enumerate(crop):
        cv2.imwrite(str(seq / f"f_{i:04d}.png"), f)
    out = str(tmp_path / "mlout")
    os.makedirs(out, exist_ok=True)
    subprocess.run(
        [ORACLE_BIN, "multilayer", str(seq / "f_%04d.png"), out, str(n)],
        check=True, capture_output=True,
    )
    ref = np.stack(
        [cv2.imread(os.path.join(out, f"mask_{i:04d}.png"), 0) for i in range(n)]
    )
    algo = get_algorithm("MultiLayerBGS")()
    _, masks = run_video(algo, jnp.asarray(crop))
    agree = (np.asarray(masks) == ref).mean()
    assert agree >= 0.99, f"multilayer: agreement {agree:.5f}"
    assert (ref > 0).mean() > 0.005


def test_golden_imbs_after_model_creation(frames, tmp_path):
    """IMBS builds its first model after numSamples×samplingPeriod = 15 s
    = 150 frames at fps=10 (imbs.cpp:164-202); before that the reference
    paints a 'Creating initial background' text banner into the mask
    (imbs.cpp:135-146) which we deliberately emit as an empty mask
    (bgs/imbs.py module docstring). Compare the frames where a model
    exists."""
    if not _ensure_oracle(tmp_path):
        pytest.skip("reference oracle unavailable")
    n = 210
    ref = _oracle_masks("imbs", n, tmp_path)
    algo = get_algorithm("IndependentMultimodalBGS")()
    _, masks = run_video(algo, frames[:n])
    masks = np.asarray(masks)
    agree = (masks[160:] == ref[160:]).mean()
    assert agree >= 0.99, f"imbs: agreement {agree:.5f}"
    assert (ref[160:] > 0).mean() > 0.001


def _ensure_lbpmrf_oracle() -> bool:
    bin_path = os.path.join(ORACLE_DIR, "lbpmrf_oracle")
    if os.path.exists(bin_path):
        return True
    ck = f"{REF}/ck"
    if not os.path.exists(f"{ck}/MotionDetection.cpp"):
        return False
    cv = subprocess.run(
        ["pkg-config", "--cflags", "--libs", "opencv4"],
        capture_output=True, text=True, check=True,
    ).stdout.split()
    try:
        subprocess.run(
            ["g++", "-O2", "-std=c++11", "-include", "cv4_shim.h",
             "-o", "lbpmrf_oracle", "lbpmrf_oracle.cpp"]
            + [f"{ck}/{n}.cpp" for n in (
                "MotionDetection", "MEImage", "MEHistogram", "MEDefs",
                "graph", "maxflow")]
            + [f"-I{ck}", "-I."] + cv,
            cwd=ORACLE_DIR, check=True, capture_output=True,
        )
        return True
    except Exception:
        return False


def test_golden_lbpmrf_vs_reference_cpp(frames, tmp_path):
    """LbpMrf vs the compiled ck package (tests/oracle/lbpmrf_oracle.cpp,
    md_LBPHistograms mode per LbpMrf.cpp:29). Round 4 removed the solver
    deviation (exact BK-parity integer min-cut, ops/mincut.py). Round 5
    retired the round-4 "f32 drift" attribution by ISOLATING the real
    causes (tools/lbpmrf_twin.py, LBPMRF_TWIN.json):

    1. the reference's short-memcpy partial init (``MotionDetection.cpp``
       column branch: ``sizeof(CurrentHistogram2)`` = 2 floats) leaves
       histogram bins 2+ zero on first init — the reference emits ~95 %-FG
       masks on frames 1-2 that the repo didn't replicate (~55 % of the
       round-4 residue);
    2. missing sRGB companding in the Luv front end (OpenCV's 8U path
       bakes gamma into its LUT) shifted gray by up to 23 levels;
    3. three exact tie-break/ordering quirks in UpdateHUPixelData (see
       bgs/lbp_mrf.py:_update_models) that bind on the early frames'
       exact intersection/weight ties.

    With all three replicated: pixel agreement 0.9527 (r3) → 0.9736 (r4)
    → 0.9917; settled-phase moving-object IoU 0.803 → 0.867 (frames
    60-130). The remaining ~0.8 % is the cv2 fixed-point trilinear-LUT
    interpolation of the Luv conversion (repo: float formula, within ±1
    u8 level on every channel — ~10 % of LBP codes sit one level from a
    compare threshold) plus genuine f32-vs-float drift at the 0.75/0.95
    knife edges; the f64 twin (a third implementation) sits at the same
    distance from both, pinning the no-semantic-gap claim."""
    if not _ensure_lbpmrf_oracle():
        pytest.skip("ck reference sources unavailable")
    out = str(tmp_path / "lbpmrf")
    os.makedirs(out, exist_ok=True)
    n = 130
    subprocess.run(
        [os.path.join(ORACLE_DIR, "lbpmrf_oracle"), VIDEO, out, str(n)],
        check=True, capture_output=True,
    )
    ref = np.stack(
        [cv2.imread(os.path.join(out, f"mask_{i:04d}.png"), 0) for i in range(n)]
    )
    algo = get_algorithm("LbpMrf")()
    _, masks = run_video(algo, frames[:n])
    m = np.asarray(masks)
    agree = (m == ref).mean()
    assert agree >= 0.985, f"lbpmrf: agreement {agree:.5f}"
    pred, gt = m[60:] > 0, ref[60:] > 0
    inter = (pred & gt).sum((1, 2), dtype=np.float64)
    union = (pred | gt).sum((1, 2), dtype=np.float64)
    live = union > 0
    iou = float((inter[live] / union[live]).mean())
    assert iou >= 0.85, f"lbpmrf settled IoU {iou:.3f}"
    assert (gt.mean() > 0.01) and (pred.mean() > 0.01)  # non-vacuous
