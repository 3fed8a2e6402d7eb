"""Aux subsystems: fet scorer, orbax checkpointing, XML config round-trip."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

REFERENCE = "/root/reference"


def test_fet_scorer_on_reference_fixtures(tmp_path):
    gt = os.path.join(REFERENCE, "fet", "GT")
    fg = os.path.join(REFERENCE, "fet", "FG")
    if not os.path.isdir(gt):
        pytest.skip("reference fet fixtures unavailable")
    from tracking_tpu.analysis.fet import score_dirs

    res = score_dirs(gt, fg, str(tmp_path / "SC"))
    assert res["tp"] > 0 and res["fp"] >= 0
    assert 0.0 < res["fscore"] <= 1.0
    # SC images written for every pair
    assert len(os.listdir(tmp_path / "SC")) == len(res["rows"])
    # identity check: GT vs GT is a perfect score
    perfect = score_dirs(gt, gt)
    assert perfect["fscore"] == 1.0 and perfect["fp"] == 0


def test_checkpoint_roundtrip_any_algorithm(tmp_path):
    from tracking_tpu.core.checkpoint import load_state, save_state
    from tracking_tpu.core.registry import get_algorithm
    from tracking_tpu.runner import run_video

    frames = np.random.default_rng(0).integers(0, 255, (6, 24, 32, 3), np.uint8)
    algo = get_algorithm("subsense")()
    st, masks1 = run_video(algo, jnp.asarray(frames[:3]))

    save_state(str(tmp_path / "ckpt"), st)
    st2 = load_state(str(tmp_path / "ckpt"), like=st)
    for a, b in zip(
        __import__("jax").tree_util.tree_leaves(st),
        __import__("jax").tree_util.tree_leaves(st2),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resuming from the checkpoint continues the stream identically
    _, m_direct = run_video(algo, jnp.asarray(frames[3:]), state=st)
    _, m_resumed = run_video(algo, jnp.asarray(frames[3:]), state=st2)
    np.testing.assert_array_equal(np.asarray(m_direct), np.asarray(m_resumed))


def test_xml_config_roundtrip(tmp_path):
    from tracking_tpu.core.config import config_from_xml, config_to_xml
    from tracking_tpu.core.registry import get_algorithm

    cls = get_algorithm("FrameDifferenceBGS").Config
    cfg = cls()
    path = str(tmp_path / "FrameDifferenceBGS.xml")
    config_to_xml(cfg, path)
    cfg2 = config_from_xml(cls, path)
    assert cfg == cfg2


def test_xml_import_from_reference_configs():
    # the reference ships known-good configs; field names match verbatim
    path = os.path.join(REFERENCE, "build", "config", "PreProcessor.xml")
    if not os.path.exists(path):
        pytest.skip("reference configs unavailable")
    from tracking_tpu.core.config import config_from_xml
    from tracking_tpu.runner.pipeline import PreProcessorConfig

    cfg = config_from_xml(PreProcessorConfig, path)
    assert isinstance(cfg.enableShow, bool) or hasattr(cfg, "equalizeHist")


def test_tracking_cli_savestate_loadstate(tmp_path):
    """tracking-run --savestate/--loadstate parity (trackingMain.cpp:685-758):
    a resumed run continues from the checkpointed BGS+tracker state."""
    video = os.path.join(REFERENCE, "dataset", "video.avi")
    if not os.path.exists(video):
        pytest.skip("reference video unavailable")
    from tracking_tpu.runner.cli import tracking_run

    ck = str(tmp_path / "state")
    log = str(tmp_path / "params.log")
    rc = tracking_run(
        [video, "--max_frames", "12", "--chunk", "6", "--bgs_type", "2",
         "--quiet", "--savestate", ck, "--log", log]
    )
    assert rc == 0 and os.path.exists(ck)
    assert "bgs_type=2" in open(log).read()
    trk = str(tmp_path / "t.csv")
    rc = tracking_run(
        [video, "--max_frames", "12", "--chunk", "6", "--bgs_type", "2",
         "--quiet", "--loadstate", ck, "--track", trk]
    )
    assert rc == 0 and os.path.exists(trk)


def test_bgs_run_cli_end_to_end(tmp_path):
    """bgs-run on the reference video: mask video written, fps reported
    (Main/VideoAnalysis parity incl. --compare/--stopAt/--imgref)."""
    video = os.path.join(REFERENCE, "dataset", "video.avi")
    if not os.path.exists(video):
        pytest.skip("reference video unavailable")
    import cv2

    from tracking_tpu.runner.cli import bgs_run

    ref_png = str(tmp_path / "ref.png")
    out_avi = str(tmp_path / "fg.avi")
    # make a reference frame for --compare from a first quick pass
    rc = bgs_run(
        ["-uf", "-fn", video, "-a", "FrameDifferenceBGS",
         "--max_frames", "24", "--chunk", "8", "-o", out_avi]
    )
    assert rc == 0 and os.path.exists(out_avi)
    cap = cv2.VideoCapture(out_avi)
    nf = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    ok, frame = cap.read()
    cap.release()
    assert nf == 24 and ok
    cv2.imwrite(ref_png, cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY))
    rc = bgs_run(
        ["-uf", "-fn", video, "-a", "FrameDifferenceBGS", "--max_frames", "8",
         "--chunk", "8", "--compare", "--imgref", ref_png, "--stopAt", "0"]
    )
    assert rc == 0
