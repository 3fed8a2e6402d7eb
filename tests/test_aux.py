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
    # the checked-in reference config: equalize/blur off, show on
    assert cfg.equalizeHist is False
    assert cfg.gaussianBlur is False
    assert cfg.enableShow is True

    fp_path = os.path.join(REFERENCE, "build", "config", "FrameProcessor.xml")
    from tracking_tpu.runner.pipeline import FrameProcessorConfig

    fp_cfg = config_from_xml(FrameProcessorConfig, fp_path)
    assert fp_cfg.enablePreProcessor is True
    assert fp_cfg.enableFrameDifferenceBGS is True
    assert fp_cfg.enableSuBSENSEBGS is False
    assert fp_cfg.tictoc == ""  # CvFileStorage writes an empty string as ""


def test_bgs_run_config_driven_fanout(tmp_path):
    """bgs-run with no -a: FrameProcessor.xml enable flags drive a fused
    multi-algorithm scan; missing XMLs are written with defaults (saveConfig
    parity); edited XMLs are picked up on re-read (loadConfig parity)."""
    video = os.path.join(REFERENCE, "dataset", "video.avi")
    if not os.path.exists(video):
        pytest.skip("reference video unavailable")
    from tracking_tpu.runner.cli import bgs_run

    cfgdir = str(tmp_path / "config")
    out1 = str(tmp_path / "fg.avi")
    rc = bgs_run(["-uf", "-fn", video, "--config_dir", cfgdir,
                  "--max_frames", "8", "--chunk", "4", "-o", out1])
    assert rc == 0
    # default configs self-documented to disk; FrameDifference is the default
    for f in ("FrameProcessor.xml", "PreProcessor.xml", "FrameDifferenceBGS.xml"):
        assert os.path.exists(os.path.join(cfgdir, f)), f
    assert os.path.exists(out1)  # single enabled algo → plain path

    # enable a second algorithm by editing the XML (live-editable configs)
    fp_xml = os.path.join(cfgdir, "FrameProcessor.xml")
    txt = open(fp_xml).read().replace(
        "<enableStaticFrameDifferenceBGS>0", "<enableStaticFrameDifferenceBGS>1"
    )
    open(fp_xml, "w").write(txt)
    out2 = str(tmp_path / "fg2.avi")
    rc = bgs_run(["-uf", "-fn", video, "--config_dir", cfgdir,
                  "--max_frames", "8", "--chunk", "4", "-o", out2])
    assert rc == 0
    assert os.path.exists(str(tmp_path / "fg2.FrameDifferenceBGS.avi"))
    assert os.path.exists(str(tmp_path / "fg2.StaticFrameDifferenceBGS.avi"))


def test_fanout_live_reload_preserves_state(tmp_path):
    """_reload_fanout: unchanged XML keeps the compiled fan-out object;
    enabling a new algorithm mid-run preserves the existing algorithm's
    state pytree identity and warm-starts only the new one."""
    import jax.numpy as jnp

    from tracking_tpu.runner.cli import _reload_fanout
    from tracking_tpu.runner.pipeline import FrameProcessor

    cfgdir = str(tmp_path / "config")
    fp = FrameProcessor.from_config_dir(cfgdir)
    assert list(fp.algorithms) == ["FrameDifferenceBGS"]
    chunk = np.random.default_rng(0).integers(0, 255, (4, 24, 32, 3), np.uint8)
    states, masks = fp.run(jnp.asarray(chunk))
    fp2, states2 = _reload_fanout(fp, states, cfgdir, chunk)
    assert fp2 is fp and states2 is states  # no change → same compiled object

    fp_xml = os.path.join(cfgdir, "FrameProcessor.xml")
    txt = open(fp_xml).read().replace(
        "<enableSigmaDeltaBGS>0", "<enableSigmaDeltaBGS>1"
    )
    open(fp_xml, "w").write(txt)
    fp3, states3 = _reload_fanout(fp, states, cfgdir, chunk)
    assert set(fp3.algorithms) == {"FrameDifferenceBGS", "SigmaDeltaBGS"}
    # unchanged algorithm's state is reused, not re-initialized
    assert states3["FrameDifferenceBGS"] is states["FrameDifferenceBGS"]
    states4, masks = fp3.run(jnp.asarray(chunk), states3)
    assert set(masks) == {"FrameDifferenceBGS", "SigmaDeltaBGS"}


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


def test_roc_threshold_search_matches_reference_loop(tmp_path):
    """roc_threshold_search/save_roc_file vs a direct transliteration of
    PerformanceUtils::ImageROC's saveResults branch
    (tb/PerformanceUtils.cpp:345-457), including its raster-order
    running-counter quirk."""
    import numpy as np
    from tracking_tpu.analysis import roc_threshold_search, save_roc_file

    rng = np.random.default_rng(7)
    img = (rng.integers(0, 8, (24, 32)) * 36).astype(np.uint8)  # few levels
    gt = (rng.random((24, 32)) < 0.4).astype(np.uint8) * 255

    # -- reference transliteration: per-pixel scan, global running counters
    freq = np.zeros((256, 7))
    nTP = nTN = nFP = nFN = 0.0
    for y in range(img.shape[0]):
        for x in range(img.shape[1]):
            gv, iv = gt[y, x], img[y, x]
            if gv != 0 and iv != 0:
                nTP += 1; freq[iv, 0] = nTP
            elif gv == 0 and iv == 0:
                nTN += 1; freq[iv, 1] = nTN
            elif gv == 0 and iv != 0:
                nFP += 1; freq[iv, 2] = nFP
            else:
                nFN += 1; freq[iv, 3] = nFN
    ours = roc_threshold_search(img, gt)
    assert np.array_equal(ours[:, :4], freq[:, :4])

    out = str(tmp_path / "roc.txt")
    save_roc_file(img, gt, out)
    lines = open(out).read().splitlines()
    assert lines[0].startswith("  I     TP     TN     FP     FN")
    rows = [ln for ln in lines[2:] if ln.strip()]
    # rows only where both denominators are nonzero; check one numerically
    i, tp, tn, fp, fn, fpr, fnr, dr = rows[0].split()
    i = int(i)
    assert float(tp) == freq[i, 0] and float(fn) == freq[i, 3]
    assert abs(float(dr) - freq[i, 0] / (freq[i, 0] + freq[i, 3])) < 1e-6


def test_image_roc_coding():
    import numpy as np
    from tracking_tpu.analysis import image_roc

    pred = np.array([[0, 255], [255, 0]], np.uint8)
    gt = np.array([[0, 255], [0, 255]], np.uint8)
    out = np.asarray(image_roc(pred, gt))
    assert out.tolist() == [[0, 30], [255, 100]]


def test_cdnet_run_cli(tmp_path):
    """cdnet-run batch driver: in%06d.jpg frames over a ROI range ->
    bin%06d.png masks for scored frames only, with a pre-ROI bootstrap
    window (ustc_src/shrinkBGS/main.cpp:21-74, shrink.cpp:115-129)."""
    import cv2
    import numpy as np

    from tracking_tpu.runner.cli import cdnet_run

    rng = np.random.default_rng(3)
    in_dir = tmp_path / "input"
    in_dir.mkdir()
    base = rng.integers(0, 180, (24, 32, 3), np.uint8)
    for i in range(40, 56):  # frames 000040..000055
        f = base.copy()
        if i >= 46:
            f[8:16, 10 + (i - 46) * 2 : 18 + (i - 46) * 2] = 255
        cv2.imwrite(str(in_dir / f"in{i:06d}.jpg"), f)
    out_dir = tmp_path / "out"
    rc = cdnet_run(
        [str(in_dir), "--out", str(out_dir), "--roi", "48", "55",
         "--bootstrap", "8", "--bgs", "shrinkBGS", "--chunk", "8"]
    )
    assert rc == 0
    written = sorted(p.name for p in out_dir.iterdir())
    assert written == [f"bin{i:06d}.png" for i in range(48, 56)]
    m = cv2.imread(str(out_dir / "bin000052.png"), 0)
    assert m is not None and m.shape == (24, 32)
