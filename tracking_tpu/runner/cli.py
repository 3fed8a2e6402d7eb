"""Command-line entry points mirroring the reference executables.

- ``bgs-run`` ≈ ``bgs -uf -fn=<video>`` (``Main.cpp:29-85`` →
  ``VideoAnalysis::setup/start``, ``VideoAnalysis.cpp:31-134``): run enabled
  BGS algorithms over a video/camera, optionally score masks against a
  reference image at a stop frame (``-co --stopAt --imgref`` semantics).
- ``tracking-run`` ≈ ``tracking btavi=... fgavi=... <video>``
  (``ustc_src/trackingMain.cpp:382-773``): full pipeline — BGS (default
  SuBSENSE, type 36, matching ``trackingMain.cpp:33-35``) → blob detection →
  tracking → trajectory gen (track=<file>) → analysis; writes annotated
  fg/track videos and prints per-frame blob positions.

Host-side loop: decode chunk → device scan → fetch masks → tracker runs
device-side per frame; drawing/IO stays on host (cv2), exactly the split the
TPU design wants.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def _writer(path, fps, size):
    """MJPG/AVI writer: the native FFmpeg encoder (tracking_tpu.native.
    VideoWriter) when the toolchain is present, else cv2 — both write the
    container+codec the reference's fgavi/btavi outputs use."""
    try:
        from tracking_tpu.native import VideoWriter

        return VideoWriter(path, fps, size)
    except Exception:
        import cv2

        return cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), fps, size)


def bgs_run(argv=None):
    import cv2
    import jax.numpy as jnp

    from tracking_tpu.analysis.metrics import mask_similarity
    from tracking_tpu.core.registry import get_algorithm
    from tracking_tpu.io.video import VideoSource
    from tracking_tpu.runner.scan import run_video

    p = argparse.ArgumentParser(description="TPU BGS runner (bgs -uf/-uc parity)")
    p.add_argument("--use_file", "-uf", action="store_true")
    p.add_argument("--filename", "-fn", default=None)
    p.add_argument("--use_cam", "-uc", action="store_true")
    p.add_argument("--camera", "-ca", type=int, default=0)
    p.add_argument(
        "--algorithm", "-a", default=None,
        help="run ONE algorithm by name/alias/type-id; omitted = the "
             "reference behavior: config_dir/FrameProcessor.xml enable flags "
             "pick the fan-out (FrameProcessor.h:80-242), per-algorithm XMLs "
             "configure each, missing XMLs are written with defaults, and "
             "the XMLs are re-read between chunks (loadConfig-every-frame "
             "parity, FrameDifferenceBGS.cpp:35-40)",
    )
    p.add_argument(
        "--config_dir", default="./config",
        help="OpenCV-XML config directory (reference ./config layout)",
    )
    p.add_argument("--compare", "-co", action="store_true")
    p.add_argument("--stopAt", "-st", type=int, default=0)
    p.add_argument("--imgref", "-im", default=None)
    p.add_argument("--output", "-o", default=None, help="write fg mask video")
    p.add_argument("--chunk", type=int, default=64)
    p.add_argument("--max_frames", type=int, default=0)
    p.add_argument(
        "--frames_dir", default=None,
        help="Demo2 parity: read a '<n>.png' image sequence instead of a video",
    )
    args = p.parse_args(argv)

    if args.frames_dir:
        from tracking_tpu.io.video import read_frame_dir

        seq = read_frame_dir(args.frames_dir)

        def _chunks():
            lim = args.max_frames or len(seq)
            for i in range(0, min(len(seq), lim), args.chunk):
                yield seq[i : i + args.chunk]

        chunk_iter = _chunks()
    else:
        src = VideoSource(
            input_file=args.filename if (args.use_file or args.filename) else None,
            camera_index=args.camera if args.use_cam else None,
        )
        chunk_iter = src.chunks(args.chunk, max_frames=args.max_frames)
    if args.algorithm is not None:
        fp = None
        algo = get_algorithm(args.algorithm)()
    else:
        from tracking_tpu.runner.pipeline import FrameProcessor

        fp = FrameProcessor.from_config_dir(args.config_dir)
        if not fp.algorithms:
            print("no BGS algorithm enabled in FrameProcessor.xml")
            return 1
    state = None
    states = None
    out = None
    outs = {}
    n = 0
    t0 = time.perf_counter()

    def _staged(it):
        """Double-buffer: stage chunk k+1 on device (async device_put)
        while chunk k computes — overlaps host decode + PCIe/tunnel
        transfer with TPU compute (VideoCapture loop parity: the reference
        decodes synchronously; here decode rides the prefetch ring of the
        native reader AND the device transfer is pipelined)."""
        import jax

        pending = None
        for chunk in it:
            staged = jax.device_put(chunk)
            if pending is not None:
                yield pending
            pending = staged
        if pending is not None:
            yield pending

    def _check(m, name, i):
        if args.compare and args.imgref and n + i == args.stopAt:
            ref = cv2.imread(args.imgref, 0)
            score = float(mask_similarity(jnp.asarray(m), jnp.asarray(ref)))
            print(f"{name} frame {n + i}: similarity = {score:.4f}")

    for chunk in _staged(chunk_iter):
        if fp is None:
            state, masks = run_video(algo, chunk, state=state)
            masks = np.asarray(masks)
            for i, m in enumerate(masks):
                if args.output:
                    if out is None:
                        out = _writer(args.output, 30.0, (m.shape[1], m.shape[0]))
                    out.write(cv2.cvtColor(m, cv2.COLOR_GRAY2BGR))
                _check(m, args.algorithm, i)
            n += len(masks)
        else:
            states, mask_dict = fp.run(chunk, states)
            if n == 0 and getattr(fp.config, "tictoc", "") in fp.algorithms:
                name = fp.config.tictoc
                secs = fp.profile(chunk)[name]
                print(f"tictoc: {name} = {secs:.4f}s / {len(chunk)} frames")
            many = len(fp.algorithms) > 1
            nm = 0
            for name, masks in mask_dict.items():
                masks = np.asarray(masks)
                nm = len(masks)
                for i, m in enumerate(masks):
                    if args.output:
                        path = args.output
                        if many:
                            root, ext = (path.rsplit(".", 1) + ["avi"])[:2]
                            path = f"{root}.{name}.{ext}"
                        if name not in outs:
                            outs[name] = _writer(path, 30.0, (m.shape[1], m.shape[0]))
                        outs[name].write(cv2.cvtColor(m, cv2.COLOR_GRAY2BGR))
                    _check(m, name, i)
            n += nm
            fp, states = _reload_fanout(fp, states, args.config_dir, chunk)
    dt = time.perf_counter() - t0
    if out is not None:
        out.release()
    for o in outs.values():
        o.release()
    label = args.algorithm if fp is None else "+".join(fp.algorithms)
    print(f"{label}: {n} frames in {dt:.2f}s ({n / max(dt, 1e-9):.1f} fps)")
    return 0


def _reload_fanout(fp, states, config_dir, chunk):
    """loadConfig-every-frame parity at chunk granularity
    (``FrameDifferenceBGS.cpp:35-40``: configs are live-editable mid-run).

    Re-reads the XML tree; an unchanged tree keeps the compiled fan-out and
    all states; any change rebuilds, reusing state for algorithms whose own
    config is unchanged and warm-starting fresh state (on the last seen
    frame) for new/reconfigured ones."""
    import jax
    import jax.numpy as jnp

    from tracking_tpu.runner.pipeline import FrameProcessor

    new_fp = FrameProcessor.from_config_dir(config_dir)
    changed = (
        new_fp.config != fp.config
        or new_fp.pre.config != fp.pre.config
        or {k: a.config for k, a in new_fp.algorithms.items()}
        != {k: a.config for k, a in fp.algorithms.items()}
    )
    if not changed:
        return fp, states
    h, w = chunk.shape[1], chunk.shape[2]
    c = chunk.shape[3] if chunk.ndim == 4 else 1
    kept = {}
    for name, a in new_fp.algorithms.items():
        old = fp.algorithms.get(name)
        if old is not None and old.config == a.config and states:
            kept[name] = states[name]
        else:
            st = a.init(h, w, c)
            kept[name] = jax.jit(a.warm_start)(
                st, new_fp.pre.process(jnp.asarray(chunk[-1]))
            )
    return new_fp, kept


_REF_TOKENS = (
    "fg", "fgavi", "btavi", "bd", "bt", "bt_corr", "btpp", "bta",
    "bta_data", "btgen", "track", "FGTrainFrames", "log",
    "savestate", "loadstate",
)


def _convert_ref_tokens(argv):
    """Reference-style CLI parity (``trackingMain.cpp:461-496``): tokens
    ``name=value`` (e.g. ``btavi=btout.avi fgavi=fgout.avi video.avi``, as in
    ``build/tracking.sh``) become ``--name value``; a bare ``*.avi`` token is
    the positional video; ``prefix:Param=value`` module-parameter tokens
    (``set_params``, ``trackingMain.cpp:308-345``) pass through for
    :func:`_apply_module_params`."""
    out, params = [], []
    for a in argv:
        name = a.split("=", 1)[0]
        if "=" in a and ":" in name:
            params.append(a)
        elif "=" in a and name in _REF_TOKENS:
            out.extend([f"--{name}", a.split("=", 1)[1]])
        else:
            out.append(a)
    return out, params


def _apply_module_params(tokens, modules):
    """Generic per-module parameter forwarding (``set_params``,
    ``trackingMain.cpp:308-345``): each ``prefix:Param=value`` token sets the
    case-insensitively matching config field of the module registered under
    ``prefix``; a match prints the reference's confirmation line. Returns
    {prefix: {field: value}} of applied updates."""
    import dataclasses as _dc

    applied = {}
    for tok in tokens:
        prefix, rest = tok.split(":", 1)
        if "=" not in rest:
            continue
        pname, value = rest.split("=", 1)
        mod = modules.get(prefix)
        if mod is None:
            continue
        nickname, cfg = mod
        for f in _dc.fields(cfg):
            if f.name.lower() != pname.lower():
                continue
            typ = type(getattr(cfg, f.name))
            if typ is bool:
                val = value.lower() in ("1", "true", "yes")
            elif typ is int:
                val = int(float(value))
            elif typ is float:
                val = float(value)
            else:
                val = value
            applied.setdefault(prefix, {})[f.name] = val
            try:
                shown = float(val)
            except (TypeError, ValueError):
                shown = val
            print(f"{nickname}:{f.name} param set to {shown}")
    return applied


def tracking_run(argv=None):
    import cv2
    import jax
    import jax.numpy as jnp

    from tracking_tpu.core.registry import get_algorithm
    from tracking_tpu.io.video import VideoSource
    from tracking_tpu.runner.scan import make_step_fn
    from tracking_tpu.track.tracker import BlobTracker
    from tracking_tpu.track.trajectory import TrackRecorder, make_analysis

    p = argparse.ArgumentParser(description="blob tracking pipeline (tracking parity)")
    p.add_argument("video")
    p.add_argument("--fgavi", default=None, help="fg mask video out")
    p.add_argument("--btavi", default=None, help="annotated tracking video out")
    p.add_argument("--track", default=None, help="track file out (.csv or .yml)")
    p.add_argument("--bgs_type", type=int, default=36, help="ustc type id (default SuBSENSE)")
    p.add_argument(
        "--fg", default=None, choices=["FG_0", "FG_0S", "FG_1"],
        help="stock FGDetector module instead of the USTC_BGS override "
             "(trackingMain.cpp:37-41): FG_0=FGD, FG_0S=FGD simple, FG_1=MOG",
    )
    p.add_argument("--chunk", type=int, default=32)
    p.add_argument("--max_frames", type=int, default=0)
    p.add_argument("--quiet", action="store_true")
    p.add_argument(
        "--savestate", default=None,
        help="checkpoint BGS+tracker state at end (trackingMain.cpp:685-713)",
    )
    p.add_argument(
        "--loadstate", default=None,
        help="resume BGS+tracker state from a checkpoint (trackingMain.cpp:740-758)",
    )
    p.add_argument(
        "--bd", default="BD_CC", choices=["BD_CC", "BD_Simple"],
        help="blob detector module (trackingMain.cpp:43-47)",
    )
    p.add_argument(
        "--bt", default="CCMSPF",
        choices=["CC", "CCMSPF", "MS", "MSFG", "MSPF"],
        help="blob tracker module (trackingMain.cpp:49-68)",
    )
    p.add_argument(
        "--bta", default="HistPVS",
        help="trajectory analysis module: HistPVS|HistP|HistPV|HistSS|"
             "TrackDist|IOR|None (trackingMain.cpp:110-121)",
    )
    p.add_argument(
        "--btpp", default="Kalman", choices=["Kalman", "None"],
        help="track post-processing: Kalman-filtered states (default) or "
             "raw blob measurements (trackingMain.cpp:104-108)",
    )
    p.add_argument(
        "--btgen", default=None, choices=["YML", "RawTracks"],
        help="trajectory generator module for track= output "
             "(trackingMain.cpp:505-516): YML (default) writes OpenCV-"
             "FileStorage YAML, RawTracks writes frame,id,x,y,w,h CSV",
    )
    p.add_argument(
        "--bt_corr", default="none",
        help="tracker correction by post-processing (trackingMain.cpp:"
             "517-527): none | PostProcRes | <postproc name>. In this "
             "architecture the Kalman post-processor IS the tracker's "
             "internal predictor (one shared Kalman bank, track/tracker.py),"
             " so PostProcRes coincides with the default prediction path; "
             "the flag is accepted for invocation parity and a PP name "
             "(e.g. Kalman) also selects that post-processor.",
    )
    p.add_argument(
        "--FGTrainFrames", type=int, default=0,
        help="pre-train the FG detector for N frames before tracking "
             "starts (param.FGTrainFrames, trackingMain.cpp:611)",
    )
    p.add_argument(
        "--bta_data", default=None,
        help="trajectory-analysis database file (bta_data=, trackingMain."
             "cpp:545-556): loaded at start if present, saved at end (.npz)",
    )
    p.add_argument(
        "--log", default=None,
        help="append module parameter dump to a file (print_params, trackingMain.cpp:348-380)",
    )
    argv2, mod_params = _convert_ref_tokens(
        list(sys.argv[1:] if argv is None else argv)
    )
    args = p.parse_args(argv2)
    # bt_corr=<PP name> selects that post-processor + correction
    # (trackingMain.cpp:517-527)
    if args.bt_corr.lower() not in ("none", "postprocres"):
        args.btpp = args.bt_corr
        args.bt_corr = "PostProcRes"

    if args.fg:
        algo = get_algorithm(
            {"FG_0": "FGD", "FG_0S": "FGDSimple", "FG_1": "MixtureOfGaussianV1BGS"}[args.fg]
        )()
    else:
        algo = get_algorithm(args.bgs_type)()

    # generic prefix:Param=value forwarding into each module's config
    # (set_params parity, trackingMain.cpp:308-345,624-676)
    from tracking_tpu.track.tracker import TrackerConfig

    trk_cfg = TrackerConfig()
    upd = _apply_module_params(
        mod_params,
        {
            "fg": (args.fg or type(algo).__name__, algo.config),
            "bd": (args.bd, trk_cfg),
            "bt": (args.bt, trk_cfg),
            "btpp": (args.btpp, trk_cfg),
            "bta": (args.bta, trk_cfg),
        },
    )
    if "fg" in upd:
        algo = type(algo)(algo.config.replace(**upd["fg"]))
    for pfx in ("bd", "bt", "btpp", "bta"):
        if pfx in upd:
            trk_cfg = trk_cfg.replace(**upd[pfx])
    if args.log:
        import dataclasses as _dc

        with open(args.log, "a") as fh:
            fh.write(f"video={args.video} bgs_type={args.bgs_type}\n")
            fh.write(f"module: {type(algo).__name__}\n")
            for f in _dc.fields(algo.config):
                fh.write(f"  {f.name}={getattr(algo.config, f.name)}\n")
    tracker = BlobTracker(
        trk_cfg.replace(trackerType=args.bt, blobDetector=args.bd)
    )
    src = VideoSource(input_file=args.video)

    body = make_step_fn(algo)
    fg_train = int(args.FGTrainFrames)

    @jax.jit
    def run_chunk(bgs_state, trk_state, frames, start_idx):
        def step(carry, xs):
            bgs_state, trk_state = carry
            frame, idx = xs
            bgs_state, fg = body(bgs_state, frame)
            if fg_train:
                # FGTrainFrames: the FG detector trains alone for the first
                # N frames; the tracker engages after (trackingMain.cpp:611)
                trk_state, tracks = jax.lax.cond(
                    idx >= fg_train,
                    lambda ts: tracker.step(ts, fg, frame),
                    lambda ts: (ts, tracker.empty_tracks(ts)),
                    trk_state,
                )
            else:
                trk_state, tracks = tracker.step(trk_state, fg, frame)
            return (bgs_state, trk_state), (fg, tracks)

        idxs = start_idx + jnp.arange(frames.shape[0])
        (bgs_state, trk_state), (fgs, tracks) = jax.lax.scan(
            step, (bgs_state, trk_state), (frames, idxs)
        )
        return bgs_state, trk_state, fgs, tracks

    bgs_state = None
    trk_state = tracker.init()
    recorder = TrackRecorder()
    ana = None
    fg_out = bt_out = None
    n = 0
    t0 = time.perf_counter()
    frame_hw = None
    for chunk in src.chunks(args.chunk, max_frames=args.max_frames):
        if bgs_state is None:
            h, w = chunk.shape[1:3]
            frame_hw = (h, w)
            # online per-frame trajectory analysis (trackingMain.cpp:219-297:
            # the legacy analyzers run per frame with a drawable state);
            # bta_data= persists the learned database across runs
            import os as _os

            ana = make_analysis(args.bta, w, h)
            if ana is not None and args.bta_data and _os.path.exists(args.bta_data):
                ana.load_data(args.bta_data)
                print(f"bta_data: loaded analysis database from {args.bta_data}")
            bgs_state = algo.init(h, w, chunk.shape[3] if chunk.ndim == 4 else 1)
            # MLBGS-style model preload (MultiLayerBGS.cpp:94-98 BGS->Load):
            # any algorithm config exposing bg_model_preload loads its model
            # (orbax checkpoint) before processing
            preload = getattr(algo.config, "bg_model_preload", "")
            if args.loadstate:
                from tracking_tpu.core.checkpoint import load_state

                restored = load_state(
                    args.loadstate, like={"bgs": bgs_state, "trk": trk_state}
                )
                bgs_state, trk_state = restored["bgs"], restored["trk"]
            elif preload and _os.path.exists(preload):
                from tracking_tpu.core.checkpoint import load_state

                bgs_state = load_state(preload, like=bgs_state)
                print(f"bg model: loaded {type(algo).__name__} model from {preload}")
            else:
                bgs_state = jax.jit(algo.warm_start)(bgs_state, jnp.asarray(chunk[0]))
        bgs_state, trk_state, fgs, tracks = run_chunk(
            bgs_state, trk_state, jnp.asarray(chunk), jnp.int32(n)
        )
        fgs = np.asarray(fgs)
        tr_np = jax.tree_util.tree_map(np.asarray, tracks)
        for i in range(len(fgs)):
            frame_tracks = jax.tree_util.tree_map(lambda a: a[i], tr_np)
            recorder.record(n + i, frame_tracks, raw=args.btpp == "None")
            # per-frame online analysis state (trackingMain.cpp:219-297):
            # scores of the live tracks vs the model learned so far
            scores = {}
            if ana is not None:
                ana.add_frame(n + i, frame_tracks, raw=args.btpp == "None")
                scores = ana.frame_scores()
            if args.fgavi:
                if fg_out is None:
                    fg_out = _writer(args.fgavi, 30.0, (fgs.shape[2], fgs.shape[1]))
                fg_out.write(cv2.cvtColor(fgs[i], cv2.COLOR_GRAY2BGR))
            if args.btavi:
                img = chunk[i].copy()
                act = frame_tracks.active
                for k in np.nonzero(act)[0]:
                    tid = int(frame_tracks.ids[k])
                    x, y = frame_tracks.x[k], frame_tracks.y[k]
                    w2, h2 = frame_tracks.w[k] / 2, frame_tracks.h[k] / 2
                    # legacy draw: abnormal tracks turn red
                    # (trackingMain.cpp:219-297 draws the analyser state)
                    abn = ana is not None and ana.is_abnormal(
                        scores.get(tid, 0.0)
                    )
                    color = (0, 0, 255) if abn else (0, 255, 0)
                    cv2.rectangle(
                        img,
                        (int(x - w2), int(y - h2)),
                        (int(x + w2), int(y + h2)),
                        color,
                        1,
                    )
                    cv2.putText(
                        img,
                        str(tid),
                        (int(x), int(y)),
                        cv2.FONT_HERSHEY_PLAIN,
                        1.0,
                        (0, 0, 255),
                    )
                if bt_out is None:
                    bt_out = _writer(args.btavi, 30.0, (img.shape[1], img.shape[0]))
                bt_out.write(img)
            if not args.quiet:
                act = frame_tracks.active
                blobs = []
                for k in np.nonzero(act)[0]:
                    tid = int(frame_tracks.ids[k])
                    mark = (
                        "!" if ana is not None
                        and ana.is_abnormal(scores.get(tid, 0.0)) else ""
                    )
                    blobs.append(
                        f"id={tid}{mark} ({frame_tracks.x[k]:.0f},{frame_tracks.y[k]:.0f})"
                    )
                if blobs:
                    print(f"frame {n + i}: " + " ".join(blobs))
        n += len(fgs)
    dt = time.perf_counter() - t0
    for o in (fg_out, bt_out):
        if o is not None:
            o.release()
    if args.savestate and bgs_state is not None:
        from tracking_tpu.core.checkpoint import save_state

        save_state(args.savestate, {"bgs": bgs_state, "trk": trk_state})
    # MLBGS finish(): in LEARN mode with saveModel the model is written to
    # bg_model_preload (default models/MultiLayerBGSModel) for a later
    # DETECT-mode preload (MultiLayerBGS.cpp:36-48)
    if (
        bgs_state is not None
        and getattr(algo.config, "saveModel", False)
        and getattr(algo.config, "status", "MLBGS_LEARN").upper().endswith("LEARN")
    ):
        from tracking_tpu.core.checkpoint import save_state

        path = getattr(algo.config, "bg_model_preload", "") or "models/MultiLayerBGSModel"
        save_state(path, bgs_state)
        print(f"bg model: saved {type(algo).__name__} model to {path}")
    if args.track:
        # btgen= module selection (trackingMain.cpp:505-516); default YML,
        # with the file extension as a fallback heuristic
        gen = args.btgen or (
            "RawTracks" if args.track.endswith(".csv") else "YML"
        )
        if gen == "YML":
            recorder.save_yml(args.track)
        else:
            recorder.save_csv(args.track)
    if ana is not None:
        # fold still-live tracks, then the end-of-run summary scores every
        # track against the final model (the online loop already printed /
        # drew the per-frame state)
        ana.finish()
        for tid, s in sorted(ana.abnormality(recorder).items()):
            mark = " ABNORMAL" if ana.is_abnormal(s) else ""
            print(f"track {tid}: abnormality={s:.2f} ({args.bta}){mark}")
        if args.bta_data:
            ana.save_data(args.bta_data)
            print(f"bta_data: saved analysis database to {args.bta_data}")
    print(f"tracking: {n} frames in {dt:.2f}s ({n / max(dt, 1e-9):.1f} fps)")
    return 0


def cdnet_run(argv=None):
    """CDnet-directory batch driver — parity with the USTC experimental
    mains: reads ``in%06d.jpg`` frames over a ROI frame range, processing
    from ``roi_start − bootstrap`` so the model settles before scoring
    (``ustc_src/shrinkBGS/main.cpp:21-24,55-74``), and writes ``bin%06d.png``
    masks for frames inside [roi_start, roi_stop]
    (``ustc_src/bgs_subsense_optical_flow/qt_cmake_bgs_sof/shrink.cpp:115-129``).
    """
    import os

    import cv2
    import jax.numpy as jnp

    from tracking_tpu.core.registry import get_algorithm
    from tracking_tpu.io.video import read_cdnet_dir
    from tracking_tpu.runner.scan import run_video

    p = argparse.ArgumentParser(
        description="CDnet in%06d.jpg batch runner (shrinkBGS/subsenseShrink parity)"
    )
    p.add_argument("input_dir", help="dir holding in%%06d.jpg frames")
    p.add_argument("--out", required=True, help="output dir for bin%%06d.png masks")
    p.add_argument("--roi", type=int, nargs=2, metavar=("START", "STOP"),
                   required=True, help="first/last frame number to score")
    p.add_argument("--bgs", default="shrinkBGS",
                   help="algorithm name (default shrinkBGS; e.g. subsenseShrink)")
    p.add_argument("--bootstrap", type=int, default=100,
                   help="frames processed before roi_start to settle the model "
                        "(main.cpp:24 uses 100)")
    p.add_argument("--chunk", type=int, default=64)
    args = p.parse_args(argv)

    start = max(args.roi[0] - args.bootstrap, 0)
    frames = read_cdnet_dir(args.input_dir, start, args.roi[1])
    os.makedirs(args.out, exist_ok=True)
    algo = get_algorithm(args.bgs)()
    state = None
    written = 0
    t0 = time.perf_counter()
    for i in range(0, len(frames), args.chunk):
        chunk = jnp.asarray(frames[i : i + args.chunk])
        state, masks = run_video(algo, chunk, state)
        masks = np.asarray(masks)
        for j in range(masks.shape[0]):
            fnum = start + i + j
            if fnum >= args.roi[0]:
                cv2.imwrite(os.path.join(args.out, f"bin{fnum:06d}.png"), masks[j])
                written += 1
    dt = time.perf_counter() - t0
    print(
        f"cdnet: {len(frames)} frames ({written} masks written to {args.out}) "
        f"in {dt:.2f}s ({len(frames) / max(dt, 1e-9):.1f} fps)"
    )
    return 0


def main(argv=None):
    """Dispatch: ``python -m tracking_tpu.runner.cli
    {bgs-run|tracking-run|cdnet-run} …``."""
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] in ("bgs-run", "bgs"):
        return bgs_run(argv[1:])
    if argv and argv[0] in ("tracking-run", "tracking"):
        return tracking_run(argv[1:])
    if argv and argv[0] in ("cdnet-run", "cdnet"):
        return cdnet_run(argv[1:])
    print("usage: python -m tracking_tpu.runner.cli {bgs-run|tracking-run|cdnet-run} ...")
    return 2


if __name__ == "__main__":
    sys.exit(main())
