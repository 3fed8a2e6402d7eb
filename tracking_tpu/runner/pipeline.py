"""Pipeline orchestration: PreProcessor + FrameProcessor equivalents.

The reference's ``FrameProcessor`` owns one optional instance of every BGS
algorithm behind ``enableX`` flags and runs PreProcessor → each enabled BGS in
sequence on the same prepped frame, then optional mask scoring
(``FrameProcessor.cpp:169-340``, ``FrameProcessor.h:80-242``). The TPU-native
form folds the whole fan-out into ONE ``lax.scan`` body: N algorithms share a
single pass over the video, so the frame is read from HBM once per step and
XLA fuses the pre-processing into every consumer.

tictoc (``FrameProcessor.cpp:157-167,484-494``) becomes ``profile()``:
per-algorithm wall clock with a device-fetch barrier per algorithm.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp

from tracking_tpu.bgs.base import BGSAlgorithm
from tracking_tpu.core.config import BGSConfig
from tracking_tpu.ops.filters import gaussian_blur
from tracking_tpu.ops.hist import equalize_hist


@dataclasses.dataclass(frozen=True)
class PreProcessorConfig(BGSConfig):
    """config/PreProcessor.xml (``PreProcessor.cpp:128-150``)."""

    equalizeHist: bool = False
    gaussianBlur: bool = False
    enableShow: bool = True


class PreProcessor:
    """BGR→(optional equalize)→(optional 7×7 σ=1.5 blur).

    Faithful quirk: the reference's output stays *color* (``img_input.copyTo``
    at ``PreProcessor.cpp:56``); the gray conversion at ``:60`` is stored
    separately and unused downstream. ``equalizeHist`` on a color frame would
    abort in OpenCV — here it is applied per-channel only when the input is
    already gray, matching the only configuration that actually runs.
    """

    Config = PreProcessorConfig

    def __init__(self, config: Optional[PreProcessorConfig] = None, **kw):
        self.config = (config or PreProcessorConfig()).replace(**kw) if kw else (
            config or PreProcessorConfig()
        )

    def process(self, frame: jnp.ndarray) -> jnp.ndarray:
        out = frame
        if self.config.equalizeHist and frame.ndim == 2:
            out = equalize_hist(out)
        if self.config.gaussianBlur:
            out = gaussian_blur(out, 7, 1.5)
        return out

    @staticmethod
    def rotate(frame: jnp.ndarray, angle_deg: float) -> jnp.ndarray:
        """Parity with the reference's (unused) ``PreProcessor::rotate``
        (``PreProcessor.cpp:79-104``, cvWarpAffine about the image center):
        bilinear rotation, zero-filled outside. Device-side via one
        coordinate-transform resample."""
        import numpy as np

        h, w = frame.shape[0], frame.shape[1]
        th = np.deg2rad(-angle_deg)  # cv2DRotationMatrix angle convention
        c, s = np.cos(th), np.sin(th)
        cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
        yy, xx = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
        # inverse map (destination → source)
        sx = c * (xx - cx) + s * (yy - cy) + cx
        sy = -s * (xx - cx) + c * (yy - cy) + cy
        x0 = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, w - 1)
        y0 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, h - 1)
        x1 = jnp.clip(x0 + 1, 0, w - 1)
        y1 = jnp.clip(y0 + 1, 0, h - 1)
        fx = jnp.clip(sx - x0, 0.0, 1.0)
        fy = jnp.clip(sy - y0, 0.0, 1.0)
        f = frame.astype(jnp.float32)
        if frame.ndim == 3:
            fx, fy = fx[..., None], fy[..., None]
        v = (
            f[y0, x0] * (1 - fx) * (1 - fy)
            + f[y0, x1] * fx * (1 - fy)
            + f[y1, x0] * (1 - fx) * fy
            + f[y1, x1] * fx * fy
        )
        inside = (sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1)
        if frame.ndim == 3:
            inside = inside[..., None]
        return jnp.where(inside, jnp.rint(v), 0).astype(frame.dtype)


_ENABLE_FLAGS = (
    # verbatim flag order of config/FrameProcessor.xml (FrameProcessor.h:80-242);
    # values are the registry names the flags enable.
    ("enableFrameDifferenceBGS", "FrameDifferenceBGS"),
    ("enableStaticFrameDifferenceBGS", "StaticFrameDifferenceBGS"),
    ("enableWeightedMovingMeanBGS", "WeightedMovingMeanBGS"),
    ("enableWeightedMovingVarianceBGS", "WeightedMovingVarianceBGS"),
    ("enableMixtureOfGaussianV1BGS", "MixtureOfGaussianV1BGS"),
    ("enableMixtureOfGaussianV2BGS", "MixtureOfGaussianV2BGS"),
    ("enableAdaptiveBackgroundLearning", "AdaptiveBackgroundLearning"),
    ("enableGMG", "GMG"),
    ("enableDPAdaptiveMedianBGS", "DPAdaptiveMedianBGS"),
    ("enableDPGrimsonGMMBGS", "DPGrimsonGMMBGS"),
    ("enableDPZivkovicAGMMBGS", "DPZivkovicAGMMBGS"),
    ("enableDPMeanBGS", "DPMeanBGS"),
    ("enableDPWrenGABGS", "DPWrenGABGS"),
    ("enableDPPratiMediodBGS", "DPPratiMediodBGS"),
    ("enableDPEigenbackgroundBGS", "DPEigenbackgroundBGS"),
    ("enableDPTextureBGS", "DPTextureBGS"),
    ("enableT2FGMM_UM", "T2FGMM_UM"),
    ("enableT2FGMM_UV", "T2FGMM_UV"),
    ("enableT2FMRF_UM", "T2FMRF_UM"),
    ("enableT2FMRF_UV", "T2FMRF_UV"),
    ("enableFuzzySugenoIntegral", "FuzzySugenoIntegral"),
    ("enableFuzzyChoquetIntegral", "FuzzyChoquetIntegral"),
    ("enableLBSimpleGaussian", "LBSimpleGaussian"),
    ("enableLBFuzzyGaussian", "LBFuzzyGaussian"),
    ("enableLBMixtureOfGaussians", "LBMixtureOfGaussians"),
    ("enableLBAdaptiveSOM", "LBAdaptiveSOM"),
    ("enableLBFuzzyAdaptiveSOM", "LBFuzzyAdaptiveSOM"),
    ("enableLbpMrf", "LbpMrf"),
    ("enableMultiLayerBGS", "MultiLayerBGS"),
    ("enableVuMeter", "VuMeter"),
    ("enableKDE", "KDE"),
    ("enableIMBS", "IndependentMultimodalBGS"),
    ("enableMultiCueBGS", "SJN_MultiCueBGS"),
    ("enableSigmaDeltaBGS", "SigmaDeltaBGS"),
    ("enableSuBSENSEBGS", "SuBSENSEBGS"),
    ("enableLOBSTERBGS", "LOBSTERBGS"),
)

FrameProcessorConfig = dataclasses.make_dataclass(
    "FrameProcessorConfig",
    [("tictoc", str, dataclasses.field(default=""))]
    + [("enablePreProcessor", bool, dataclasses.field(default=True))]
    + [("enableForegroundMaskAnalysis", bool, dataclasses.field(default=False))]
    + [
        (flag, bool, dataclasses.field(default=(flag == "enableFrameDifferenceBGS")))
        for flag, _ in _ENABLE_FLAGS
    ],
    bases=(BGSConfig,),
    frozen=True,
)
FrameProcessorConfig.__doc__ = (
    "config/FrameProcessor.xml master switches (FrameProcessor.h:80-242): "
    "one enableX flag per BGS algorithm, PreProcessor/mask-analysis toggles, "
    "and the tictoc algorithm name. Defaults match the reference's checked-in "
    "build/config/FrameProcessor.xml (PreProcessor + FrameDifference on)."
)


class FrameProcessor:
    """Fan-out of N enabled BGS algorithms over one shared video pass.

    API mirror of ``FrameProcessor::init/process/finish``
    (``FrameProcessor.h:251-253``) in functional form:

        fp = FrameProcessor({"framediff": algo1, "mog2": algo2}, pre_cfg)
        states = fp.init(h, w, c)
        states, masks = fp.step(states, frame)     # masks: dict name → [H,W] u8

    ``FrameProcessor.from_config_dir(dir)`` reproduces the reference's
    XML-driven construction: the enable flags of ``dir/FrameProcessor.xml``
    pick the algorithms (``FrameProcessor::init``, ``FrameProcessor.cpp:35-155``),
    each algorithm's own ``dir/<Name>.xml`` configures it, and — saveConfig
    parity (``FrameDifferenceBGS.cpp:62-72``) — missing XML files are written
    out with defaults so the directory becomes self-documenting.
    """

    def __init__(
        self,
        algorithms: Mapping[str, BGSAlgorithm],
        pre: Optional[PreProcessorConfig] = None,
    ):
        self.algorithms = dict(algorithms)
        self.pre = PreProcessor(pre)
        # one jit per instance: rebuilding the fan-out (config reload)
        # recompiles; steady-state chunks hit the cache
        self._scan = jax.jit(
            lambda states, frames: jax.lax.scan(self.step, states, frames)
        )

    @classmethod
    def from_config_dir(cls, config_dir: str) -> "FrameProcessor":
        """Build the fan-out from ``config_dir/FrameProcessor.xml`` enable
        flags (+ per-algorithm XMLs), writing default XMLs where missing."""
        import os

        from tracking_tpu.core.config import config_from_xml, config_to_xml
        from tracking_tpu.core.registry import get_algorithm

        fp_path = os.path.join(config_dir, "FrameProcessor.xml")
        fp_cfg = config_from_xml(FrameProcessorConfig, fp_path)
        if not os.path.exists(fp_path):
            config_to_xml(fp_cfg, fp_path)
        pre_path = os.path.join(config_dir, "PreProcessor.xml")
        pre_cfg = config_from_xml(PreProcessorConfig, pre_path)
        if not os.path.exists(pre_path):
            config_to_xml(pre_cfg, pre_path)
        if not fp_cfg.enablePreProcessor:
            pre_cfg = PreProcessorConfig()  # pass-through defaults
        algos = {}
        for flag, name in _ENABLE_FLAGS:
            if not getattr(fp_cfg, flag):
                continue
            algo_cls = get_algorithm(name)
            a_path = os.path.join(config_dir, f"{name}.xml")
            a_cfg = config_from_xml(algo_cls.Config, a_path)
            if not os.path.exists(a_path):
                config_to_xml(a_cfg, a_path)
            algos[name] = algo_cls(a_cfg)
        fp = cls(algos, pre_cfg)
        fp.config = fp_cfg
        return fp

    def init(self, h: int, w: int, c: int = 3) -> Dict[str, object]:
        return {name: a.init(h, w, c) for name, a in self.algorithms.items()}

    def warm_start(self, states, frame):
        prepped = self.pre.process(frame)
        return {
            name: a.warm_start(states[name], prepped)
            for name, a in self.algorithms.items()
        }

    def step(self, states, frame) -> Tuple[Dict[str, object], Dict[str, jnp.ndarray]]:
        prepped = self.pre.process(frame)
        new_states, masks = {}, {}
        for name, algo in self.algorithms.items():
            new_states[name], masks[name], _bg = algo.step(states[name], prepped)
        return new_states, masks

    def run(self, frames: jnp.ndarray, states=None):
        """Scan all enabled algorithms over [T, H, W, C] in one compiled pass."""
        h, w = frames.shape[1], frames.shape[2]
        c = frames.shape[3] if frames.ndim == 4 else 1
        if states is None:
            states = self.init(h, w, c)
            states = jax.jit(self.warm_start)(states, frames[0])
        return self._scan(states, frames)

    def profile(self, frames: jnp.ndarray, repeats: int = 3) -> Dict[str, float]:
        """tictoc equivalent: per-algorithm seconds over the chunk (min of
        `repeats`, fetch-barriered)."""
        from tracking_tpu.runner.scan import run_video

        timings: Dict[str, float] = {}
        pre_fn = jax.jit(jax.vmap(self.pre.process))
        prepped = pre_fn(frames)  # compile + use for the per-algorithm runs
        _ = int(jnp.sum(prepped[-1].astype(jnp.uint32)))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            p = pre_fn(frames)
            _ = int(jnp.sum(p[-1].astype(jnp.uint32)))
            best = min(best, time.perf_counter() - t0)
        timings["PreProcessor"] = best
        for name, algo in self.algorithms.items():
            state, masks = run_video(algo, prepped)  # compile
            _ = int(jnp.sum(masks[-1].astype(jnp.uint32)))
            best = float("inf")
            for _ in range(repeats):
                t0 = time.perf_counter()
                _, masks = run_video(algo, prepped)
                _ = int(jnp.sum(masks[-1].astype(jnp.uint32)))
                best = min(best, time.perf_counter() - t0)
            timings[name] = best
        return timings
