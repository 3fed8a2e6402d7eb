"""DPEigenbackgroundBGS — ustc type 15 (Oliver et al. PCA eigenbackground).

Reference: ``dp/Eigenbackground.cpp:51-190``, wrapper defaults
``dp/DPEigenbackgroundBGS.cpp`` (threshold 225, historySize 20,
embeddedDim 10). The first HistorySize frames fill a history matrix (masks
empty meanwhile); at frame == HistorySize a PCA basis is computed once (the
model is never updated afterwards — the reference notes this "serious
limitation" itself); every later frame is projected onto the top EmbeddedDim
components, reconstructed, and a pixel is FG when any channel's squared
reconstruction error exceeds the (high=2×) threshold.

TPU mapping: the history Gram matrix is [S, S] (S=20) so the eigensolve is
trivial; projection/reconstruction are two [S, D]-by-[D]-sized matmuls per
frame — actual MXU work, unlike the elementwise families. The PCA-at-frame-S
branch runs under ``lax.cond`` inside the scan.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tracking_tpu.bgs.base import BGSAlgorithm, State, StepResult
from tracking_tpu.core.config import BGSConfig
from tracking_tpu.core.registry import register


@dataclasses.dataclass(frozen=True)
class EigenbackgroundConfig(BGSConfig):
    threshold: int = 225
    historySize: int = 20
    embeddedDim: int = 10
    showOutput: bool = True


@register("DPEigenbackgroundBGS", type_id=15, aliases=("eigenbackground",))
class DPEigenbackground(BGSAlgorithm):
    Config = EigenbackgroundConfig

    def init(self, h: int, w: int, c: int = 3) -> State:
        c = max(c, 1)
        S = self.config.historySize
        D = h * w * c
        return {
            "t": jnp.zeros((), jnp.int32),
            "history": jnp.zeros((S, D), jnp.uint8),
            "mean": jnp.zeros((D,), jnp.float32),
            "basis": jnp.zeros((self.config.embeddedDim, D), jnp.float32),
        }

    def step(self, state: State, frame: jnp.ndarray) -> StepResult:
        cfg = self.config
        S, E = cfg.historySize, cfg.embeddedDim
        t = state["t"]
        h, w = frame.shape[0], frame.shape[1]
        c = frame.shape[2] if frame.ndim == 3 else 1
        flat = frame.reshape(-1).astype(jnp.float32)  # [D]
        D = flat.shape[0]

        # build PCA at t == S from the filled history (:80-99)
        def build_pca(args):
            history, _, _ = args
            X = history.astype(jnp.float32)  # [S, D]
            mean = jnp.mean(X, axis=0)
            Xc = X - mean[None]
            # Gram trick: eig of Xc Xcᵀ [S, S]; OpenCV normalizes rows of
            # (evecᵀ Xc) to unit length.
            G = Xc @ Xc.T
            evals, evecs = jnp.linalg.eigh(G)  # ascending
            order = jnp.argsort(-evals)
            evecs = evecs[:, order]  # [S, S], columns = top components
            comps = evecs.T @ Xc  # [S, D]
            norms = jnp.linalg.norm(comps, axis=1, keepdims=True)
            comps = comps / jnp.maximum(norms, 1e-12)
            return mean, comps[:E]

        def keep(args):
            _, mean, basis = args
            return mean, basis

        mean, basis = jax.lax.cond(
            t == S, build_pca, keep, (state["history"], state["mean"], state["basis"])
        )

        # project + reconstruct + threshold (:102-158)
        xc = flat - mean
        proj = basis @ xc  # [E]
        recon = mean + basis.T @ proj  # [D]
        err2 = jnp.square(flat - recon).reshape(frame.shape)
        if frame.ndim == 2:
            err2 = err2[..., None]
        fg_any = jnp.any(err2 > 2.0 * cfg.threshold, axis=-1)
        fg = jnp.where(fg_any & (t >= S), jnp.uint8(255), jnp.uint8(0))

        # history fill while t < S (:181-190)
        slot = jnp.minimum(t, S - 1)
        new_hist = jnp.where(
            t < S,
            state["history"].at[slot].set(frame.reshape(-1)),
            state["history"],
        )

        bg_flat = jnp.clip(recon + 0.5, 0, 255).astype(jnp.uint8)
        bg = bg_flat.reshape(frame.shape)
        new_state = {
            "t": t + 1,
            "history": new_hist,
            "mean": mean,
            "basis": basis,
        }
        return new_state, fg, bg
