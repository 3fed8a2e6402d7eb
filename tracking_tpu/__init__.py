"""tracking_tpu — a TPU-native (JAX/XLA/Pallas) video-surveillance framework.

A from-scratch rebuild of the capability surface of USTC-Computer-Vision/tracking
(BGSLibrary v1.9.2 + OpenCV legacy blob tracking), designed TPU-first:

- Video frames are batched into device-resident ``[T, H, W, C]`` tensors.
- Every background-subtraction (BGS) model is a *per-pixel state machine*
  ``state_{t+1}, mask_t = f(state_t, frame_t)`` expressed as a pure function and
  scanned over time with ``jax.lax.scan`` (reference: each ``IBGS::process``
  mutates per-pixel recurrent members, e.g.
  ``package_bgs/FrameDifferenceBGS.cpp:29-61``).
- Blob detection / tracking use XLA-friendly label propagation and fixed-capacity
  track tables instead of pointer-chasing (reference: OpenCV legacy
  ``CvBlobTrackerAuto``, driven from ``ustc_src/trackingMain.cpp:609-683``).
- Scale-out is via ``jax.sharding.Mesh`` + ``shard_map`` (streams × spatial tiles),
  something the single-threaded reference has no equivalent of.

See SURVEY.md at the repo root for the full structural map of the reference.
"""

from tracking_tpu.core.registry import get_algorithm, list_algorithms  # noqa: F401

__version__ = "0.1.0"
