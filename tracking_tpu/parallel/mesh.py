"""Device-mesh scale-out: streams × spatial tiles.

The reference is strictly single-threaded/single-process (SURVEY §2.10); the
TPU rebuild scales along the two embarrassing axes of the workload:

- ``stream``: independent video streams (data parallel — each stream's
  per-pixel state is private, zero communication).
- ``space``: image rows within a stream (spatial parallel — elementwise model
  updates need no comms; stencil ops (blur/morphology/LBSP) get their halos
  from XLA's automatic partitioner under ``jit`` with sharding annotations;
  frame-level reductions become ICI all-reduces).

Temporal recurrence is the only true sequential dependency and stays local as
``lax.scan`` — time is never sharded.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.7 exposes shard_map at top level (check_vma kwarg);
    # the experimental module (check_rep kwarg) is deprecated.
    from jax import shard_map as _shard_map_top

    def shard_map(f, mesh, in_specs, out_specs, check_rep=False):
        return _shard_map_top(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=check_rep,
        )
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


def make_mesh(
    n_devices: Optional[int] = None,
    stream: Optional[int] = None,
    devices=None,
) -> Mesh:
    """2-D mesh (stream × space) over available devices.

    Default split: put as many devices on `stream` as divide the device count
    at a balanced 2D aspect, favoring stream parallelism (zero-comm axis).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if stream is None:
        stream = 1
        for cand in range(int(np.sqrt(n)), 0, -1):
            if n % cand == 0:
                stream = max(cand, n // cand)
                break
    space = n // stream
    arr = np.asarray(devices).reshape(stream, space)
    return Mesh(arr, axis_names=("stream", "space"))


def video_batch_spec() -> P:
    """PartitionSpec for a [B, T, H, W, C] video batch: B→stream, H→space."""
    return P("stream", None, "space", None, None)


def shard_video_batch(frames: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Place a [B, T, H, W, C] u8 batch on the mesh (B→stream, H→space)."""
    spec = video_batch_spec()
    if frames.ndim == 4:  # gray [B, T, H, W]
        spec = P("stream", None, "space", None)
    return jax.device_put(frames, NamedSharding(mesh, spec))


def run_video_batch_shardmap(algo, frames: jnp.ndarray, mesh: Mesh, states=None):
    """Stream-parallel scale-out with per-device Pallas kernels.

    ``run_video_batch`` relies on XLA's automatic partitioner, which cannot
    split an opaque ``pallas_call`` — on real multi-chip hardware the fused
    TPU kernels would force replication. This runner instead ``shard_map``s
    the whole per-stream pipeline over the mesh's ``stream`` axis: each
    device runs complete streams locally (zero communication — per-stream
    state is private), so the Pallas fast path applies per device. This is
    the production configuration for throughput scale-out; spatial sharding
    (``run_video_batch``) is for the single-stream-too-big case and uses the
    XLA path.

    frames: [B, T, H, W, C] with B divisible by the mesh's stream size.
    Returns (states, masks [B, T, H, W]).
    """
    from tracking_tpu.runner.scan import make_step_fn

    b, t, h, w = frames.shape[:4]
    c = frames.shape[4] if frames.ndim == 5 else 1
    if states is None:
        states = jax.vmap(lambda _: algo.init(h, w, c))(jnp.arange(b))
        states = jax.jit(jax.vmap(algo.warm_start))(states, frames[:, 0])

    body = make_step_fn(algo, with_background=False)
    spec = P("stream")

    def local(states, frames):
        def one_stream(state, stream_frames):
            return jax.lax.scan(body, state, stream_frames)

        return jax.vmap(one_stream)(states, frames)

    fn = shard_map(
        local, mesh=mesh, in_specs=(spec, spec), out_specs=(spec, spec),
        check_rep=False,
    )
    return jax.jit(fn)(states, frames)


def run_video_batch(algo, frames: jnp.ndarray, states=None, mesh: Optional[Mesh] = None):
    """Multi-stream batched scan: frames [B, T, H, W, C] → masks [B, T, H, W].

    vmap over streams of the per-stream ``lax.scan``. With a mesh:

    - algorithms with explicit spatial-context support (the LBSP family) are
      routed to ``parallel.spatial.run_video_batch_spatial`` — one 2-D
      ``shard_map`` (streams x rows) whose collectives are all explicitly
      placed halo exchanges in a fixed program order. This is the production
      configuration (the fast-path kernels and the sharded path are the same
      path), and it sidesteps an XLA:CPU thunk-executor rendezvous deadlock
      the auto-partitioned consensus step can hit (racing subgroup
      all-to-alls; see parallel/spatial.py).
    - otherwise inputs are sharded (B→stream, H→space) and XLA partitions the
      whole scan — per-pixel updates shard cleanly, stencils exchange halos
      over ICI automatically.
    """
    import inspect

    from tracking_tpu.runner.scan import make_step_fn

    if mesh is not None:
        space_n = dict(mesh.shape).get("space", 1)
        h_glob = frames.shape[2]
        if (
            space_n > 1
            and "ctx" in inspect.signature(algo.step).parameters
            and h_glob % space_n == 0
        ):
            from tracking_tpu.parallel.spatial import (
                DEFAULT_HALO,
                run_video_batch_spatial,
            )

            if h_glob // space_n >= DEFAULT_HALO:  # halo fits one slab
                return run_video_batch_spatial(algo, frames, mesh, states=states)
        frames = shard_video_batch(frames, mesh)
    b, t, h, w = frames.shape[:4]
    c = frames.shape[4] if frames.ndim == 5 else 1
    if states is None:
        states = jax.vmap(lambda _: algo.init(h, w, c))(jnp.arange(b))
        states = jax.jit(jax.vmap(algo.warm_start))(states, frames[:, 0])

    body = make_step_fn(algo, with_background=False)

    @jax.jit
    def scan_all(states, frames):
        def one_stream(state, stream_frames):
            return jax.lax.scan(body, state, stream_frames)

        return jax.vmap(one_stream)(states, frames)

    return scan_all(states, frames)
