"""Mesh scale-out: sharded runs must equal the single-device computation.

Runs on the 8-virtual-device CPU mesh from conftest (the same configuration
the driver's dryrun uses).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tracking_tpu.core.registry import get_algorithm
from tracking_tpu.parallel.mesh import (
    make_mesh,
    run_video_batch,
    run_video_batch_shardmap,
)
from tracking_tpu.runner import run_video


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(7)
    base = rng.integers(0, 200, (4, 1, 32, 48, 3), np.uint8)
    frames = np.repeat(base, 6, axis=1)
    # moving bright square per stream
    for bidx in range(4):
        for t in range(6):
            frames[bidx, t, 8 + t : 16 + t, 10 + 2 * t : 20 + 2 * t] = 255
    return jnp.asarray(frames)


def _reference_masks(algo_name, frames):
    masks = []
    for bidx in range(frames.shape[0]):
        algo = get_algorithm(algo_name)()
        _, m = run_video(algo, frames[bidx])
        masks.append(np.asarray(m))
    return np.stack(masks)


def test_spatial_sharded_batch_matches_per_stream(batch):
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = make_mesh(8)
    algo = get_algorithm("FrameDifferenceBGS")()
    _, masks = run_video_batch(algo, batch, mesh=mesh)
    want = _reference_masks("FrameDifferenceBGS", batch)
    np.testing.assert_array_equal(np.asarray(masks), want)


def test_shardmap_stream_parallel_matches_per_stream(batch):
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = make_mesh(8, stream=4)
    algo = get_algorithm("MixtureOfGaussianV2BGS")()
    _, masks = run_video_batch_shardmap(algo, batch, mesh)
    want = _reference_masks("MixtureOfGaussianV2BGS", batch)
    np.testing.assert_array_equal(np.asarray(masks), want)


def test_shardmap_flagship_subsense(batch):
    """The flagship's full stochastic step under shard_map: shapes + masks
    match the unsharded vmap runner exactly (same keys, same decisions)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = make_mesh(8, stream=4)
    algo = get_algorithm("SuBSENSEBGS")()
    _, masks_sh = run_video_batch_shardmap(algo, batch, mesh)
    _, masks_un = run_video_batch(algo, batch)
    np.testing.assert_array_equal(np.asarray(masks_sh), np.asarray(masks_un))


def test_combined_stream_space_subsense(batch):
    """run_video_batch with a 2-D mesh routes the flagship to the explicit
    stream x space shard_map (run_video_batch_spatial): masks and state must
    be bit-identical to the unsharded per-stream run. This is the path the
    driver's dryrun exercises (the XLA auto-partitioned fallback deadlocks
    the CPU thunk executor on the consensus-v3 step)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = make_mesh(8)  # (stream=4, space=2); batch h=32 -> h_loc=16
    algo = get_algorithm("SuBSENSEBGS")()
    st_sh, masks_sh = run_video_batch(algo, batch, mesh=mesh)
    st_un, masks_un = run_video_batch(algo, batch)
    np.testing.assert_array_equal(np.asarray(masks_sh), np.asarray(masks_un))
    for a, b in zip(
        jax.tree_util.tree_leaves(st_sh), jax.tree_util.tree_leaves(st_un)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _spatial_stream(h, w, t=6, seed=3):
    """One moving-square stream at a given size."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 200, (1, h, w, 3), np.uint8)
    frames = np.repeat(base, t, axis=0)
    for i in range(t):
        frames[i, h // 4 + i : h // 4 + 8 + i, 10 + 2 * i : 24 + 2 * i] = 255
    return jnp.asarray(frames)


@pytest.mark.parametrize("name", ["SuBSENSEBGS", "LOBSTERBGS"])
def test_spatial_single_stream_exact(name):
    """8-way row-sharded single stream (explicit ppermute halo exchange)
    produces bit-identical masks AND state to the unsharded run."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from tracking_tpu.parallel.spatial import run_video_spatial

    mesh = make_mesh(8, stream=1)
    frames = _spatial_stream(64, 48)
    algo = get_algorithm(name)()
    st_sp, masks_sp = run_video_spatial(algo, frames, mesh)
    st_un, masks_un = run_video(algo, frames)
    np.testing.assert_array_equal(np.asarray(masks_sp), np.asarray(masks_un))
    for a, b in zip(
        jax.tree_util.tree_leaves(st_sp), jax.tree_util.tree_leaves(st_un)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_spatial_exact_at_scaling_size():
    """≥QVGA engages SuBSENSE's frame-level motion analysis / auto-reset
    machinery (BackgroundSubtractorSuBSENSE.cpp:655-699): the sharded run
    must still match bit-for-bit (replicated frame-level state, psum'd
    statistics)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from tracking_tpu.parallel.spatial import run_video_spatial

    mesh = make_mesh(8, stream=1)
    frames = _spatial_stream(240, 320, t=4)
    algo = get_algorithm("SuBSENSEBGS")()
    st_sp, masks_sp = run_video_spatial(algo, frames, mesh)
    st_un, masks_un = run_video(algo, frames)
    np.testing.assert_array_equal(np.asarray(masks_sp), np.asarray(masks_un))
    for a, b in zip(
        jax.tree_util.tree_leaves(st_sp), jax.tree_util.tree_leaves(st_un)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("name", ["SuBSENSEBGS", "LOBSTERBGS"])
def test_spatial_pallas_kernel_exact(name):
    """The sharded Pallas fast path (consensus kernel per shard on
    halo-extended slabs, row_ext contract; TRACKING_TPU_SPATIAL=interp) is
    bit-identical to the unsharded run — masks AND state, including the
    multi-hop halo exchange (E=24 > h_loc=8 here spans 3 neighbor shards)."""
    import os

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from tracking_tpu.parallel.spatial import run_video_spatial

    mesh = make_mesh(8, stream=1)
    frames = _spatial_stream(64, 48)
    os.environ["TRACKING_TPU_SPATIAL"] = "interp"
    try:
        algo = get_algorithm(name)()
        st_sp, masks_sp = run_video_spatial(algo, frames, mesh)
    finally:
        os.environ.pop("TRACKING_TPU_SPATIAL", None)
    algo2 = get_algorithm(name)()
    st_un, masks_un = run_video(algo2, frames)
    np.testing.assert_array_equal(np.asarray(masks_sp), np.asarray(masks_un))
    for a, b in zip(
        jax.tree_util.tree_leaves(st_sp), jax.tree_util.tree_leaves(st_un)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_blob_extraction_exact():
    """Row-sharded CC labeling + blob extraction (the replicated-tail fix:
    per-shard raster/min-label fixpoints with boundary-injection rounds,
    psum'd integer moment matrices) returns a Blobs table bit-identical to
    the unsharded ops.cc.extract_blobs — including components that span
    several shard cuts and 8-connectivity diagonal-only couplings."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tracking_tpu.ops.cc import extract_blobs, label_components
    from tracking_tpu.parallel.mesh import shard_map
    from tracking_tpu.parallel.spatial import (
        SpatialCtx,
        sharded_extract_blobs,
        sharded_label,
    )

    H, W = 64, 48
    rng = np.random.default_rng(11)
    # blocky content (×8-upsampled coarse noise) keeps the component count
    # under the MXU path's 128-candidate compaction, same as real masks
    coarse = rng.random((8, 6)) < 0.3
    mask = np.kron(coarse, np.ones((8, 8), bool)).astype(np.uint8) * 255
    # a blob spanning all 8 shards + a diagonal-only chain across a cut
    mask[4:62, 20:23] = 255
    mask[7, 0], mask[8, 1], mask[9, 0] = 255, 255, 255  # h_loc=8 cut at y=8
    mask = jnp.asarray(mask)

    mesh = make_mesh(8, stream=1)
    spec = P("space", None)

    def local_fn(m):
        ctx = SpatialCtx("space", 8, H)
        lab = sharded_label(ctx, m)
        blobs = sharded_extract_blobs(ctx, m)
        return lab, blobs

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(spec,),
        out_specs=(spec, P()),
        check_rep=False,
    )
    m_sh = jax.device_put(mask, NamedSharding(mesh, spec))
    lab_sh, blobs_sh = jax.jit(fn)(m_sh)

    np.testing.assert_array_equal(
        np.asarray(lab_sh), np.asarray(label_components(mask))
    )
    want = extract_blobs(mask)
    got = blobs_sh
    for field in want._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(got, field)),
            np.asarray(getattr(want, field)),
            err_msg=field,
        )


def test_sharded_refresh_samples_exact():
    """The auto-reset model refresh (_refresh_samples) with the spatial
    hooks — halo-slab sources via extend_border/shift_ext, row-sliced global
    offset draw — is bit-identical to the unsharded global-shape refresh.
    The full-step equality tests never fire the (rare) trigger branch, so
    this pins the branch's numerics directly."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tracking_tpu.bgs.lbsp_family import _refresh_samples
    from tracking_tpu.parallel.mesh import shard_map
    from tracking_tpu.parallel.spatial import SpatialCtx, spatial_specs

    H, W, C, N = 64, 48, 3, 10
    rng = np.random.default_rng(5)
    key = jax.random.PRNGKey(42)
    planes = tuple(jnp.asarray(rng.integers(0, 256, (H, W), np.uint8)) for _ in range(C))
    intra = tuple(jnp.asarray(rng.integers(0, 1 << 16, (H, W)).astype(np.uint16)) for _ in range(C))
    ok = jnp.asarray(rng.random((H, W)) < 0.7)
    colors = tuple(jnp.asarray(rng.integers(0, 256, (N, H, W), np.uint8)) for _ in range(C))
    descs = tuple(jnp.asarray(rng.integers(0, 1 << 16, (N, H, W)).astype(np.uint16)) for _ in range(C))
    start = jnp.asarray(3, jnp.int32)

    want_c, want_d = jax.jit(
        lambda co, de: _refresh_samples(key, N, 2, start, planes, intra, ok, co, de)
    )(colors, descs)

    mesh = make_mesh(8, stream=1)
    state = {"colors": colors, "descs": descs, "planes": planes,
             "intra": intra, "ok": ok}
    specs = spatial_specs(state, H)

    def local_fn(st):
        ctx = SpatialCtx("space", 8, H)
        rs_kw = dict(
            own=ctx.rng_rows,
            shift=lambda s, dy, dx: ctx.shift_ext(s, -dy, -dx),
            ok_own=st["ok"],
            global_h=H,
        )
        src_p = tuple(ctx.extend_border(p) for p in st["planes"])
        src_i = tuple(ctx.extend_border(d) for d in st["intra"])
        ok_ext = ctx.extend_border(st["ok"])
        return _refresh_samples(
            key, N, 2, start, src_p, src_i, ok_ext,
            st["colors"], st["descs"], **rs_kw,
        )

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(specs,),
        out_specs=(specs["colors"], specs["descs"]),
        check_rep=False,
    )
    st_sh = jax.device_put(
        state, jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs)
    )
    got_c, got_d = jax.jit(fn)(st_sh)
    for a, b in zip(got_c + got_d, want_c + want_d):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _crossing_stream(h, w, t=12):
    """Two bright squares crossing on a clean background — confirmed tracks
    whose predicted boxes overlap mid-sequence, so the CCMSPF mean-shift
    collision resolver actually ENGAGES (not just compiles). Frame 0 is
    pure background (warm_start learns it → crisp SuBSENSE masks); the
    squares appear from frame 1 with vertical centers 7 px apart (< the
    8-px box-overlap gate) moving toward each other at 4 px/frame. With
    newBlobDetectFrames=3 both tracks confirm at frame 3 and the collision
    condition holds frames 6-10 (probed: 10 track-frame engagements, two
    stable ids through the crossing)."""
    frames = np.full((t, h, w, 3), 30, np.uint8)
    y = h // 2
    for i in range(1, t):
        xl = 4 + 4 * (i - 1)
        xr = w - 12 - 4 * (i - 1)
        frames[i, y - 11 : y - 3, xl : xl + 8] = 255
        frames[i, y - 4 : y + 4, xr : xr + 8] = 220
    return jnp.asarray(frames)


@pytest.mark.parametrize(
    "ttype,pipelined",
    [("CC", False), ("CCMSPF", False), ("CCMSPF", True)],
)
def test_spatial_tracked_pipeline_exact(ttype, pipelined):
    """The FULL sharded pipeline — row-sharded BGS + sharded blob
    extraction + replicated tracking (run_video_spatial_tracked) — is
    bit-identical to the unsharded step->track chain: masks, final track
    table, and per-frame track outputs. Covers the reference's DEFAULT
    tracker (CCMSPF with mean-shift collision resolution, psum-combined
    window moments) and the software-pipelined tracking stage (tracking
    one frame behind BGS; same tracker.step calls, same inputs, same
    order — outputs must be identical, the one-frame latency is purely
    schedule)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from tracking_tpu.parallel.spatial import run_video_spatial_tracked
    from tracking_tpu.track.tracker import BlobTracker

    mesh = make_mesh(8, stream=1)
    if ttype == "CCMSPF":
        # relaxed confirmation so the crossing engages within 12 frames
        # (same knobs as tests/test_track.py's unsharded crossing test)
        frames = _crossing_stream(64, 64, t=12)
        tkw = dict(newBlobDetectFrames=3, minBlobArea=10, maxLostFrames=5)
    else:
        frames = _spatial_stream(64, 48)
        tkw = {}
    algo = get_algorithm("SuBSENSEBGS")()
    tracker = BlobTracker(trackerType=ttype, **tkw)
    assert tracker.config.useMeanShiftCollision  # default stays on
    st_sp, ts_sp, masks_sp, xs_sp = run_video_spatial_tracked(
        algo, tracker, frames, mesh, pipelined=pipelined
    )

    algo2 = get_algorithm("SuBSENSEBGS")()
    tracker2 = BlobTracker(trackerType=ttype, **tkw)
    st = algo2.init(*frames.shape[1:3], frames.shape[3])
    st = jax.jit(algo2.warm_start)(st, frames[0])
    ts = tracker2.init()
    masks_un, xs_un = [], []
    for f in frames:
        st, fg, _bg = algo2.step(st, f)
        ts, tracks = tracker2.step(ts, fg)
        masks_un.append(np.asarray(fg))
        xs_un.append(np.asarray(tracks.x))

    np.testing.assert_array_equal(np.asarray(masks_sp), np.stack(masks_un))
    np.testing.assert_array_equal(np.asarray(xs_sp), np.stack(xs_un))
    for a, b in zip(
        jax.tree_util.tree_leaves(ts_sp), jax.tree_util.tree_leaves(ts)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
