"""Test harness config: run on CPU with 8 virtual devices.

Tests never assume TPU hardware; multi-chip sharding tests use the virtual
CPU mesh (``--xla_force_host_platform_device_count=8``), matching how the
driver dry-runs the multi-chip path.
"""

import os

# Must be set before the first jax backend initialization. The container's
# sitecustomize registers the axon TPU plugin and pins JAX_PLATFORMS=axon, so
# a plain env var is not enough — override the config knob too (works as long
# as no backend has been touched yet in this process).
# TPU_GOLDEN=1 escapes the CPU pin so tests/test_tpu_golden.py can drive the
# real chip (pytest loads this conftest regardless of cwd).
if not os.environ.get("TPU_GOLDEN"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
    # XLA:CPU's loop-fusion emitter goes pathological on the big select-DAG
    # algorithms: a single fused MultiLayer step at 64×128 measured 134 s
    # executing (vs 0.02 s with the fusion pass disabled — 6700×; the same
    # values consumed through reduce-root fusions run fine). CPU is only the
    # test/dryrun backend — unfused materialization at test sizes is cheap —
    # and the TPU path never sees this flag.
    if "xla_disable_hlo_passes" not in _flags:
        _flags = (_flags + " --xla_disable_hlo_passes=fusion").strip()
    os.environ["XLA_FLAGS"] = _flags

    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = "/root/reference"

# ---------------------------------------------------------------------------
# Test tiers (VERDICT round-1 item 10): `pytest -m fast` is the <5 min
# developer loop covering every module; the full suite (~1 h on CPU) is the
# CI-style gate. Policy: tests named below (measured heaviest via
# --durations=0 on the full run) are marked slow; everything else is
# auto-marked fast. Every test FILE keeps at least one fast test so the
# fast tier still touches every module.
# ---------------------------------------------------------------------------
SLOW_TESTS = {
    # golden-oracle sweeps (compile + 130-frame CPU scans per algorithm)
    "test_golden_vs_reference_cpp",
    "test_golden_imbs_after_model_creation",
    "test_golden_shrink_vs_reference_cpp",
    "test_golden_subsense_shrink_vs_reference_cpp",
    "test_subsense_v2_behaves_like_v1",
    # heavy simulations (minutes each on CPU)
    "test_multilayer_vs_oracle",
    "test_t2fmrf_vs_oracle",
    "test_consensus_matches_reference_scan",
    "test_multicue_behavioral",
    "test_kde_vs_oracle",
    "test_real_video_all_algorithms",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.name.split("[")[0]
        if base in SLOW_TESTS or item.get_closest_marker("slow"):
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.fast)


# ---------------------------------------------------------------------------
# XLA:CPU's backend_compile segfaults after a few hundred programs have been
# compiled in one process (observed twice at the full-suite tail, at
# *different* tests — test_track's meanshift vmap, then test_bgs_t2f's fuzzy
# integrals — each passing standalone; the faulting frame is always
# compiler.py backend_compile_and_load). Dropping the accumulated compile
# caches every few dozen tests bounds the resident-program count and avoids
# it; with the fusion pass disabled (above) recompiles are cheap.
# ---------------------------------------------------------------------------
_TESTS_SINCE_CLEAR = {"n": 0}


@pytest.fixture(autouse=True)
def _periodic_compile_cache_clear():
    yield
    _TESTS_SINCE_CLEAR["n"] += 1
    if _TESTS_SINCE_CLEAR["n"] >= 25:
        _TESTS_SINCE_CLEAR["n"] = 0
        import jax

        jax.clear_caches()


@pytest.fixture(scope="session")
def video_frames():
    """First 40 BGR frames of the reference's dataset/video.avi (320×176)."""
    from tracking_tpu.io.video import read_video

    path = os.path.join(REFERENCE, "dataset", "video.avi")
    if not os.path.exists(path):
        pytest.skip("reference video fixture not available")
    return read_video(path, max_frames=40)


@pytest.fixture(scope="session")
def png_frames():
    """The reference's frames/1..51.png sequence (320×240 color)."""
    from tracking_tpu.io.video import read_frame_dir

    path = os.path.join(REFERENCE, "frames")
    if not os.path.exists(path):
        pytest.skip("reference frames fixture not available")
    return read_frame_dir(path)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
