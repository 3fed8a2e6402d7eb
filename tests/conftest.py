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
# Test tiers (VERDICT round-1 item 10), re-measured round 2 on the 1-core
# container (`pytest -m fast --durations=50` solo run, 33:49 total before
# this re-tiering — XLA compiles dominate, so "auto-fast everything" was
# never a 5-minute loop on this host):
#
#   fast   = the explicit FAST_TESTS allowlist — the lightest test(s) of
#            every module, targeted <5 min total.
#   medium = everything else: the ~15-min `pytest -m "not slow"`
#            pre-commit gate.
#   slow   = the explicit SLOW_TESTS list: golden-oracle sweeps, minutes-
#            long simulations, and the sharding-equality suites.
#
# Matching is by bare test name or by exact parameterized id.
# ---------------------------------------------------------------------------
SLOW_TESTS = {
    # golden-oracle sweeps (compile + 130-frame CPU scans per algorithm)
    "test_golden_vs_reference_cpp",
    "test_golden_imbs_after_model_creation",
    "test_golden_shrink_vs_reference_cpp",
    "test_golden_subsense_shrink_vs_reference_cpp",
    "test_golden_lbpmrf_vs_reference_cpp",
    "test_subsense_v2_behaves_like_v1",
    # heavy simulations (minutes each on CPU)
    "test_multilayer_vs_oracle",
    "test_t2fmrf_vs_oracle",
    "test_consensus_matches_reference_scan",
    "test_multicue_behavioral",
    "test_kde_vs_oracle",
    "test_real_video_all_algorithms",
    # round-2 additions (measured 40-265 s each on the 1-core host)
    "test_every_registered_algorithm_steps",   # 265 s; breadth via per-family files
    "test_spatial_exact_at_scaling_size",      # 149 s
    "test_combined_stream_space_subsense",     # 77 s
    "test_spatial_single_stream_exact",        # 72/46 s (both params)
    "test_shardmap_flagship_subsense",         # 70 s
    "test_multicue_trains_then_detects_object",        # 90 s
    "test_multicue_small_specks_filtered",             # 80 s
    "test_multicue_codebooks_stay_compact_on_static_scene",  # 69 s
    "test_shrink_offset_only_from_signed_positive_bytes",    # 74 s
    "test_boxes_envelop_background_and_track_noise",         # 39 s
    "test_ms_family_trackers_follow_moving_blob",      # 74 s
    "test_ccmspf_keeps_ids_through_crossing",          # 44 s
    "test_bd_cc_uniform_motion_gate",                  # 40 s
    "test_checkpoint_roundtrip_any_algorithm",         # 57 s
    "test_spatial_tracked_pipeline_exact",             # 157 s/param (round 3; round 4 adds CCMSPF + pipelined params)
    "test_fgd_cooccurrence_absorbs_dynamic_background",  # 32 s
    "test_fgd_f16_long_horizon_real_content",          # 240 s (round 4; full 374-frame clip × 2 dtypes)
}

# The <5-minute loop: lightest representative(s) per module. Bare names
# select every parameterization; bracketed ids select one.
FAST_TESTS = {
    # registry / breadth
    "test_registry_covers_all_reference_type_ids",
    # config / CLI / analysis
    "test_xml_config_roundtrip",
    "test_fet_scorer_on_reference_fixtures",
    "test_image_roc_coding",
    "test_bgs_run_cli_end_to_end",
    # bgs families, one light oracle test each
    "test_matches_oracle[DPMeanBGS-oracle_mean]",
    "test_matches_oracle[FrameDifferenceBGS-oracle_framediff]",
    "test_registry_lookup",
    "test_fgd_min_area_gate_drops_specks",
    "test_gmg_training_phase_empty",
    "test_mog2_matches_cv2",
    "test_grimson_matches_oracle",
    "test_kde_learning_phase_empty",
    "test_lb_gauss_matches_oracle",
    "test_lbpmrf_static_scene_stays_background",
    "test_multilayer_matches_oracle",
    "test_mybgs_is_frame_difference",
    "test_t2fgmm_matches_oracle[T2FGMM_UM-True]",
    "test_texture_matches_oracle",
    "test_multicue_smoke",
    "test_subsense_shrink_smoke",
    # LBSP / kernels
    "test_descriptor_matches_reference_layout",
    "test_popcount16",
    "test_offset_tables_match_lbsp_family",
    "test_group_size_divides",
    "test_walk_kernel_matches_xla[1-v3]",
    "test_label_components_pallas_padded_shape",
    "test_fill_holes_unchanged_on_cpu",
    "test_derive_draws_ranges_and_rates",
    # ops / blobs / cc
    "test_bgr2gray_matches_cv2",
    "test_fill_holes",
    "test_labels_match_cv2_partition",
    "test_empty_mask",
    "test_area_centroid_bbox_match_cv2",
    "test_filter_include_exclude",
    # io / mesh / tracking
    "test_native_decode_matches_cv2",
    "test_spatial_sharded_batch_matches_per_stream",
    "test_kalman_tracks_constant_velocity",
    "test_tracker_is_scan_safe",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.name.split("[")[0]
        if base in SLOW_TESTS or item.get_closest_marker("slow"):
            item.add_marker(pytest.mark.slow)
        elif item.name in FAST_TESTS or base in FAST_TESTS:
            item.add_marker(pytest.mark.fast)
        else:
            item.add_marker(pytest.mark.medium)


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
