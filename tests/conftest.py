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
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = "/root/reference"


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
