"""Registry-wide smoke test: every algorithm runs end-to-end on real video."""

import jax.numpy as jnp
import numpy as np
import pytest

from tracking_tpu.core.registry import list_algorithms
from tracking_tpu.runner import run_video


def test_every_registered_algorithm_steps(video_frames):
    crop = jnp.asarray(video_frames[:6, 60:76, 100:124])
    failures = {}
    for name, cls in sorted(list_algorithms().items()):
        try:
            st, masks = run_video(cls(), crop)
            m = np.asarray(masks)
            assert m.shape == (6, 16, 24), (name, m.shape)
            assert m.dtype == np.uint8, (name, m.dtype)
        except Exception as e:  # noqa: BLE001 — collect all failures
            failures[name] = repr(e)[:200]
    assert not failures, failures


def test_registry_covers_all_reference_type_ids():
    from tracking_tpu.core.registry import _BY_TYPE_ID, _ensure_populated

    _ensure_populated()
    missing = [i for i in range(38) if i != 24 and i not in _BY_TYPE_ID]
    assert not missing, f"unimplemented ustc type ids: {missing}"
