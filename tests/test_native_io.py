"""Native C++ video pipeline vs cv2 (bit-exactness + chunking)."""

import os

import numpy as np
import pytest

REF_VIDEO = "/root/reference/dataset/video.avi"


@pytest.fixture(scope="module")
def native_lib():
    from tracking_tpu import native

    lib = native.load()
    if lib is None:
        pytest.skip("native toolchain/FFmpeg unavailable")
    return lib


def test_native_decode_matches_cv2(native_lib):
    import cv2
    import ctypes

    if not os.path.exists(REF_VIDEO):
        pytest.skip("fixture unavailable")
    h = native_lib.vio_open(REF_VIDEO.encode(), 0, 0, 0)
    assert h
    w = ctypes.c_int()
    hh = ctypes.c_int()
    fps = ctypes.c_double()
    native_lib.vio_info(h, ctypes.byref(w), ctypes.byref(hh), ctypes.byref(fps))
    buf = np.empty((25, hh.value, w.value, 3), np.uint8)
    n = native_lib.vio_read_batch(
        h, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), 25
    )
    native_lib.vio_close(h)
    assert n == 25

    cap = cv2.VideoCapture(REF_VIDEO)
    for i in range(25):
        ok, f = cap.read()
        assert ok
        np.testing.assert_array_equal(buf[i], f)
    cap.release()


def test_video_source_uses_native_and_chunks(native_lib):
    from tracking_tpu.io.video import VideoSource

    if not os.path.exists(REF_VIDEO):
        pytest.skip("fixture unavailable")
    src = VideoSource(input_file=REF_VIDEO)
    chunks = list(src.chunks(chunk_size=100, max_frames=230))
    assert [len(c) for c in chunks] == [100, 100, 30]
    assert chunks[0].shape[1:] == (176, 320, 3)

    # flip + roi + resize path
    src2 = VideoSource(input_file=REF_VIDEO, enable_flip=True, roi=(10, 20, 200, 150))
    c2 = next(iter(src2.chunks(chunk_size=4, max_frames=4)))
    assert c2.shape == (4, 130, 190, 3)
    import cv2

    cap = cv2.VideoCapture(REF_VIDEO)
    ok, f = cap.read()
    cap.release()
    expect = cv2.flip(f, 1)[20:150, 10:200]
    np.testing.assert_array_equal(c2[0], expect)
