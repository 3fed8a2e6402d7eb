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


def test_video_source_camera_path(monkeypatch):
    """Camera branch of VideoSource.chunks (VideoCapture.cpp:93-117 parity):
    no real device in CI, so cv2.VideoCapture is monkeypatched with a fake
    that serves 7 synthetic frames for index 0 and fails to open otherwise.
    Verifies the camera path never touches the native file pipeline, applies
    the same _prep (resize/flip) chain, and raises on an unopenable device."""
    from tracking_tpu.io import video as video_mod

    frames = [
        np.full((48, 64, 3), i * 10, np.uint8) for i in range(7)
    ]

    class FakeCap:
        def __init__(self, index):
            self.ok = index == 0
            self.i = 0

        def isOpened(self):
            return self.ok

        def read(self):
            if not self.ok or self.i >= len(frames):
                return False, None
            f = frames[self.i]
            self.i += 1
            return True, f.copy()

        def release(self):
            pass

    monkeypatch.setattr(video_mod.cv2, "VideoCapture", FakeCap)

    src = video_mod.VideoSource(camera_index=0, resize_factor=0.5, enable_flip=True)
    chunks = list(src.chunks(chunk_size=4))
    assert [len(c) for c in chunks] == [4, 3]
    assert chunks[0].shape == (4, 24, 32, 3)
    np.testing.assert_array_equal(chunks[0][2], np.full((24, 32, 3), 20, np.uint8))

    with pytest.raises(FileNotFoundError):
        list(video_mod.VideoSource(camera_index=3).chunks(4))


def test_native_writer_roundtrip(tmp_path):
    """Native MJPEG/AVI writer: frames written through the FFmpeg encoder
    decode back (via cv2) at the same shape with small lossy error; gray
    masks are expanded to BGR exactly like cv2.VideoWriter(isColor=True)."""
    import cv2

    from tracking_tpu.native import VideoWriter

    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, (8, 48, 64, 3), np.uint8)
    frames = np.stack([cv2.GaussianBlur(f, (7, 7), 3) for f in frames])
    path = str(tmp_path / "out.avi")
    try:
        w = VideoWriter(path, 30.0, (64, 48))
    except RuntimeError:
        pytest.skip("native toolchain unavailable")
    for f in frames:
        w.write(f)
    w.release()
    cap = cv2.VideoCapture(path)
    back = []
    while True:
        ok, fr = cap.read()
        if not ok:
            break
        back.append(fr)
    back = np.stack(back)
    assert back.shape == frames.shape
    assert np.abs(back.astype(int) - frames.astype(int)).mean() < 8.0
    # binary-mask path: gray input expands to identical BGR channels
    w = VideoWriter(str(tmp_path / "mask.avi"), 30.0, (64, 48))
    w.write((frames[0, :, :, 0] > 128).astype(np.uint8) * 255)
    w.release()
    cap = cv2.VideoCapture(str(tmp_path / "mask.avi"))
    ok, fr = cap.read()
    assert ok and fr.shape == (48, 64, 3)
