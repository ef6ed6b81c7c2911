"""Native libav video IO runtime tests (skipped if the library isn't built)."""

import numpy as np
import cv2
import pytest

from meshflow_tpu.io import native as native_io
from meshflow_tpu.io import video as video_io

pytestmark = pytest.mark.skipif(
    not native_io.available(), reason="native video IO library not built"
)

CLIP = "/root/reference/videos/video-1/video-1.m4v"


def test_native_decode_matches_cv2():
    reader = native_io.NativeReader(CLIP)
    assert (reader.width, reader.height) == (640, 360)
    assert abs(reader.fps - 30.0) < 0.5
    batch = reader.read(5)
    reader.close()
    cap = cv2.VideoCapture(CLIP)
    for i in range(5):
        ok, ref = cap.read()
        assert ok
        np.testing.assert_array_equal(batch[i], ref)
    cap.release()


def test_native_roundtrip(tmp_path, rng):
    frames = rng.integers(0, 256, size=(12, 96, 128, 3), dtype=np.uint8)
    # smooth so lossy encode stays close
    frames = np.stack([cv2.GaussianBlur(f, (7, 7), 3.0) for f in frames])
    path = str(tmp_path / "out.mp4")
    video_io.write_video(path, frames, 30.0, 0)
    back, info = video_io.read_video(path)
    assert info.num_frames == 12
    assert back.shape == frames.shape
    assert np.abs(back.astype(int) - frames.astype(int)).mean() < 8.0


def test_native_missing_file():
    with pytest.raises(IOError):
        native_io.NativeReader("/nonexistent-clip.mp4")


def test_read_video_uses_native_and_matches_reference_count():
    frames, info = video_io.read_video(CLIP)
    assert frames.shape == (494, 360, 640, 3)
    assert info.num_frames == 494
    assert info.fourcc != 0
