"""Host-side video decode/encode.

Mirrors the reference's container handling
(/root/reference/meshflowstabilizer.py:172-233, :1290-1322): frame count,
fps, and fourcc are read from the container and passed through to the
writer; a short read raises IOError with the reference's message shape.

The codec work is inherently host-bound (OpenCV's C++ videoio/ffmpeg
backends); everything downstream of these functions lives on device.
Streaming decode/encode for the two-pass pipeline lives in streaming.py
(ChunkReader / StreamWriter).
"""

from __future__ import annotations

from typing import Tuple

import cv2
import numpy as np

from meshflow_tpu.io import native as native_io


class VideoInfo:
    def __init__(self, num_frames: int, fps: float, fourcc: int, height: int, width: int):
        self.num_frames = num_frames
        self.fps = fps
        self.fourcc = fourcc
        self.height = height
        self.width = width


def probe_video(input_path: str) -> VideoInfo:
    video = cv2.VideoCapture(input_path)
    if not video.isOpened():
        video.release()
        raise IOError(f"Could not open video at <{input_path}>.")
    info = VideoInfo(
        num_frames=int(video.get(cv2.CAP_PROP_FRAME_COUNT)),
        fps=video.get(cv2.CAP_PROP_FPS),
        fourcc=int(video.get(cv2.CAP_PROP_FOURCC)),
        height=int(video.get(cv2.CAP_PROP_FRAME_HEIGHT)),
        width=int(video.get(cv2.CAP_PROP_FRAME_WIDTH)),
    )
    video.release()
    return info


def read_video(input_path: str) -> Tuple[np.ndarray, VideoInfo]:
    """Decode the whole clip -> ((F, H, W, 3) uint8 BGR, VideoInfo).

    Routes through the native libav runtime (prefetching decoder thread)
    when built; falls back to cv2.
    """
    if native_io.available():
        reader = native_io.NativeReader(input_path)
        batches = []
        while True:
            batch = reader.read(128)
            if len(batch) == 0:
                break
            batches.append(batch)
        reader.close()
        total = sum(len(b) for b in batches)
        if reader.num_frames and total < reader.num_frames:
            raise IOError(
                f"Video at <{input_path}> did not have frame {total} of "
                f"{reader.num_frames} (indexed from 0)."
            )
        stacked = (
            np.concatenate(batches)
            if batches
            else np.zeros((0, 0, 0, 3), np.uint8)
        )
        info = VideoInfo(
            num_frames=total,
            fps=reader.fps,
            fourcc=reader.fourcc,
            height=reader.height,
            width=reader.width,
        )
        return stacked, info

    video = cv2.VideoCapture(input_path)
    if not video.isOpened():
        video.release()
        raise IOError(f"Could not open video at <{input_path}>.")
    num_frames = int(video.get(cv2.CAP_PROP_FRAME_COUNT))
    fps = video.get(cv2.CAP_PROP_FPS)
    fourcc = int(video.get(cv2.CAP_PROP_FOURCC))
    frames = []
    for frame_index in range(num_frames):
        ok, frame = video.read()
        if not ok:
            video.release()
            raise IOError(
                f"Video at <{input_path}> did not have frame {frame_index} of "
                f"{num_frames} (indexed from 0)."
            )
        frames.append(frame)
    video.release()
    stacked = np.stack(frames) if frames else np.zeros((0, 0, 0, 3), np.uint8)
    info = VideoInfo(
        num_frames=num_frames,
        fps=fps,
        fourcc=fourcc,
        height=stacked.shape[1] if num_frames else 0,
        width=stacked.shape[2] if num_frames else 0,
    )
    return stacked, info


def write_video(
    output_path: str, frames: np.ndarray, fps: float, fourcc: int
) -> None:
    """Encode (F, H, W, 3) uint8 BGR with the input's fourcc and fps.

    The reference passes the input fourcc straight through
    (/root/reference/meshflowstabilizer.py:1310-1315) and silently writes
    nothing when that encoder is unavailable (cv2.VideoWriter does not
    raise).  Defined behavior here: the native libav encoder handles the
    requested codec (falling back to mpeg4); without the native library,
    cv2 with an mp4v fallback, raising if even that fails.
    """
    height, width = frames.shape[1:3]
    if native_io.available():
        try:
            writer = native_io.NativeWriter(output_path, width, height, fps, fourcc)
        except IOError:
            writer = None  # codec/container outside libav runtime -> cv2 below
        if writer is not None:
            try:
                written = writer.write(frames)
            finally:
                rc = writer.close()
            if written != len(frames) or rc != 0:
                raise IOError(f"Native encoder failed for <{output_path}>.")
            return
    writer = cv2.VideoWriter(output_path, fourcc, fps, (width, height))
    if not writer.isOpened():
        writer.release()
        writer = cv2.VideoWriter(
            output_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (width, height)
        )
    if not writer.isOpened():
        writer.release()
        raise IOError(f"Could not open a video encoder for <{output_path}>.")
    for frame in frames:
        writer.write(np.ascontiguousarray(frame))
    writer.release()
