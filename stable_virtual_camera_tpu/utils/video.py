"""MP4 read/write via OpenCV (this image ships no ffmpeg binary or
imageio-ffmpeg; the reference writes mp4 through imageio-ffmpeg at
seva/eval.py:976-999 — same capability, different backend)."""

from __future__ import annotations

import cv2
import numpy as np


def write_video(path: str, frames: np.ndarray, fps: float) -> None:
    """frames: (N, H, W, 3) uint8 RGB."""
    assert frames.ndim == 4 and frames.shape[-1] == 3, frames.shape
    h, w = frames.shape[1:3]
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), max(float(fps), 1.0), (w, h)
    )
    if not writer.isOpened():
        raise IOError(f"Could not open video writer for {path}")
    for frame in frames:
        writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
    writer.release()


def read_video(path: str) -> np.ndarray:
    """Returns (N, H, W, 3) uint8 RGB."""
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"Could not open video {path}")
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    cap.release()
    return np.stack(frames) if frames else np.zeros((0, 0, 0, 3), np.uint8)
