"""Video IO (mp4/gif) with imageio-ffmpeg -> OpenCV -> gif fallbacks.

The reference uses decord + imageio(ffmpeg); neither decord nor the ffmpeg
plugin is guaranteed in a slim image, so every path degrades gracefully.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np


def write_video(path: str, frames: np.ndarray, fps: int = 8) -> str:
    """frames [T, H, W, 3] uint8 -> mp4 (or .gif fallback). Returns the
    path actually written."""
    path = str(path)
    try:
        import imageio

        imageio.mimwrite(path, list(frames), fps=fps)
        return path
    except Exception:
        pass
    try:
        import cv2

        h, w = frames.shape[1:3]
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
        if not vw.isOpened():
            raise RuntimeError("cv2.VideoWriter failed to open")
        for f in frames:
            vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        vw.release()
        return path
    except Exception:
        pass
    import imageio

    gif = path.rsplit(".", 1)[0] + ".gif"
    imageio.mimwrite(gif, list(frames), fps=fps)
    return gif


def write_gif(path: str, frames: np.ndarray, fps: int = 8) -> str:
    """frames [T, H, W, 3] uint8 -> animated gif. The reference exports a
    gif alongside every eval mp4 (evaluation_control_to_video.py:409-434)."""
    import imageio

    path = str(Path(path).with_suffix(".gif"))
    try:
        imageio.mimwrite(path, list(frames), fps=fps)
    except TypeError:  # imageio v3 gif writer takes duration, not fps
        imageio.mimwrite(path, list(frames), duration=1000.0 / max(fps, 1))
    return path


def read_video(path: str, frame_ids: Optional[Sequence[int]] = None) -> np.ndarray:
    """-> [T, H, W, 3] uint8 (all frames, or the requested ids in order)."""
    frames = _read_all(path)
    if frame_ids is not None:
        frames = [frames[i] for i in frame_ids]
    return np.stack(frames)


def _read_all(path: str) -> List[np.ndarray]:
    try:
        import imageio

        return [np.asarray(f) for f in imageio.mimread(path, memtest=False)]
    except Exception:
        pass
    import cv2

    cap = cv2.VideoCapture(str(path))
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    cap.release()
    if not frames:
        raise RuntimeError(f"could not read any frames from {path}")
    return frames
