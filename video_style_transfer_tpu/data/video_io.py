"""Video/image output writers.

mp4 via imageio/libx264 at quality 8, GIF fallback when no H.264 encoder
is available — the reference's exact export behavior
(inference_animatediff.py:38-50, 8 fps default :146-151).
"""
from __future__ import annotations

import os
from typing import Sequence

import numpy as np


def save_video(frames: Sequence[np.ndarray], path: str, *, fps: int = 8,
               quality: int = 8) -> str:
    """frames: iterable of (H, W, 3) uint8. Returns the path actually
    written (may swap .mp4 -> .gif on fallback)."""
    frames = [np.asarray(f, np.uint8) for f in frames]
    writer = None
    try:
        import imageio.v2 as imageio
        writer = imageio.get_writer(path, fps=fps, quality=quality,
                                    codec="libx264")
        for f in frames:
            writer.append_data(f)
        writer.close()
        return path
    except Exception:
        # close the ffmpeg writer and remove any truncated .mp4 so the
        # GIF fallback doesn't leave a corrupt artifact beside it
        if writer is not None:
            try:
                writer.close()
            except Exception:
                pass
            try:
                os.remove(path)
            except OSError:
                pass
        gif_path = os.path.splitext(path)[0] + ".gif"
        import imageio.v2 as imageio
        imageio.mimsave(gif_path, frames, duration=1.0 / fps)
        return gif_path


def save_image(img: np.ndarray, path: str) -> str:
    from PIL import Image
    Image.fromarray(np.asarray(img, np.uint8)).save(path)
    return path
