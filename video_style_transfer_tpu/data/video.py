"""Video clip dataset (stage-2) + frame extraction (stage-1).

Host-side decode (cv2), device-side everything else. Functional
re-design of the reference datasets:

- VideoClipDataset: scans a directory (one level of subdirs) for .mp4s,
  one index entry per possible clip start, reads CONSECUTIVE frames,
  BGR->RGB, square resize, [-1,1] normalize, pads short reads by
  repeating the last frame (reference animatediff/video_dataset.py:49-142).
- extract_frames: N evenly-spaced frames from one .mp4 (middle frame when
  N==1) for the stage-1 image trainer (reference
  train_unziplora.py:867-1029, extraction :902-941).

Determinism: clip sampling is keyed by an integer seed instead of global
np.random state (reference uses np.random, video_dataset.py:93).
Output layout is frames-last-channels (F, H, W, 3) float32 — NHWC,
matching the TPU compute path (no NCHW permutes).
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def _require_cv2():
    try:
        import cv2
        return cv2
    except ImportError as e:  # pragma: no cover
        raise ImportError("opencv-python required for video decode") from e


def list_videos(root: str) -> List[str]:
    """.mp4 files directly under root plus one level of subdirectories,
    sorted for determinism."""
    out = []
    for entry in sorted(os.listdir(root)):
        p = os.path.join(root, entry)
        if entry.lower().endswith(".mp4"):
            out.append(p)
        elif os.path.isdir(p):
            for sub in sorted(os.listdir(p)):
                if sub.lower().endswith(".mp4"):
                    out.append(os.path.join(p, sub))
    return out


def _read_frames(cap, start: int, count: int, resolution: int):
    cv2 = _require_cv2()
    cap.set(cv2.CAP_PROP_POS_FRAMES, start)
    frames = []
    for _ in range(count):
        ok, frame = cap.read()
        if not ok:
            break
        frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        # INTER_LINEAR: the reference's default interpolation
        # (video_dataset.py:114) and what the native bilinear path matches
        frame = cv2.resize(frame, (resolution, resolution),
                           interpolation=cv2.INTER_LINEAR)
        frames.append(frame)
    return frames


def _pad_repeat(frames: List[np.ndarray], count: int) -> List[np.ndarray]:
    while frames and len(frames) < count:
        frames.append(frames[-1].copy())
    return frames


def _normalize(frames: Sequence[np.ndarray]) -> np.ndarray:
    arr = np.stack(frames).astype(np.float32)
    return arr / 127.5 - 1.0


class VideoClipDataset:
    """Index of (video, start_frame) pairs with random-access clip
    loading. __getitem__ -> (F, H, W, 3) float32 in [-1, 1]."""

    def __init__(self, root: str, *, num_frames: int = 8,
                 resolution: int = 1024, stride: int = 1):
        cv2 = _require_cv2()
        self.num_frames = num_frames
        self.resolution = resolution
        self.videos = list_videos(root)
        if not self.videos:
            raise FileNotFoundError(f"no .mp4 under {root}")
        self.index: List[Tuple[str, int]] = []
        self._totals = {}
        for path in self.videos:
            cap = cv2.VideoCapture(path)
            total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
            cap.release()
            self._totals[path] = total
            starts = range(0, max(total - num_frames + 1, 1), stride)
            for s in starts:
                self.index.append((path, s))

    def __len__(self) -> int:
        return len(self.index)

    def _load(self, i: int):
        """-> (frames (F,H,W,3) float32 [-1,1], n_read). n_read is the
        number of ACTUALLY decoded frames (the pad-repeat tail repeats
        frame n_read-1), so per-frame identities derived from it are
        exact even when cv2's frame-count metadata lies."""
        cv2 = _require_cv2()
        path, start = self.index[i]
        cap = cv2.VideoCapture(path)
        # fast path: raw BGR reads + the native fused
        # resize->RGB->normalize pipeline (native/preprocess.cpp)
        from video_style_transfer_tpu.data import native
        if native.native_available():
            cap.set(cv2.CAP_PROP_POS_FRAMES, start)
            raw = []
            for _ in range(self.num_frames):
                ok, frame = cap.read()
                if not ok:
                    break
                raw.append(frame)
            cap.release()
            if not raw:
                raise IOError(f"failed to read frames from {path}@{start}")
            n_read = len(raw)
            raw = _pad_repeat(raw, self.num_frames)
            return native.preprocess_frames_bgr(
                np.stack(raw), self.resolution, self.resolution), n_read
        frames = _read_frames(cap, start, self.num_frames, self.resolution)
        cap.release()
        if not frames:
            raise IOError(f"failed to read frames from {path}@{start}")
        n_read = len(frames)
        frames = _pad_repeat(frames, self.num_frames)
        return _normalize(frames), n_read

    def __getitem__(self, i: int) -> np.ndarray:
        return self._load(i)[0]

    def sample_batch(self, batch_size: int, seed: int) -> np.ndarray:
        """(B, F, H, W, 3) deterministic given seed."""
        rng = np.random.RandomState(seed)
        idx = rng.randint(0, len(self.index), size=batch_size)
        return np.stack([self[int(i)] for i in idx])

    def _ids_for(self, i: int, n_read: int) -> List[Tuple[int, int]]:
        path, start = self.index[i]
        vid = self.videos.index(path)
        last = start + n_read - 1
        return [(vid, min(start + j, last)) for j in range(self.num_frames)]

    def frame_ids(self, i: int) -> List[Tuple[int, int]]:
        """Per-frame identities (video_idx, frame_idx) for clip i, with
        the short-video pad-repeat clamp applied — padded frames share
        the id of the last ACTUALLY decoded frame (decodes the clip to
        count reads; use sample_batch_meta to get frames + ids in one
        decode), so a latent-moments cache keyed on these ids is exact."""
        _, n_read = self._load(i)
        return self._ids_for(i, n_read)

    def sample_batch_meta(self, batch_size: int, seed: int):
        """Like sample_batch but also returns the per-clip frame ids:
        (frames (B,F,H,W,3), ids[b][j] = (video_idx, frame_idx))."""
        rng = np.random.RandomState(seed)
        idx = rng.randint(0, len(self.index), size=batch_size)
        loads = [self._load(int(i)) for i in idx]
        frames = np.stack([f for f, _ in loads])
        ids = [self._ids_for(int(i), n) for i, (_, n) in zip(idx, loads)]
        return frames, ids


def extract_frames(video_path: str, num_frames: int = 1,
                   resolution: Optional[int] = None) -> np.ndarray:
    """N evenly-spaced frames (middle frame when N == 1) ->
    (N, H, W, 3) float32 in [-1, 1]."""
    cv2 = _require_cv2()
    cap = cv2.VideoCapture(video_path)
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    if total <= 0:
        cap.release()
        raise IOError(f"unreadable video: {video_path}")
    if num_frames == 1:
        positions = [total // 2]
    else:
        positions = np.linspace(0, total - 1, num_frames).round().astype(int)
    frames = []
    for pos in positions:
        cap.set(cv2.CAP_PROP_POS_FRAMES, int(pos))
        ok, frame = cap.read()
        if not ok:
            continue
        frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        if resolution is not None:
            frame = cv2.resize(frame, (resolution, resolution),
                               interpolation=cv2.INTER_AREA)
        frames.append(frame)
    cap.release()
    if not frames:
        raise IOError(f"no frames decoded from {video_path}")
    frames = _pad_repeat(frames, num_frames)
    return _normalize(frames)


def extract_first_frames(video_path: str, num_frames: int,
                         resolution: int) -> np.ndarray:
    """First N CONSECUTIVE frames (the stage-1 video-variant loading,
    reference video_train_unziplora.py:884-946) -> (N, H, W, 3) float32
    in [-1, 1], padded by repeating the last frame."""
    cv2 = _require_cv2()
    cap = cv2.VideoCapture(video_path)
    frames = _read_frames(cap, 0, num_frames, resolution)
    cap.release()
    if not frames:
        raise IOError(f"no frames decoded from {video_path}")
    frames = _pad_repeat(frames, num_frames)
    return _normalize(frames)


def load_image_dir(root: str, resolution: int, *, crop: str = "squish",
                   seed: int = 0) -> np.ndarray:
    """All images under root -> (N, res, res, 3) float32 in [-1, 1]
    (stage-1 DreamBooth instance/class data when given as images).

    crop: how non-square sources reach res x res —
      'squish' resizes both axes (aspect distortion; legacy behavior);
      'center'/'random' resize the SHORTER side to res then crop, the
      reference's transforms.Resize + {Center,Random}Crop
      (train_unziplora.py:976-983). The random offset is drawn once per
      image at load (the reference redraws per epoch; latents here are
      posterior-moment-cached per image, so one draw per image is the
      cache-compatible equivalent — per-image variation comes from the
      per-step posterior sample instead)."""
    from PIL import Image
    exts = (".png", ".jpg", ".jpeg", ".webp", ".bmp")
    paths = [os.path.join(root, f) for f in sorted(os.listdir(root))
             if f.lower().endswith(exts)]
    if not paths:
        raise FileNotFoundError(f"no images under {root}")
    rng = np.random.default_rng(seed)
    out = []
    for p in paths:
        img = Image.open(p).convert("RGB")
        if crop == "squish":
            img = img.resize((resolution, resolution), Image.LANCZOS)
        else:
            w, h = img.size
            scale = resolution / min(w, h)
            nw, nh = max(round(w * scale), resolution), \
                max(round(h * scale), resolution)
            img = img.resize((nw, nh), Image.LANCZOS)
            if crop == "center":
                left = (nw - resolution) // 2
                top = (nh - resolution) // 2
            elif crop == "random":
                left = int(rng.integers(0, nw - resolution + 1))
                top = int(rng.integers(0, nh - resolution + 1))
            else:
                raise ValueError(f"unknown crop mode {crop!r}")
            img = img.crop((left, top, left + resolution,
                            top + resolution))
        out.append(np.asarray(img))
    return _normalize(out)
