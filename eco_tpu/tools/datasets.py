"""Dataset tooling: list creation + ffmpeg frame extraction.

Python replacements for the reference's MATLAB/shell helpers:
- ``create_list``: walk a frame-root directory emitting ``path n_frames
  label`` lines, dropping videos with <= min_frames frames
  (scripts/create_lists/create_list_kinetics.m:26-40);
- ``extract_frames``: ffmpeg ``-qscale:v 2 -r <fps>`` to ``img_%04d.jpg``
  (scripts/extract_frames/extract_frames_frmRate.sh:19).
"""

from __future__ import annotations

import os
import re
import subprocess
from typing import Mapping, Optional, Sequence


def create_list(
    frames_root: str,
    class_to_label: Mapping[str, int],
    *,
    out_path: Optional[str] = None,
    min_frames: int = 5,
    frame_regex: str = r"img_\d+\.jpg$",
) -> list[str]:
    """Walk ``frames_root/<class>/<video>/img_*.jpg`` -> list lines."""
    pat = re.compile(frame_regex)
    lines = []
    for cls in sorted(os.listdir(frames_root)):
        cdir = os.path.join(frames_root, cls)
        if not os.path.isdir(cdir) or cls not in class_to_label:
            continue
        label = class_to_label[cls]
        for vid in sorted(os.listdir(cdir)):
            vdir = os.path.join(cdir, vid)
            if not os.path.isdir(vdir):
                continue
            n = sum(1 for f in os.listdir(vdir) if pat.search(f))
            if n <= min_frames:
                continue
            lines.append(f"{vdir} {n} {label}")
    if out_path:
        with open(out_path, "w") as f:
            f.write("\n".join(lines) + "\n")
    return lines


def class_index(classes: Sequence[str]) -> dict[str, int]:
    """class name -> 0-based label (class_ind_*.txt equivalent)."""
    return {c: i for i, c in enumerate(sorted(classes))}


def compute_image_mean(
    records,
    *,
    max_frames_per_video: int = 4,
) -> "np.ndarray":
    """Per-channel BGR mean over a dataset (tools/compute_image_mean.cpp).

    ``records``: iterable of VideoRecord-like (path, num_frames, label).
    Returns float64 (3,) channel means.
    """
    import cv2
    import numpy as np

    total = np.zeros(3, np.float64)
    count = 0
    for rec in records:
        step = max(1, rec.num_frames // max_frames_per_video)
        for f in range(0, rec.num_frames, step):
            img = cv2.imread(os.path.join(rec.path, "img_%04d.jpg" % (f + 1)))
            if img is None:
                continue
            total += img.reshape(-1, 3).mean(axis=0)
            count += 1
    return total / max(count, 1)


def extract_frames(
    video_path: str,
    out_dir: str,
    *,
    fps: int = 25,
    quality: int = 2,
    pattern: str = "img_%04d.jpg",
    ffmpeg: str = "ffmpeg",
) -> int:
    """Decode a video file to JPEG frames; returns the frame count."""
    os.makedirs(out_dir, exist_ok=True)
    cmd = [
        ffmpeg, "-y", "-i", video_path, "-qscale:v", str(quality),
        "-r", str(fps), os.path.join(out_dir, pattern),
        "-loglevel", "error",
    ]
    subprocess.run(cmd, check=True)
    return sum(1 for f in os.listdir(out_dir) if f.endswith(".jpg"))
