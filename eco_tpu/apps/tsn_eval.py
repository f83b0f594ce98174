"""TSN-style oversampled evaluation -- parity with
caffe_3d/action_python/VideoSpatialPrediction.py:31-78.

Protocol: sample ``num_frames`` (default 25) frames evenly across the video,
resize to 256x340, take 10 crops per frame (4 corners + center, each
mirrored), forward all crops, average the logits/probs over every crop and
frame for the video-level prediction.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

BGR_MEAN = np.asarray([104.0, 117.0, 123.0], np.float32)


def ten_crop(img: np.ndarray, crop: int = 224) -> np.ndarray:
    """(H, W, 3) -> (10, crop, crop, 3): 4 corners + center, + mirrors."""
    h, w = img.shape[:2]
    offs = [
        (0, 0), (0, w - crop), (h - crop, 0), (h - crop, w - crop),
        ((h - crop) // 2, (w - crop) // 2),
    ]
    crops = [img[y:y + crop, x:x + crop] for y, x in offs]
    crops += [c[:, ::-1] for c in crops]
    return np.stack(crops)


def oversample_video(
    video_path: str,
    n_video_frames: int,
    *,
    num_frames: int = 25,
    num_segments: int = 16,
    crop: int = 224,
    name_pattern: str = "img_%04d.jpg",
    resize_hw=(256, 340),
) -> np.ndarray:
    """Returns (10, num_segments*ceil(num_frames/num_segments)...) stacks.

    For ECO the clip unit is ``num_segments`` frames; we build one clip per
    crop position from ``num_frames`` evenly spaced frames subsampled to
    ``num_segments`` (linspace), i.e. (10, S, crop, crop, 3) float32.
    """
    import cv2

    idx = np.linspace(0, n_video_frames - 1, num_frames).astype(np.int64)
    sub = np.linspace(0, num_frames - 1, num_segments).astype(np.int64)
    frames = []
    for i in idx[sub]:
        img = cv2.imread(os.path.join(video_path, name_pattern % (i + 1)))
        if img is None:
            img = frames[-1] if frames else np.zeros(
                (resize_hw[0], resize_hw[1], 3), np.uint8
            )
        else:
            img = cv2.resize(img, (resize_hw[1], resize_hw[0]))
        frames.append(img)
    stacks = np.stack([ten_crop(f, crop) for f in frames])  # (S, 10, c, c, 3)
    stacks = stacks.transpose(1, 0, 2, 3, 4).astype(np.float32) - BGR_MEAN
    return stacks  # (10, S, crop, crop, 3)


class OversampleEvaluator:
    """Batched 10-crop evaluation of a video list on TPU."""

    def __init__(self, program, params, state, *, output: str = None):
        self.program = program
        self.params = params
        self.state = state
        self.output = output or (
            "probs" if "probs" in program.output_names else program.output_names[-1]
        )

        @jax.jit
        def fwd(params, state, data):
            outs, _ = program.apply(params, state, {"data": data})
            return outs[self.output]

        self._fwd = fwd

    def predict_video(self, video_path: str, n_frames: int, **kw) -> np.ndarray:
        """Average prediction over the 10 crops; returns (num_classes,)."""
        crops = oversample_video(video_path, n_frames, **kw)
        scores = np.asarray(
            self._fwd(self.params, self.state, jnp.asarray(crops))
        )
        return scores.mean(axis=0)

    def evaluate(self, records, **kw):
        """Top-1 accuracy over [(path, n_frames, label)] records."""
        correct = 0
        for rec in records:
            pred = self.predict_video(rec.path, rec.num_frames, **kw)
            correct += int(np.argmax(pred) == rec.label)
        return correct / max(len(records), 1)
