"""Metric logging: TensorBoard-compatible event files + append-only log.txt.

Mirrors the reference ``Logger`` (MToV/utils.py:18-78) surface — scalar /
image / video summaries plus a timestamped text log — without requiring
tensorboard at runtime (falls back to JSONL when it is unavailable).
"""

from __future__ import annotations

import json
import os
import time


class AverageMeter:
    """Running mean (ref MToV/utils.py:81-100)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n

    @property
    def average(self) -> float:
        return self.sum / max(self.count, 1)


class MetricLogger:
    def __init__(self, logdir: str, use_tensorboard: bool = True):
        self.logdir = os.path.abspath(logdir)
        os.makedirs(self.logdir, exist_ok=True)
        self._text = open(os.path.join(self.logdir, "log.txt"), "a")
        self._jsonl = open(os.path.join(self.logdir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter  # type: ignore

                self._tb = SummaryWriter(self.logdir)
            except ImportError:
                self._tb = None

    def log_text(self, msg: str):
        stamp = time.strftime("%Y-%m-%d %H:%M:%S")
        self._text.write(f"[{stamp}] {msg}\n")
        self._text.flush()

    def log_scalars(self, step: int, scalars: dict):
        rec = {"step": int(step), "time": time.time(), **{
            k: float(v) for k, v in scalars.items()}}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), int(step))

    def log_image(self, step: int, tag: str, image):
        """image [H, W, C] uint8/float (ref utils.py image_summary)."""
        if self._tb is not None:
            import numpy as np

            img = np.asarray(image)
            if img.dtype != "uint8":
                img = (np.clip(img, 0, 1) * 255).astype("uint8")
            self._tb.add_image(tag, img, int(step), dataformats="HWC")

    def log_video(self, step: int, tag: str, video, fps: int = 25):
        """video [T, H, W, C] (ref utils.py video_summary :73-78).

        tensorboardX's ``add_video`` requires torch; rather than pull a
        heavy optional dependency into the logger, log the video as a
        [T·H, W, C] filmstrip image (frames stacked vertically) — pure
        numpy, same information, visible in any TB build."""
        if self._tb is not None:
            import numpy as np

            v = np.asarray(video)
            if v.dtype != "uint8":
                v = (np.clip(v, 0, 1) * 255).astype("uint8")
            t, h, w, c = v.shape
            strip = v.reshape(t * h, w, c)
            self._tb.add_image(f"{tag}/filmstrip", strip, int(step),
                               dataformats="HWC")

    def close(self):
        self._text.close()
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
