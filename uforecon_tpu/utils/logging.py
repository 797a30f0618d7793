"""Console logging, timers and scalar-metric writers.

Replaces the reference's `code1/misc/utils.py` Log/timer helpers
(reference misc/utils.py:70-127) and the Lightning TensorBoardLogger
(reference main.py:195). The metric writer prefers TensorBoard (via
torch.utils.tensorboard or tensorboardX) and always mirrors scalars to a
JSONL file so headless runs stay inspectable without TB.
"""
from __future__ import annotations

import json
import os
import sys
import time
from typing import Dict, Optional


class Log:
    """Colored console logging (reference misc/utils.py:70-116)."""

    _C = {"info": "\033[0;36m", "warn": "\033[0;33m", "error": "\033[0;31m",
          "ok": "\033[0;32m"}
    _R = "\033[0m"

    @classmethod
    def _emit(cls, level: str, *msg) -> None:
        color = cls._C[level] if sys.stdout.isatty() else ""
        reset = cls._R if sys.stdout.isatty() else ""
        print(f"{color}[{level.upper():5s}]{reset}", *msg, flush=True)

    @classmethod
    def info(cls, *msg):
        cls._emit("info", *msg)

    @classmethod
    def warn(cls, *msg):
        cls._emit("warn", *msg)

    @classmethod
    def error(cls, *msg):
        cls._emit("error", *msg)

    @classmethod
    def ok(cls, *msg):
        cls._emit("ok", *msg)


class Timer:
    """Wall-clock phase timer; `with Timer('encode') as t: ...` or manual."""

    def __init__(self, name: str = "", quiet: bool = True):
        self.name = name
        self.quiet = quiet
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        if not self.quiet:
            Log.info(f"{self.name}: {self.elapsed:.3f}s")
        return False


class MetricWriter:
    """Scalar metrics to TensorBoard (if available) + JSONL (always)."""

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        self.logdir = logdir
        self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(logdir)
        except Exception:
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(logdir)
            except Exception:
                self._tb = None

    def scalars(self, step: int, values: Dict[str, float]) -> None:
        rec = {"step": int(step)}
        for k, v in values.items():
            v = float(v)
            rec[k] = v
            if self._tb is not None:
                self._tb.add_scalar(k, v, step)
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()

    def image(self, step: int, tag: str, img) -> None:
        if self._tb is not None:
            import numpy as np
            arr = np.asarray(img)
            if arr.ndim == 3 and arr.shape[-1] in (1, 3):
                arr = arr.transpose(2, 0, 1)
            self._tb.add_image(tag, arr, step)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


def visualize_depth(depth, near: Optional[float] = None,
                    far: Optional[float] = None):
    """Depth map -> uint8 RGB colormap image (reference misc/utils.py
    visualize_depth; cv2 applyColorMap JET on the normalized inverse)."""
    import cv2
    import numpy as np

    d = np.asarray(depth, np.float32)
    valid = np.isfinite(d) & (d > 0)
    if near is None:
        near = float(d[valid].min()) if valid.any() else 0.0
    if far is None:
        far = float(d[valid].max()) if valid.any() else 1.0
    x = np.clip((d - near) / max(far - near, 1e-8), 0, 1)
    x = (x * 255).astype(np.uint8)
    cm = cv2.applyColorMap(x, cv2.COLORMAP_JET)[..., ::-1]  # BGR -> RGB
    cm[~valid] = 0
    return cm
