"""Rolling metric aggregation + training logger.

Rebuilds loss/loss_compute.py:6-54 (MetricStat) and utils/logger.py
(frame-rate loss logger)."""

from __future__ import annotations

import logging
import sys
import time
from typing import List, Sequence


class MetricStat:
    """Per-tag (sum, count) accumulators with a rolling log window."""

    def __init__(self, tags: Sequence[str]):
        self.tags = list(tags)
        n = len(self.tags)
        self.total_count = [0] * n
        self.total_sum = [0.0] * n
        self.log_count = [0] * n
        self.log_sum = [0.0] * n

    def update_stat(self, metrics: Sequence[float], counts: Sequence[int]):
        for i, (m, c) in enumerate(zip(metrics, counts)):
            self.log_sum[i] += float(m)
            self.log_count[i] += int(c)

    def log_stat(self) -> List[float]:
        """Average over the window since the last call; folds the window
        into the totals."""
        avg = []
        for i in range(len(self.tags)):
            c = self.log_count[i]
            avg.append(0.0 if c == 0 else self.log_sum[i] / c)
            self.total_sum[i] += self.log_sum[i]
            self.total_count[i] += c
            self.log_sum[i] = 0.0
            self.log_count[i] = 0
        return avg

    def summary_stat(self) -> List[float]:
        avg = []
        for i in range(len(self.tags)):
            self.total_sum[i] += self.log_sum[i]
            self.total_count[i] += self.log_count[i]
            self.log_sum[i] = 0.0
            self.log_count[i] = 0
            c = self.total_count[i]
            avg.append(0.0 if c == 0 else self.total_sum[i] / c)
        return avg

    def reset(self):
        n = len(self.tags)
        self.total_count = [0] * n
        self.total_sum = [0.0] * n
        self.log_count = [0] * n
        self.log_sum = [0.0] * n


def set_logger(name: str = "m3asr", log_file: str = None,
               level=logging.INFO) -> logging.Logger:
    """File + stderr logger (utils/logger.py set_logger)."""
    logger = logging.getLogger(name)
    logger.setLevel(level)
    logger.handlers.clear()
    fmt = logging.Formatter(
        "%(asctime)s [%(levelname)s] %(message)s", "%Y-%m-%d %H:%M:%S")
    sh = logging.StreamHandler(sys.stderr)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file:
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


class ScalarWriter:
    """JSONL scalar logger — the framework's stand-in for the
    reference's TensorBoard scalars (bk/..._hier.py:190-193,622-623):
    one line per event {step, tag, value, wall_time}, trivially
    plottable and dependency-free."""

    def __init__(self, path: str):
        import os
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "a")

    def add_scalar(self, tag: str, value: float, step: int):
        import json
        self._f.write(json.dumps({"step": int(step), "tag": tag,
                                  "value": float(value),
                                  "wall_time": time.time()}) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()


class ThroughputMeter:
    """Frames/s throughput logging (bk/..._hier.py:617-632)."""

    def __init__(self):
        self.frames = 0
        self.t0 = time.perf_counter()

    def update(self, n_frames: int):
        self.frames += int(n_frames)

    def rate(self) -> float:
        dt = time.perf_counter() - self.t0
        return self.frames / dt if dt > 0 else 0.0

    def reset(self):
        self.frames = 0
        self.t0 = time.perf_counter()
