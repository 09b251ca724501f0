"""Metric logging: smoothed meters, ETA, JSON-lines dump.

Re-creation of OmniRe/utils/logging.py MetricLogger/SmoothedValue
(:54-145): windowed medians/means per metric, periodic console lines with
ETA, and an append-only metrics.json lines file.
"""
from __future__ import annotations

import collections
import json
import logging
import os
import time


def setup_logging(out_dir: str | None = None, name: str = "emd_tpu"
                  ) -> logging.Logger:
    logger = logging.getLogger(name)
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s",
                            "%H:%M:%S")
    if not logger.handlers:
        logger.setLevel(logging.INFO)
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
    if out_dir:
        # one file handler per CURRENT run dir: multi-run tools (e.g.
        # the EMD ablation's two trainings) each get their own
        # train.log instead of appending to the first run's
        path = os.path.abspath(os.path.join(out_dir, "train.log"))
        current = [h for h in logger.handlers
                   if isinstance(h, logging.FileHandler)]
        if not any(h.baseFilename == path for h in current):
            for h in current:
                logger.removeHandler(h)
                h.close()
            os.makedirs(out_dir, exist_ok=True)
            fh = logging.FileHandler(path)
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    return logger


class SmoothedValue:
    def __init__(self, window: int = 20):
        self.deque = collections.deque(maxlen=window)
        self.total = 0.0
        self.count = 0

    def update(self, value: float) -> None:
        self.deque.append(float(value))
        self.total += float(value)
        self.count += 1

    @property
    def avg(self) -> float:
        return sum(self.deque) / max(len(self.deque), 1)

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)


class MetricLogger:
    """`tb=True` (default when out_dir is set) mirrors every dump into a
    TensorBoard event file under out_dir/tb — the reference logs each
    train iter to TB (S3Gaussian/train.py:370-398); utils/tbwriter.py is
    the dependency-free sink."""

    def __init__(self, out_dir: str | None = None, window: int = 20,
                 tb: bool = True, track_url: str | None = None):
        self.meters = collections.defaultdict(lambda: SmoothedValue(window))
        self.json_path = (os.path.join(out_dir, "metrics.jsonl")
                          if out_dir else None)
        self.tb = None
        if self.json_path:
            os.makedirs(out_dir, exist_ok=True)
            if tb:
                from .tbwriter import TBWriter
                self.tb = TBWriter(os.path.join(out_dir, "tb"))
        # opt-in remote tracking (the reference's wandb mirror class,
        # tools/train.py:211-235): EMD_TPU_TRACK_URL or track_url
        track_url = track_url or os.environ.get("EMD_TPU_TRACK_URL")
        self.tracker = None
        if track_url:
            from .tracker import RemoteTracker
            self.tracker = RemoteTracker(
                track_url, run_name=os.path.basename(out_dir or "run"))
        self._t0 = time.time()
        self._last = self._t0

    def update(self, **kwargs) -> None:
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def dump(self, step: int) -> None:
        if not self.json_path:
            return
        row = {"step": step, "time": time.time() - self._t0}
        row.update({k: m.avg for k, m in self.meters.items()})
        with open(self.json_path, "a") as f:
            f.write(json.dumps(row) + "\n")
        if self.tb is not None:
            self.tb.add_scalars(
                {f"train/{k}": m.avg for k, m in self.meters.items()}, step)
            self.tb.flush()
        if self.tracker is not None:
            self.tracker.log(step,
                             {k: m.avg for k, m in self.meters.items()})

    def line(self, step: int, total: int) -> str:
        now = time.time()
        dt = now - self._last
        self._last = now
        done = max(step, 1)
        eta = (now - self._t0) / done * (total - done)
        parts = [f"step {step}/{total}", f"eta {eta/60:.1f}m",
                 f"dt {dt:.2f}s"]
        parts += [f"{k} {m.avg:.4f}" for k, m in sorted(self.meters.items())
                  if k in ("loss", "psnr", "rgb", "ssim")]
        return "  ".join(parts)
