"""Host-side metric aggregation.

Equivalent of the MetricLogger/SmoothedValue/AverageMeter stacks duplicated in
every reference project (EfficientViT/classification/utils.py:15-113,
TinyViT/my_meter.py, Cream/lib/core/train.py:16-30). Cross-device reduction is
NOT done here — device metrics come out of the jitted steps already reduced
(mean/sum over the mesh), so these meters only smooth/aggregate over steps.
"""
from __future__ import annotations

import collections
import time
from typing import Iterable


class AverageMeter:
    def __init__(self, window: int | None = None):
        self.window = window
        self.reset()

    def reset(self):
        self.sum = 0.0
        self.count = 0
        self._deque = collections.deque(maxlen=self.window)

    def update(self, value: float, n: int = 1):
        value = float(value)
        self.sum += value * n
        self.count += n
        self._deque.append(value)

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)

    @property
    def smoothed(self) -> float:
        return sum(self._deque) / max(len(self._deque), 1)


class MetricLogger:
    def __init__(self, delimiter: str = "  ", window: int = 20):
        self.meters: dict[str, AverageMeter] = collections.defaultdict(
            lambda: AverageMeter(window))
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __str__(self):
        return self.delimiter.join(
            f"{k}: {m.smoothed:.4f} ({m.avg:.4f})" for k, m in self.meters.items())

    def log_every(self, iterable: Iterable, print_freq: int, logger=print,
                  header: str = ""):
        start = time.time()
        iter_time = AverageMeter(window=print_freq)
        last = time.time()
        for i, obj in enumerate(iterable):
            yield obj
            iter_time.update(time.time() - last)
            last = time.time()
            if i % print_freq == 0:
                logger(f"{header} [{i}] {self} time: {iter_time.smoothed:.4f}s")
        logger(f"{header} done in {time.time() - start:.1f}s")


def topk_accuracy_counts(metrics_list: list[dict]) -> dict:
    """Aggregate eval-step count dicts into top-1/top-5 percentages."""
    tot = {k: 0.0 for k in ("correct1", "correct5", "n", "loss_sum")}
    for m in metrics_list:
        for k in tot:
            tot[k] += float(m[k])
    n = max(tot["n"], 1.0)
    return {"acc1": 100.0 * tot["correct1"] / n,
            "acc5": 100.0 * tot["correct5"] / n,
            "loss": tot["loss_sum"] / n, "n": int(tot["n"])}


class ScalarLogger:
    """Scalar multiplexer over tensorboard / wandb / JSONL backends — the
    reference projects' writer + wandb.log pairs (TinyCLIP
    training/train.py:292-303, Swin-style SummaryWriter use) behind one
    interface. Every backend is optional; wandb degrades to the JSONL file
    with a warning when the package is missing (it is not baked into this
    image)."""

    def __init__(self, logdir: str | None = None, tensorboard: bool = False,
                 wandb_project: str | None = None, wandb_config=None,
                 jsonl: str | None = None):
        self._tb = None
        self._wandb = None
        self._jsonl = None
        if tensorboard and logdir:
            import tensorflow as tf
            self._tb = tf.summary.create_file_writer(logdir)
        if wandb_project:
            try:
                import wandb
                wandb.init(project=wandb_project, config=wandb_config,
                           dir=logdir)
                self._wandb = wandb
            except ImportError:
                import warnings
                warnings.warn("wandb not installed; logging scalars to "
                              "JSONL instead")
                jsonl = jsonl or (f"{logdir}/wandb_fallback.jsonl"
                                  if logdir else "scalars.jsonl")
        if jsonl:
            import os
            os.makedirs(os.path.dirname(jsonl) or ".", exist_ok=True)
            self._jsonl = open(jsonl, "a")

    def log(self, step: int, **scalars):
        scalars = {k: float(v) for k, v in scalars.items()}
        if self._tb is not None:
            import tensorflow as tf
            with self._tb.as_default():
                for k, v in scalars.items():
                    tf.summary.scalar(k, v, step=step)
        if self._wandb is not None:
            self._wandb.log(scalars, step=step)
        if self._jsonl is not None:
            import json
            self._jsonl.write(json.dumps({"step": step, **scalars}) + "\n")
            self._jsonl.flush()

    def close(self):
        if self._wandb is not None:
            self._wandb.finish()
        if self._jsonl is not None:
            self._jsonl.close()
