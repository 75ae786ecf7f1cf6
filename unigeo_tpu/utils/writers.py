"""Event writers: structured JSONL (always) + optional TensorBoard/W&B.

(reference: dataset_core/utils/writer.py — a tensorboard/wandb event queue
with ring-buffer timing averages that the eval path never initializes.
Here: one small writer facade that is actually wired into the drivers, with
a JSONL sink that needs no external services, plus optional TB/W&B sinks
when those packages are importable.)
"""

from __future__ import annotations

import json
import os
import time
from collections import deque
from typing import Dict, Optional


class EventWriter:
    def __init__(
        self,
        log_dir: str,
        use_tensorboard: bool = False,
        use_wandb: bool = False,
        wandb_kwargs: Optional[Dict] = None,
    ):
        os.makedirs(log_dir, exist_ok=True)
        self.jsonl_path = os.path.join(log_dir, "events.jsonl")
        self._tb = None
        self._wandb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                pass
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(dir=log_dir, **(wandb_kwargs or {}))
            except Exception:
                pass

    def put_scalar(self, name: str, value: float, step: int) -> None:
        with open(self.jsonl_path, "a") as f:
            f.write(
                json.dumps(
                    {"t": time.time(), "step": step, "name": name, "value": float(value)}
                )
                + "\n"
            )
        if self._tb is not None:
            self._tb.add_scalar(name, value, step)
        if self._wandb is not None:
            self._wandb.log({name: value}, step=step)

    def put_scalars(self, scalars: Dict[str, float], step: int) -> None:
        for name, value in scalars.items():
            self.put_scalar(name, value, step)

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()


class TimeWriter:
    """Context manager tracking a running average + ETA
    (reference: writer.py:263-289)."""

    def __init__(self, writer: Optional[EventWriter] = None, name: str = "time",
                 window: int = 20, total_steps: Optional[int] = None):
        self.writer = writer
        self.name = name
        self.times = deque(maxlen=window)
        self.total_steps = total_steps
        self.step = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        self.step += 1
        if self.writer is not None:
            self.writer.put_scalar(self.name, dt, self.step)
        return False

    @property
    def avg(self) -> float:
        return sum(self.times) / len(self.times) if self.times else 0.0

    @property
    def eta_seconds(self) -> Optional[float]:
        if self.total_steps is None or not self.times:
            return None
        return (self.total_steps - self.step) * self.avg
