"""Tracing & profiling hooks (SURVEY.md §5 "Tracing / profiling").

The reference has only vestigial timers (dataset_core/utils/writer.py:263-289)
wired to nothing.  Here profiling is first-class:

  * ClipTimer — per-clip latency + frames/sec/chip counters (the north-star
    metric) with running averages and JSONL export.
  * trace_annotation — jax.profiler.TraceAnnotation passthrough so
    encode/denoise/decode stages show up named in xprof captures.
  * start_trace/stop_trace — programmatic xprof capture around a region.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Optional


@contextlib.contextmanager
def trace_annotation(name: str):
    import jax.profiler

    with jax.profiler.TraceAnnotation(name):
        yield


def start_trace(logdir: str):
    import jax.profiler

    jax.profiler.start_trace(logdir)


def stop_trace():
    import jax.profiler

    jax.profiler.stop_trace()


class ClipTimer:
    """Wall-clock per clip, frames/sec running stats, optional JSONL log."""

    def __init__(self, jsonl_path: Optional[str] = None):
        self.jsonl_path = jsonl_path
        self.count = 0
        self.total_s = 0.0
        self.total_frames = 0
        self.last_s = 0.0

    @contextlib.contextmanager
    def clip(self, num_frames: int):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self.count += 1
        self.total_s += dt
        self.total_frames += num_frames
        self.last_s = dt
        if self.jsonl_path:
            with open(self.jsonl_path, "a") as f:
                f.write(
                    json.dumps(
                        {
                            "clip": self.count,
                            "seconds": dt,
                            "frames": num_frames,
                            "fps": num_frames / dt if dt > 0 else 0.0,
                        }
                    )
                    + "\n"
                )

    @property
    def fps(self) -> float:
        return self.total_frames / self.total_s if self.total_s > 0 else 0.0

    def summary(self) -> str:
        return (
            f"clip {self.count}: {self.last_s:.2f}s, "
            f"avg {self.fps:.2f} frames/s"
        )
