"""Host-parallel clip prefetching (SURVEY.md §7 hard-part #5).

The reference's second hot loop is per-frame file I/O + resize inside
``__getitem__`` (SURVEY.md §3.2) executed serially between GPU calls.  Here
a thread pool decodes/resizes clips ahead of the consumer and (optionally)
stages them onto device, so the TPU never waits on the host:

    for data in PrefetchLoader(dataset, num_workers=8, prefetch=4): ...

Threads are the right tool (PIL/numpy release the GIL during decode); no
worker processes, no pickling.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional


class PrefetchLoader:
    def __init__(
        self,
        dataset,
        num_workers: int = 4,
        prefetch: int = 4,
        device_put: bool = False,
        indices=None,
    ):
        self.dataset = dataset
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.device_put = device_put
        self.indices = list(indices) if indices is not None else list(range(len(dataset)))

    def __len__(self) -> int:
        return len(self.indices)

    def _load(self, idx: int):
        data = self.dataset[idx]
        if self.device_put:
            import jax

            for key in ("images", "intrinsics"):
                if key in data:
                    data[key] = jax.device_put(data[key])
        return data

    def __iter__(self) -> Iterator:
        executor = ThreadPoolExecutor(max_workers=self.num_workers)
        try:
            pending = queue.Queue()
            it = iter(self.indices)

            # prime the pipeline
            for _ in range(self.prefetch):
                try:
                    idx = next(it)
                except StopIteration:
                    break
                pending.put(executor.submit(self._load, idx))

            while not pending.empty():
                fut = pending.get()
                try:
                    idx = next(it)
                    pending.put(executor.submit(self._load, idx))
                except StopIteration:
                    pass
                yield fut.result()
        finally:
            executor.shutdown(wait=False, cancel_futures=True)
