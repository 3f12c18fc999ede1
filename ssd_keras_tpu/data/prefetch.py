"""Background prefetching for host data generators.

The reference's generator runs inline with the training loop, so the
accelerator idles while the host augments/encodes the next batch. This
wrapper pulls batches on worker threads into a bounded queue so host work
overlaps device steps — with the on-device pipeline (data/device_aug.py) the
host share shrinks to image decode, and one or two prefetch threads suffice
to keep the chip fed.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

__all__ = ["PrefetchGenerator", "prefetch"]

_SENTINEL = object()


class PrefetchGenerator:
    """Wraps an iterator; worker threads keep ``buffer_size`` batches ready."""

    def __init__(self, generator: Iterator, buffer_size: int = 4, n_workers: int = 1):
        self._generator = generator
        self._queue: "queue.Queue" = queue.Queue(maxsize=buffer_size)
        self._lock = threading.Lock()  # generators aren't thread-safe
        self._stopped = threading.Event()
        self._workers = [
            threading.Thread(target=self._worker, daemon=True)
            for _ in range(max(1, n_workers))
        ]
        for w in self._workers:
            w.start()

    def _worker(self):
        while not self._stopped.is_set():
            try:
                with self._lock:
                    item = next(self._generator)
            except StopIteration:
                self._queue.put(_SENTINEL)
                return
            except Exception as e:  # surface errors to the consumer
                self._queue.put(e)
                return
            self._queue.put(item)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is _SENTINEL:
            raise StopIteration
        if isinstance(item, Exception):
            raise item
        return item

    def stop(self):
        self._stopped.set()
        # Drain so blocked workers can exit.
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass


def prefetch(generator: Iterator, buffer_size: int = 4, n_workers: int = 1):
    """Convenience: ``for batch in prefetch(gen.generate(...)): ...``"""
    return PrefetchGenerator(generator, buffer_size=buffer_size, n_workers=n_workers)
