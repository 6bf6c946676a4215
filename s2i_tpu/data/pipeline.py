"""Host input pipeline: background prefetching + parallel image loading
(SURVEY.md §1 L1 — the reference leans on torch DataLoader worker processes;
here decode/transform run in a thread pool (PIL releases the GIL in its C
decode path) and a bounded background queue keeps batches ready so the TPU
step never waits on the host).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Iterable, Iterator


class Prefetcher:
    """Wrap an iterable: produce items in a daemon thread, buffer up to
    ``depth`` items ahead. Exceptions propagate to the consumer."""

    _DONE = object()

    def __init__(self, iterable: Iterable, depth: int = 4):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err: list[BaseException] = []
        self._thread = threading.Thread(
            target=self._run, args=(iterable,), daemon=True
        )
        self._thread.start()

    def _run(self, iterable: Iterable) -> None:
        try:
            for item in iterable:
                self._q.put(item)
        except BaseException as e:  # noqa: BLE001 — re-raised on the consumer
            self._err.append(e)
        finally:
            self._q.put(self._DONE)

    def __iter__(self) -> Iterator:
        while True:
            item = self._q.get()
            if item is self._DONE:
                if self._err:
                    raise self._err[0]
                return
            yield item


def prefetch(iterable: Iterable, depth: int = 4) -> Iterator:
    return iter(Prefetcher(iterable, depth))


class ParallelMap:
    """Ordered parallel map over an index sequence (image decode pool)."""

    def __init__(self, fn: Callable[[Any], Any], workers: int = 8):
        self.fn = fn
        self.pool = ThreadPoolExecutor(max_workers=workers)

    def __call__(self, items: Iterable) -> list:
        return list(self.pool.map(self.fn, items))

    def close(self) -> None:
        self.pool.shutdown(wait=False)
