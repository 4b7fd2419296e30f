"""Background batch prefetching: the TPU-native stand-in for torch
DataLoader's worker processes (reference trains through HF Trainer +
DataLoader(num_workers)—SURVEY.md §3.1; JAX has no built-in input pipeline).

Two independent levers:

  * `PrefetchIterator(it, depth)` — a producer THREAD drains the wrapped
    iterator into a bounded queue so host-side batch assembly (image decode,
    PIL/native resize, teacher featurization) overlaps the device step. The
    hot pixel loops run in PIL/numpy/ctypes code that releases the GIL, so a
    thread (not a process) captures most of the win without pickling batches.
  * `BatchIterator(num_workers=N)` (data/dataset.py) — intra-batch
    ThreadPoolExecutor over dataset.__getitem__ for the per-sample decode.

Exceptions raised by the producer surface at the consuming `next()` call with
their original traceback; the thread is a daemon and shuts down with the
iterator (close() or GC).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterable, Iterator

_SENTINEL = object()


class PrefetchIterator:
    """Iterate `src` on a background thread, keeping up to `depth` items ready."""

    def __init__(self, src: Iterable[Any], depth: int = 2):
        if depth < 1:
            raise ValueError(f"depth must be >= 1, got {depth}")
        self._q: "queue.Queue[Any]" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._src = iter(src)
        self._thread = threading.Thread(target=self._fill, daemon=True)
        self._thread.start()

    def _fill(self) -> None:
        try:
            for item in self._src:
                if self._stop.is_set():
                    return
                # bounded put, but stay responsive to close()
                while not self._stop.is_set():
                    try:
                        self._q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if self._stop.is_set():
                    return
        except BaseException as e:  # noqa: BLE001 — forwarded to the consumer
            self._q.put(("__prefetch_error__", e))
            return
        self._q.put(_SENTINEL)

    def __iter__(self) -> Iterator[Any]:
        return self

    def __next__(self) -> Any:
        if self._stop.is_set():
            raise StopIteration
        item = self._q.get()
        if item is _SENTINEL:
            self._stop.set()
            raise StopIteration
        if isinstance(item, tuple) and len(item) == 2 and item[0] == "__prefetch_error__":
            self._stop.set()
            raise item[1]
        return item

    def close(self) -> None:
        self._stop.set()
        # unblock a producer waiting on a full queue
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass

    def __del__(self):  # pragma: no cover - GC timing
        try:
            self.close()
        except Exception:
            pass
