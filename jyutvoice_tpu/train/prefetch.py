"""Background-thread batch prefetcher.

The host-side analog of the reference's DataLoader worker processes
(configs/base.yaml:119 num_workers): collation overlaps device compute so
the TPU never waits on the host. Thread-based (collation is numpy-bound and
releases the GIL in the hot parts); depth-bounded queue.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

_SENTINEL = object()


def prefetch(batches: Iterable, depth: int = 2) -> Iterator:
    """Wrap a batch iterator with a depth-bounded background producer."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    err: list = []

    def producer():
        try:
            for b in batches:
                q.put(b)
        except BaseException as e:  # propagate into the consumer
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        yield item
