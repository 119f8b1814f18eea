"""Host→device prefetch iterator.

The reference overlaps data prep with compute via torch DataLoader worker
subprocesses + pinned memory (reference src/data/dataset.py:532-539,
train.py:77). The TPU-native equivalent is simpler: batch assembly is cheap
host numpy (manifest metadata + one npz read), and the expensive part — the
H2D transfer and the fused frontend — is an async XLA dispatch. One
background thread running `transfer` (typically `shard_batch`/`device_put`)
a few batches ahead hides the host work behind the device step.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional, TypeVar

T = TypeVar("T")

_SENTINEL = object()


def prefetch(
    iterable: Iterable[T],
    transfer: Optional[Callable[[T], T]] = None,
    depth: int = 2,
) -> Iterator[T]:
    """Yield items of `iterable` in order, produced (and `transfer`ed) up to
    `depth` items ahead on a daemon thread. Exceptions raised by the source
    iterator or by `transfer` propagate to the consumer at the matching
    position."""
    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))

    def worker():
        try:
            for item in iterable:
                if transfer is not None:
                    item = transfer(item)
                q.put(item)
        except BaseException as e:  # propagate into the consuming thread
            q.put((_SENTINEL, e))
        else:
            q.put((_SENTINEL, None))

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if isinstance(item, tuple) and len(item) == 2 and item[0] is _SENTINEL:
            if item[1] is not None:
                raise item[1]
            return
        yield item
