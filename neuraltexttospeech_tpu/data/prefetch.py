"""Background batch prefetching.

The reference leaned on ``tf.data``'s ``.prefetch()``
(``FastPitch_TF/train.py:264-347``); here a small thread+queue wrapper gives
the same host/device overlap for any Python batch iterator: the next batch
is collated on the host while the device runs the current step.

Collation in this codebase is stateless/pure, so a single producer thread is
race-free by construction — the concurrency bug the reference hit with its
shared mutable collate function (SURVEY §5: the train generator thread
corrupting the val collator) cannot occur.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

__all__ = ["prefetch"]

_SENTINEL = object()


def prefetch(iterable: Iterable[T], buffer_size: int = 2) -> Iterator[T]:
    """Yield items from ``iterable`` with a background producer thread."""
    q: queue.Queue = queue.Queue(maxsize=buffer_size)
    error: list[BaseException] = []

    def producer():
        try:
            for item in iterable:
                q.put(item)
        except BaseException as e:  # propagate into the consumer
            error.append(e)
        finally:
            q.put(_SENTINEL)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if error:
                raise error[0]
            return
        yield item
