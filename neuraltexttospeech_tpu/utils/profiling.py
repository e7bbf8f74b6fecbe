"""Profiling/tracing utilities.

Replaces the reference's debugging hooks — the TF debugger V2 full-tensor
dump wired at import (``FastPitch_TF/train.py:23-27``) and printf tracing
(``Tacotron2_TF/model.py``) — with the JAX-native tools: ``jax.profiler``
traces viewable in TensorBoard/XProf, plus a light step timer.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax

__all__ = ["trace", "annotate", "StepTimer"]


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace into ``logdir`` (open with TensorBoard's
    profile plugin)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (``with annotate("decoder"): ...``)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling steps/sec + items/sec meter for training loops."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: list[float] = []
        self._items: list[int] = []

    def tick(self, n_items: int = 1):
        self._times.append(time.perf_counter())
        self._items.append(n_items)
        if len(self._times) > self.window + 1:
            self._times.pop(0)
            self._items.pop(0)

    @property
    def steps_per_sec(self) -> Optional[float]:
        if len(self._times) < 2:
            return None
        dt = self._times[-1] - self._times[0]
        return (len(self._times) - 1) / dt if dt > 0 else None

    @property
    def items_per_sec(self) -> Optional[float]:
        if len(self._times) < 2:
            return None
        dt = self._times[-1] - self._times[0]
        return sum(self._items[1:]) / dt if dt > 0 else None
