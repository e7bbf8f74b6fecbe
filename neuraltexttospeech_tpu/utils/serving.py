"""Batched-serving helpers for the inference CLIs.

The reference inference scripts synthesize one utterance per call with
unpadded shapes, so every distinct text length triggers a fresh XLA
compile — fine on eager CUDA, pathological under jit. These helpers give
every text→mel CLI the TPU-friendly loop: length-sort the utterances,
batch them, and pad to coarse buckets so a whole run compiles
O(distinct buckets) programs instead of O(utterances).

(Reference counterpart: e.g. ``FastPitch_TF/model.py:365`` ``inference``
is a stub; the per-line loops these CLIs originally mirrored are this
framework's own round-2 code.)
"""

from typing import List, Sequence

import numpy as np

__all__ = ["round_up", "text_batches"]


def round_up(n: int, multiple: int) -> int:
    return -(-int(n) // multiple) * multiple


def text_batches(encoded: Sequence[np.ndarray], batch_size: int,
                 bucket: int = 16):
    """Yield ``(indices, text, lens)`` device batches over encoded texts.

    ``encoded``: per-utterance int32 id arrays. Utterances are processed
    shortest-first; each batch is padded to the next ``bucket`` multiple
    of its longest member. The final batch is zero-padded up to
    ``batch_size`` rows (pad rows get ``lens == 1``) so the batch dim
    stays static; ``indices`` has only the real rows, in original input
    order positions.
    """
    batch_size = max(1, int(batch_size))
    order = sorted(range(len(encoded)), key=lambda j: len(encoded[j]))
    for s in range(0, len(order), batch_size):
        idxs: List[int] = order[s:s + batch_size]
        T = round_up(max(len(encoded[j]) for j in idxs), bucket)
        text = np.zeros((batch_size, T), np.int32)
        lens = np.ones((batch_size,), np.int32)
        for r, j in enumerate(idxs):
            text[r, :len(encoded[j])] = encoded[j]
            lens[r] = len(encoded[j])
        yield idxs, text, lens
