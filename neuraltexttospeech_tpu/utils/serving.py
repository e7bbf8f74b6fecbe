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

__all__ = ["round_up", "text_batches", "serving_sharding"]


def round_up(n: int, multiple: int) -> int:
    return -(-int(n) // multiple) * multiple


def serving_sharding(batch_size: int):
    """SPMD serving placement: ``(put, replicate, batch_size)``.

    With more than one visible device, ``put(x)`` shards a host batch's
    leading dim across ALL devices over a 1-D ``('data',)`` mesh (the same
    data axis the training harness shards on) and ``replicate(tree)``
    places a param pytree replicated on that mesh (a checkpoint restore
    commits params to one device, which jit refuses to mix with sharded
    inputs), so every jitted synth call runs SPMD with XLA inserting any
    needed collectives; ``batch_size`` is rounded up to a device multiple
    (``text_batches`` zero-pads the final batch, so the static shape
    always divides). On one device ``put`` is a plain host→device
    transfer, ``replicate`` is identity, and the requested size passes
    through.
    """
    import jax
    import jax.numpy as jnp

    batch_size = max(1, int(batch_size))
    devices = jax.devices()
    if len(devices) <= 1:
        return jnp.asarray, (lambda tree: tree), batch_size
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    mesh = Mesh(np.asarray(devices), ("data",))
    sharded = NamedSharding(mesh, PartitionSpec("data"))
    replicated = NamedSharding(mesh, PartitionSpec())
    return (lambda x: jax.device_put(np.asarray(x), sharded),
            lambda tree: jax.device_put(tree, replicated),
            round_up(batch_size, len(devices)))


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
