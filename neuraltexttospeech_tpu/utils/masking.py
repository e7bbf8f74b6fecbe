"""Length-mask helpers (reference: ``FastPitch_TF/common/utils.py:8-13``,
``Tacotron2_TF/utils.py:9-15``).

All masks are boolean, statically shaped, and built with ``broadcasted_iota``
so they trace cleanly under ``jit`` (no data-dependent shapes).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["mask_from_lens", "get_mask_from_lengths", "lengths_to_mask"]


def mask_from_lens(lengths, max_len: int):
    """[B] lengths -> [B, max_len] bool mask (True inside the sequence)."""
    pos = jnp.arange(max_len, dtype=jnp.int32)
    return pos[None, :] < lengths[:, None].astype(jnp.int32)


# Tacotron2-lineage alias (`get_mask_from_lengths`).
get_mask_from_lengths = mask_from_lens
lengths_to_mask = mask_from_lens
