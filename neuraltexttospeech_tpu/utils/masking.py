"""Length-mask helpers (reference: ``FastPitch_TF/common/utils.py:8-13``,
``Tacotron2_TF/utils.py:9-15``).

All masks are boolean, statically shaped, and built with ``broadcasted_iota``
so they trace cleanly under ``jit`` (no data-dependent shapes).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["mask_from_lens", "get_mask_from_lengths", "lengths_to_mask", "AttrDict"]


def mask_from_lens(lengths, max_len: int):
    """[B] lengths -> [B, max_len] bool mask (True inside the sequence)."""
    pos = jnp.arange(max_len, dtype=jnp.int32)
    return pos[None, :] < lengths[:, None].astype(jnp.int32)


# Tacotron2-lineage alias (`get_mask_from_lengths`).
get_mask_from_lengths = mask_from_lens
lengths_to_mask = mask_from_lens


class AttrDict(dict):
    """dict with attribute access (reference ``FastPitch_TF/common/utils.py``
    / ``DiffWave_TF/params.py`` AttrDict, incl. ``override``)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.__dict__ = self

    def override(self, attrs):
        if isinstance(attrs, dict):
            self.__dict__.update(**attrs)
        elif isinstance(attrs, (list, tuple, set)):
            for a in attrs:
                self.override(a)
        elif attrs is not None:
            raise NotImplementedError
        return self
