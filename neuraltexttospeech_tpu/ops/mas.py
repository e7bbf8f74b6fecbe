"""Monotonic Alignment Search (MAS) — on-device, batched, jittable.

The reference computes MAS on the host: FastPitch runs a per-sample Python/
NumPy Viterbi loop (``FastPitch_TF/alignment.py:7-68``) behind an explicit
tf→numpy round-trip (``FastPitch_TF/model.py:227-256``), and Grad-TTS ships a
Cython/OpenMP kernel (``Grad-TTS_TF/model/monotonic_align/core.pyx:9-45``)
that also forces eager mode. Both choices serialize the training step on the
host.

This TPU-native version keeps the whole DP on device:

- **forward pass**: one ``lax.scan`` over mel frames; each step is a fully
  vectorized ``[B, T_text]`` max/shift/add on the VPU, so the only sequential
  dimension is T_mel and the batch rides for free;
- **backtrack**: a reverse ``lax.scan`` carrying one text index per batch
  element, emitting one-hot rows (no host transfer, no dynamic shapes);
- variable lengths are handled with masks: the recursion is constrained to
  ``j < in_len`` and rows at ``i >= out_len`` produce zeros, matching the
  reference's ``b_mas`` length slicing (``alignment.py:62-68``).

Width is fixed at 1 (the only width the reference ever uses; ``b_mas``
asserts it).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["maximum_path", "b_mas", "mas_width1_numpy"]

_NEG = -1e9


def _forward(log_attn, key_mask):
    """Viterbi forward: returns ``choose_diag`` [T_mel, B, T_text] bools.

    log_p[i, j] = log_attn[i, j] + max(log_p[i-1, j-1], log_p[i-1, j]);
    ``choose_diag[i]`` records whether the diagonal predecessor won at row i
    (the comparison the backtrack needs), i.e. log_p[i-1, j-1] >= log_p[i-1, j].
    """
    B, T_mel, T_text = log_attn.shape
    log_attn = jnp.where(key_mask[:, None, :], log_attn, _NEG)

    # Row 0: only j == 0 reachable (reference ``mas_width1`` seeds log_p[0,1:]=-inf).
    j_is0 = jnp.arange(T_text)[None, :] == 0
    row0 = jnp.where(j_is0, log_attn[:, 0, :], _NEG)

    def step(prev, row):
        shifted = jnp.concatenate(
            [jnp.full((B, 1), _NEG, prev.dtype), prev[:, :-1]], axis=1
        )
        choose_diag = shifted >= prev
        cur = row + jnp.maximum(shifted, prev)
        # Clamp so -1e9 doesn't accumulate into overflow over long sequences.
        cur = jnp.maximum(cur, _NEG)
        return cur, choose_diag

    # unroll: the per-step body is a tiny [B, T_text] elementwise update, so
    # without it the TPU spends part of the scan in while-loop bookkeeping.
    # Measured on the chip at 16x768x192, isolated (both scans + backtrack
    # together): 2.65 ms -> 2.0 ms with unroll=16. Inside the full FastPitch
    # train step the win washes out (XLA overlaps the scan with other work;
    # in-step A/B was neutral) — kept for the standalone users: the
    # align_from_fastpitch tool and binarize-only callers (PERF.md round 3).
    _, choose = jax.lax.scan(step, row0, jnp.swapaxes(log_attn, 0, 1)[1:],
                             unroll=16)
    # Prepend a dummy row so choose[i] aligns with mel row i (row 0 unused).
    choose = jnp.concatenate([jnp.zeros((1, B, T_text), bool), choose], axis=0)
    return choose


def _backtrack(choose, in_lens, out_lens, T_mel, T_text):
    """Reverse scan emitting the one-hot alignment path [B, T_mel, T_text]."""
    B = in_lens.shape[0]
    j_iota = jnp.arange(T_text)[None, :]

    def step(j, idx):
        i = idx  # scalar, runs T_mel-1 .. 0
        active = i < out_lens  # [B]
        row = (j_iota == j[:, None]) & active[:, None]
        take_diag = jnp.take_along_axis(choose[i], j[:, None], axis=1)[:, 0]
        j_next = jnp.where(active & (i > 0), j - take_diag.astype(j.dtype), j)
        j_next = jnp.maximum(j_next, 0)
        return j_next, row

    j0 = (in_lens - 1).astype(jnp.int32)
    _, rows = jax.lax.scan(step, j0, jnp.arange(T_mel - 1, -1, -1),
                           unroll=16)
    return jnp.flip(jnp.swapaxes(rows, 0, 1), axis=1)


@jax.jit
def maximum_path(log_attn, in_lens, out_lens):
    """Batched width-1 MAS.

    Args:
      log_attn: [B, T_mel, T_text] log attention map.
      in_lens:  [B] text lengths.
      out_lens: [B] mel lengths.
    Returns:
      [B, T_mel, T_text] float32 hard alignment (one-hot per valid mel row).
    """
    B, T_mel, T_text = log_attn.shape
    in_lens = in_lens.astype(jnp.int32)
    out_lens = out_lens.astype(jnp.int32)
    key_mask = jnp.arange(T_text)[None, :] < in_lens[:, None]
    choose = _forward(log_attn.astype(jnp.float32), key_mask)
    path = _backtrack(choose, in_lens, out_lens, T_mel, T_text)
    return path.astype(jnp.float32)


def b_mas(b_log_attn_map, in_lens, out_lens, width: int = 1):
    """Reference-API shim (``FastPitch_TF/alignment.py:62-68``):
    [B, 1, T_mel, T_text] -> same-shaped hard attention."""
    assert width == 1
    out = maximum_path(
        jnp.asarray(b_log_attn_map)[:, 0], jnp.asarray(in_lens), jnp.asarray(out_lens)
    )
    return out[:, None]


def mas_width1_numpy(log_attn_map: np.ndarray) -> np.ndarray:
    """Host NumPy oracle with the reference's exact semantics
    (``FastPitch_TF/alignment.py:33-58``) — used by tests to validate the
    device kernel, mirroring the repo's oracle-diff methodology (SURVEY §4.1).
    """
    neg_inf = -np.inf
    log_p = log_attn_map.astype(np.float64).copy()
    log_p[0, 1:] = neg_inf
    T_mel, T_text = log_p.shape
    for i in range(1, T_mel):
        prev = log_p[i - 1]
        shifted = np.concatenate([[neg_inf], prev[:-1]])
        log_p[i] += np.maximum(shifted, prev)
    opt = np.zeros_like(log_p, dtype=np.float32)
    j = T_text - 1
    for i in range(T_mel - 1, 0, -1):
        opt[i, j] = 1.0
        if j > 0 and log_p[i - 1, j - 1] >= log_p[i - 1, j]:
            j -= 1
    opt[0, j] = 1.0
    return opt
