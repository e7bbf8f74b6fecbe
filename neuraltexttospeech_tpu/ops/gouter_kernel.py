"""Pallas TPU kernel for the gouter folded grouped conv's tap-window dots.

The ``gdot`` lowering (``nn/fastconv.py::Conv._gouter_call``) computes a
folded grouped conv as ``kf`` group-batched ``dot_general``s over shifted
views of the padded input:

    y[g, b, q, :] = sum_mf  xp[g, b, q + mf*s, :] @ wf[mf, g, :, :]

XLA emits good GEMMs for the dots themselves (940 GB/s on the round-4
trace) but surrounds them with physical-layout copies — paired
copy/bitcast minor-dim reorders on every tap operand — worth 17.3 ms of
the 49.9 ms HiFi-GAN GAN step (PERF.md round-4 gdot trace). This kernel
computes the whole tap sum in ONE fused pass: each (g, b) grid cell keeps
the padded row ``xp[g, b]`` in VMEM, loops the ``kf`` static tap offsets
over in-place strided windows, and accumulates in an f32 register tile —
no tap operand is ever materialized, so there is nothing for layout
assignment to copy. Weights are blocked per-``g`` with a B-minor grid
order so each group's ``[kf, X, Y]`` block stays VMEM-resident across the
whole batch.

Reference counterpart: the MSD grouped stacks this feeds,
``HiFiGAN_TF/model.py:279-351``. Forward-only: the caller wraps it in a
``jax.custom_vjp`` whose backward runs the (transposed) XLA dots — see
``fastconv.gouter_tap_dots``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gouter_tap_dots_pallas", "pallas_eligible"]


_VMEM_BUDGET = 10 * 1024 * 1024


def _block_b(b: int, qp: int, q: int, x_dim: int, y_dim: int, kf: int,
             itemsize: int) -> int:
    """Largest divisor of B whose blocks fit the VMEM budget.

    Batch-blocking matters for the short-Q layers (L3-L5 run at Q=64 for
    a 8192-sample segment): one (g, b) cell is a [64, X]@[X, Y] matmul —
    too little work to amortize grid overhead (measured 0.8x vs XLA).
    With bb batch rows per cell the tap dot becomes [bb·q, X]@[X, Y].

    Accounting (measured against Mosaic's scoped-vmem OOM report, not just
    block bytes): the pipeline double-buffers every in/out block, the
    accumulator lives in f32, and each tap's strided window is materialized
    as a [bb·q, X] copy before the dot (budget two of those in flight).

    Long-Q rows don't batch-block at all: at q>=1024 one row already fills
    the MXU M dim and the per-tap window copies dominate (measured on the
    MSD L1 shape: bb=1 261 us vs bb=2 702 us); the short-Q layers want the
    largest bb that fits (L2/L3/L5: 3-9.9x over bb=1 at bb=16)."""
    if q >= 1024:
        b = 1
    for bb in range(b, 0, -1):
        if b % bb:
            continue
        blocks = (bb * qp * x_dim * itemsize      # input rows
                  + kf * x_dim * y_dim * itemsize  # weight block
                  + bb * q * y_dim * itemsize)     # output rows
        vmem = (2 * blocks                         # double buffering
                + bb * q * y_dim * 4               # f32 accumulator
                + 2 * bb * q * x_dim * itemsize)   # window copies
        if vmem <= _VMEM_BUDGET:
            return bb
    return 0


def pallas_eligible(xp_shape, wf_shape, q: int, dtype) -> bool:
    """Static check: shapes the kernel handles well (and fits in VMEM).

    X and Y must tile the 128 lanes; Q must tile the 8-sublane dim.
    """
    g, b, qp, x_dim = xp_shape
    kf, g2, x2, y_dim = wf_shape
    if g != g2 or x_dim != x2:
        return False
    if x_dim % 128 or y_dim % 128 or q % 8:
        return False
    return _block_b(b, qp, q, x_dim, y_dim, kf,
                    jnp.dtype(dtype).itemsize) > 0


@functools.partial(jax.jit, static_argnames=("s", "q"))
def gouter_tap_dots_pallas(xp: jax.Array, wf: jax.Array, *, s: int,
                           q: int) -> jax.Array:
    """y[g, b, q, y] = sum_mf xp[g, b, mf*s + q, :] @ wf[mf, g, :, :].

    xp: [g, B, Qp, X] padded input (Qp >= q + (kf-1)*s), wf: [kf, g, X, Y].
    Returns [g, B, q, Y] in xp.dtype (f32 accumulation on the MXU).
    """
    g, b, qp, x_dim = xp.shape
    kf, _, _, y_dim = wf.shape
    bb = _block_b(b, qp, q, x_dim, y_dim, kf, xp.dtype.itemsize)
    if not bb:
        raise ValueError(f"shapes exceed VMEM budget: {xp.shape} {wf.shape}")

    def kernel(x_ref, w_ref, o_ref):
        acc = jnp.zeros((bb * q, y_dim), jnp.float32)
        for mf in range(kf):  # static tap loop: in-place strided windows
            window = x_ref[0, :, mf * s: mf * s + q, :].reshape(
                bb * q, x_dim)
            acc += jnp.dot(window, w_ref[mf, 0],
                           preferred_element_type=jnp.float32)
        o_ref[0] = acc.reshape(bb, q, y_dim).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((g, b, q, y_dim), xp.dtype),
        grid=(g, b // bb),  # batch minor: a group's weights load once
        in_specs=[
            pl.BlockSpec((1, bb, qp, x_dim), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kf, 1, x_dim, y_dim), lambda i, j: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bb, q, y_dim), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * g * b * kf * q * x_dim * y_dim,
            bytes_accessed=(xp.size + wf.size + g * b * q * y_dim)
            * xp.dtype.itemsize,
            transcendentals=0,
        ),
    )(xp, wf)
