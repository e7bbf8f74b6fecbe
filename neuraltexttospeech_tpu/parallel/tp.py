"""Tensor parallelism: rule-based parameter sharding on the ``model`` axis.

The reference has no tensor/pipeline sharding anywhere (models are 10–50 M
params, SURVEY §2.4) — round 1 therefore reserved a ``model`` mesh axis but
left it unused. This module puts real shardings on it, Megatron-style, for
the FFT-transformer stacks shared by FastPitch / FastSpeech 2:

- the fused qkv projection shards its *output* features (head dim) across
  ``model`` — each shard computes attention for its own heads;
- the attention output projection shards its *input* features, so XLA emits
  one all-reduce per block for the residual sum;
- the ConvFF pair shards the inner (4×) features column-then-row the same
  way — the second all-reduce per block.

Everything is declarative: ``jax.device_put`` with ``NamedSharding`` on the
params; ``jit`` propagates the layouts and inserts the collectives over ICI.
No model code changes — semantics are sharding-invariant, so the TP step is
bit-compatible (up to reduction order) with the replicated one, which is
exactly what ``tests/test_tp.py`` asserts.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

__all__ = ["TPRule", "FFT_TRANSFORMER_TP_RULES", "tp_param_specs",
           "tp_shardings", "shard_params_tp"]

# (path regex, PartitionSpec for matching 'kernel', spec for 'bias')
TPRule = Tuple[str, P, Optional[P]]

# Column-parallel: shard output features; row-parallel: shard input features
# (bias of a row-parallel layer stays replicated — it is added after the
# all-reduce). Conv kernels are [width, in, out]; Dense kernels [in, out].
FFT_TRANSFORMER_TP_RULES: Sequence[TPRule] = (
    # fused qkv Dense: column-parallel over heads
    (r"MultiHeadAttn_\d+/Dense_0/kernel$", P(None, MODEL_AXIS), None),
    (r"MultiHeadAttn_\d+/Dense_0/bias$", P(MODEL_AXIS), None),
    # attention out Dense (no bias): row-parallel
    (r"MultiHeadAttn_\d+/Dense_1/kernel$", P(MODEL_AXIS, None), None),
    # ConvFF: column- then row-parallel over the 4x inner features
    (r"PositionwiseConvFF_\d+/Conv_0/kernel$", P(None, None, MODEL_AXIS), None),
    (r"PositionwiseConvFF_\d+/Conv_0/bias$", P(MODEL_AXIS), None),
    (r"PositionwiseConvFF_\d+/Conv_1/kernel$", P(None, MODEL_AXIS, None), None),
)


def tp_param_specs(params, rules: Sequence[TPRule] = FFT_TRANSFORMER_TP_RULES,
                   model_axis_size: Optional[int] = None):
    """PartitionSpec pytree for ``params``: rule hits shard on ``model``,
    everything else replicates (P()).

    ``model_axis_size``: when given, a matching leaf whose sharded dim is not
    evenly divisible by the axis size falls back to replication instead of
    letting ``jax.device_put`` raise (e.g. n_heads*d_head not divisible by
    the model-axis extent)."""
    compiled = [(re.compile(pat), spec) for pat, spec, _ in rules]

    def divisible(leaf, spec):
        if model_axis_size is None:
            return True
        for dim, axis in enumerate(spec):
            if axis is not None and leaf.shape[dim] % model_axis_size != 0:
                return False
        return True

    def spec_for(path, leaf):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        for pat, spec in compiled:
            if pat.search(name):
                # guards: the sharded dim must exist and divide the model
                # axis evenly; anything else falls back to replication
                if len(spec) <= leaf.ndim and divisible(leaf, spec):
                    return spec
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def tp_shardings(params, mesh: Mesh,
                 rules: Sequence[TPRule] = FFT_TRANSFORMER_TP_RULES):
    """NamedSharding pytree matching ``tp_param_specs``."""
    specs = tp_param_specs(params, rules,
                           model_axis_size=mesh.shape.get(MODEL_AXIS, 1))
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))


def shard_params_tp(params, mesh: Mesh,
                    rules: Sequence[TPRule] = FFT_TRANSFORMER_TP_RULES):
    """Device-put ``params`` with TP layouts on ``mesh``."""
    return jax.device_put(params, tp_shardings(params, mesh, rules))
