"""Tacotron 2 training step: jitted DP step with BatchNorm state.

Tacotron 2 is the one model in the suite whose encoder/postnet carry
BatchNorm running statistics, so it gets a dedicated step (like HiFi-GAN's
GAN step) instead of the generic params-only ``Trainer``; the reference's
equivalent is ``Tacotron2.train_step`` (``Tacotron2_TF/model.py:719-743``).
Optimization defaults follow ``hparams.py``: Adam 1e-3, weight decay 1e-6,
grad-clip 1.0.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .tacotron2 import Tacotron2, Tacotron2Config, tacotron2_loss

__all__ = ["Tacotron2TrainState", "init_tacotron2", "tacotron2_train_step",
           "gate_targets"]


class Tacotron2TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)


def make_tacotron2_optimizer(learning_rate: float = 1e-3,
                             weight_decay: float = 1e-6,
                             grad_clip_thresh: float = 1.0):
    return optax.chain(
        optax.clip_by_global_norm(grad_clip_thresh),
        optax.adamw(learning_rate, weight_decay=weight_decay),
    )


def init_tacotron2(config: Tacotron2Config, rng: jax.Array,
                   learning_rate: float = 1e-3) -> Tacotron2TrainState:
    model = Tacotron2(config)
    text = jnp.zeros((1, 8), jnp.int32)
    lens = jnp.full((1,), 8, jnp.int32)
    mel = jnp.zeros((1, 12, config.n_mel_channels))
    # jit the init: eager init is pathologically slow on remote backends
    variables = jax.jit(lambda r: model.init(
        {"params": r, "dropout": jax.random.fold_in(r, 1)},
        text, lens, mel, jnp.full((1,), 12, jnp.int32)))(rng)
    tx = make_tacotron2_optimizer(learning_rate)
    return Tacotron2TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        tx=tx,
    )


def gate_targets(mel_lens, max_len: int) -> jax.Array:
    """1.0 at the last valid frame and beyond (stop token targets)."""
    pos = jnp.arange(max_len)[None, :]
    return (pos >= (mel_lens[:, None] - 1)).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("config",), donate_argnums=(1,))
def tacotron2_train_step(
    config: Tacotron2Config,
    state: Tacotron2TrainState,
    batch: Dict[str, jax.Array],
    rng: jax.Array,
):
    model = Tacotron2(config)
    rng = jax.random.fold_in(rng, state.step)
    gate_tgt = gate_targets(batch["mel_lens"], batch["mel"].shape[1])

    def loss_fn(params):
        out, mutated = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch["text"], batch["input_lens"], batch["mel"],
            batch["mel_lens"], train=True,
            rngs={"dropout": rng}, mutable=["batch_stats"])
        loss, meta = tacotron2_loss(out, batch["mel"], gate_tgt)
        return loss, (meta, mutated["batch_stats"])

    (loss, (meta, new_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
    new_state = state.replace(
        step=state.step + 1,
        params=optax.apply_updates(state.params, updates),
        batch_stats=new_stats,
        opt_state=new_opt,
    )
    meta = dict(meta)
    meta["loss"] = loss
    return new_state, meta
