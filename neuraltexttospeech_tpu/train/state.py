"""Train state + optimizer construction shared by every model family.

Supersedes the per-model Keras ``compile``/``fit`` plumbing of the reference
(``FastPitch_TF/train.py:351-358``, ``DiffWave_TF/train.py:236-290``, …) with
one functional state pytree. Optimizers cover the reference's knobs: Adam
(every model), LAMB (named but unused at ``FastPitch_TF/train.py:72-73`` —
actually wired here), gradient clipping, gradient accumulation
(``--gradient-accumulation-steps`` flag the reference never implemented,
``train.py:60-61``), and exponential / Noam-style LR schedules.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import optax
from flax import struct

__all__ = ["OptimizerConfig", "TrainState", "make_optimizer"]


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    optimizer: str = "adam"           # adam | adamw | lamb
    learning_rate: float = 1e-4
    beta1: float = 0.9
    beta2: float = 0.98
    eps: float = 1e-9
    weight_decay: float = 1e-6
    grad_clip_norm: Optional[float] = 1000.0
    grad_accum_steps: int = 1
    # schedule: constant | exponential | noam
    schedule: str = "constant"
    decay_rate: float = 0.999         # per decay_steps (HiFi-GAN lr_decay)
    decay_steps: int = 1000
    warmup_steps: int = 1000          # noam warmup (FastPitch upstream)


def _schedule(config: OptimizerConfig) -> optax.Schedule:
    if config.schedule == "constant":
        return optax.constant_schedule(config.learning_rate)
    if config.schedule == "exponential":
        return optax.exponential_decay(
            config.learning_rate, config.decay_steps, config.decay_rate
        )
    if config.schedule == "noam":
        peak = config.learning_rate

        def noam(step):
            step = jax.numpy.maximum(step, 1)
            return peak * jax.numpy.minimum(
                step ** -0.5, step * config.warmup_steps ** -1.5
            ) * config.warmup_steps ** 0.5

        return noam
    raise ValueError(f"unknown schedule {config.schedule}")


def make_optimizer(config: OptimizerConfig) -> optax.GradientTransformation:
    sched = _schedule(config)
    if config.optimizer == "adam":
        core = optax.adam(sched, b1=config.beta1, b2=config.beta2, eps=config.eps)
    elif config.optimizer == "adamw":
        core = optax.adamw(
            sched, b1=config.beta1, b2=config.beta2, eps=config.eps,
            weight_decay=config.weight_decay,
        )
    elif config.optimizer == "lamb":
        core = optax.lamb(
            sched, b1=config.beta1, b2=config.beta2, eps=config.eps,
            weight_decay=config.weight_decay,
        )
    else:
        raise ValueError(f"unknown optimizer {config.optimizer}")

    chain = []
    if config.grad_clip_norm is not None:
        chain.append(optax.clip_by_global_norm(config.grad_clip_norm))
    chain.append(core)
    tx = optax.chain(*chain)
    if config.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=config.grad_accum_steps)
    return tx


class TrainState(struct.PyTreeNode):
    """Functional (params, opt_state, step) bundle."""

    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation) -> "TrainState":
        return cls(
            step=jax.numpy.zeros((), jax.numpy.int32),
            params=params,
            opt_state=tx.init(params),
            tx=tx,
        )

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt_state,
        )
