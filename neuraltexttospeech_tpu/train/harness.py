"""The shared training loop — written once, reused by every model family.

Replaces the reference's eight per-model harnesses (Keras ``compile``/``fit``
with custom ``train_step`` overrides, plus DiffWave's hand-rolled epoch loop
and ``MirroredStrategy`` fan-out, SURVEY §1 L5/L5d) with one engine:

- a **pjit data-parallel step**: the loss function is jitted once over the
  ('data','model') mesh with the batch sharded on ``data`` and the state
  replicated; XLA emits the gradient all-reduce over ICI — the TPU-native
  equivalent of ``strategy.run`` + NCCL (``DiffWave_TF/train.py:560-578``);
- deterministic per-step RNG folding (seed + step), so runs are reproducible
  and resume-stable;
- metric aggregation (running means, like the reference's
  ``keras.metrics.Mean`` trackers), optional TensorBoard writing;
- orbax checkpoint/resume every N steps with auto-restore of the latest.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp

from ..parallel.mesh import (
    DATA_AXIS, data_sharding, make_mesh, replicated, shard_batch,
)
from .checkpoint import Checkpointer
from .state import OptimizerConfig, TrainState, make_optimizer

__all__ = ["TrainerConfig", "Trainer"]

# loss_fn(params, batch, rng) -> (loss, metrics_dict)
LossFn = Callable[[Any, Dict[str, jax.Array], jax.Array], Any]


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    optimizer: OptimizerConfig = OptimizerConfig()
    seed: int = 1234
    # PRNG implementation for the per-step dropout stream. "rbg" lowers to
    # XLA's RngBitGenerator, which generates mask bits at HBM speed on TPU;
    # the default threefry stream costs real step time on dropout-heavy
    # models (FastPitch bf16 train step: 26.2 ms threefry -> 19.5 ms rbg,
    # measured on the v5e — PERF.md round-3 roofline). Key *derivation*
    # (fold_in per step) stays threefry under either impl, so per-step
    # determinism is unchanged; only the bit stream differs.
    rng_impl: str = "rbg"
    log_every: int = 50
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 1000
    max_checkpoints: int = 5
    tensorboard_dir: Optional[str] = None
    donate_state: bool = True


class _MetricMean:
    """Running mean tracker (reference keras.metrics.Mean usage,
    ``HiFiGAN_TF/gan.py:122-131``).

    Accumulation is LAZY: device scalars are summed with async eager adds
    and only fetched in ``result()``. The old per-step ``float(v)`` was a
    device→host sync on every metric of every step — over the axon tunnel
    one fetch costs ~35-50 ms, so the CLI loop ran at less than half the
    pure-device step rate (PERF.md round-5 host-fed table)."""

    def __init__(self):
        self.totals: Dict[str, Any] = {}
        self.counts: Dict[str, int] = {}

    def update(self, metrics: Dict[str, Any]):
        for k, v in metrics.items():
            cur = self.totals.get(k)
            self.totals[k] = v if cur is None else cur + v
            self.counts[k] = self.counts.get(k, 0) + 1

    def result(self) -> Dict[str, float]:
        return {k: float(self.totals[k]) / max(self.counts[k], 1)
                for k in self.totals}

    def reset(self):
        self.totals.clear()
        self.counts.clear()


class Trainer:
    """Generic pjit trainer: bring a loss_fn, get distributed steps +
    checkpointing + metrics."""

    def __init__(
        self,
        loss_fn: LossFn,
        state: TrainState,
        config: TrainerConfig = TrainerConfig(),
        mesh=None,
    ):
        self.config = config
        self._loss_fn = loss_fn
        # Mesh is built lazily on the first batch when not given, so the
        # data axis can shrink to divide small batches (gcd with devices).
        self.mesh = mesh
        self._step = None
        self.state = state
        if mesh is not None:
            self._finalize_mesh(mesh)
        self._base_rng = jax.random.key(config.seed, impl=config.rng_impl)
        self.metrics = _MetricMean()
        self._writer = None
        if config.tensorboard_dir:
            import tensorflow as tf  # summary writer only; no TF compute

            self._writer = tf.summary.create_file_writer(config.tensorboard_dir)
        self.checkpointer = (
            Checkpointer(config.checkpoint_dir, config.max_checkpoints,
                         config.checkpoint_every)
            if config.checkpoint_dir else None
        )

    def _finalize_mesh(self, mesh):
        self.mesh = mesh
        self.state = jax.device_put(self.state, replicated(mesh))
        loss_fn = self._loss_fn

        def step_fn(state: TrainState, batch, base_rng):
            rng = jax.random.fold_in(base_rng, state.step)

            def wrapped(params):
                return loss_fn(params, batch, rng)

            (loss, metrics), grads = jax.value_and_grad(
                wrapped, has_aux=True
            )(state.params)
            new_state = state.apply_gradients(grads)
            metrics = dict(metrics)
            metrics.setdefault("loss", loss)
            metrics["grad_norm"] = jnp.sqrt(sum(
                jnp.sum(jnp.square(g)) for g in jax.tree.leaves(grads)
            ))
            return new_state, metrics

        donate = (0,) if self.config.donate_state else ()
        self._step = jax.jit(
            step_fn,
            in_shardings=(replicated(mesh), data_sharding(mesh),
                          replicated(mesh)),
            donate_argnums=donate,
        )

    def _ensure_mesh(self, batch):
        if self._step is not None:
            return
        import math

        batch_size = next(iter(jax.tree.leaves(batch))).shape[0]
        n_data = math.gcd(batch_size, jax.device_count())
        self._finalize_mesh(make_mesh(n_data=max(n_data, 1)))

    # ------------------------------------------------------------------ api

    @property
    def step(self) -> int:
        return int(self.state.step)

    def resume(self) -> int:
        """Restore the latest checkpoint if one exists; returns start step."""
        if self.checkpointer is None or self.checkpointer.latest_step() is None:
            return 0
        restored = self.checkpointer.restore(
            jax.tree.map(lambda x: x, self.state)
        )
        self.state = restored
        if self.mesh is not None:
            self.state = jax.device_put(restored, replicated(self.mesh))
        return self.step

    def train_step(self, batch) -> Dict[str, float]:
        self._ensure_mesh(batch)
        # no-op on batches device_iter() already transferred (device_put
        # returns committed arrays unchanged)
        batch = shard_batch(batch, self.mesh)
        self.state, metrics = self._step(self.state, batch, self._base_rng)
        return metrics

    def device_iter(self, batches: Iterable[Dict[str, Any]]):
        """Iterate batches with collation AND the host→device transfer in
        the prefetch producer thread, overlapping the current step.

        ``prefetch`` alone overlaps only the numpy-side collation; the
        transfer still ran on the consumer thread inside ``train_step``,
        serializing step time on host→device bandwidth — the dominant
        term of the host-fed loop on this container's remote-TPU tunnel
        (measured ~5-27 MB/s; PERF.md round-5 host-fed table)."""
        from ..data.prefetch import prefetch

        def produce():
            for batch in batches:
                self._ensure_mesh(batch)
                yield shard_batch(batch, self.mesh)

        return prefetch(produce())

    def fit_epoch(
        self,
        batches: Iterable[Dict[str, Any]],
        *,
        epoch: int = 0,
        log: Callable[[str], None] = print,
    ) -> Dict[str, float]:
        self.metrics.reset()
        t0 = time.perf_counter()
        n = 0
        # One device fetch for the epoch's start step, then count host-side:
        # the step counter increments by exactly 1 per train_step, and
        # fetching ``state.step`` every iteration was a per-step sync that
        # serialized the loop on the dispatch round trip (PERF.md round 5).
        start_step = int(self.state.step)
        for batch in batches:
            metrics = self.train_step(batch)
            n += 1
            self.metrics.update(metrics)
            step = start_step + n
            if step % self.config.log_every == 0:
                means = self.metrics.result()
                rate = n / (time.perf_counter() - t0)
                log(f"epoch {epoch} step {step} "
                    + " ".join(f"{k}={v:.4f}" for k, v in sorted(means.items()))
                    + f" steps/s={rate:.2f}")
                self._write_tb(step, means)
            # Gate the checkpoint call host-side: Checkpointer.save lists
            # the checkpoint directory even when the interval skips the
            # step — a per-step filesystem scan the loop doesn't need.
            if (self.checkpointer is not None
                    and step % self.config.checkpoint_every == 0):
                self.checkpointer.save(step, self.state)
        if n == 0:
            print("WARNING: fit_epoch() saw 0 batches — dataset smaller "
                  "than the batch size? lower -bs or pass drop_last=False",
                  flush=True)
        means = self.metrics.result()
        means["steps_per_sec"] = n / max(time.perf_counter() - t0, 1e-9)
        return means

    def evaluate(self, loss_fn_eval, batches) -> Dict[str, float]:
        """Run a jitted eval pass (no grad) over batches.

        Partial final batches (``drop_last=False`` iterators) are padded by
        cycling items up to a multiple of the mesh's data axis so sharding
        never rejects them; the tiny duplicated-item bias only affects the
        logged means, never training. Warns loudly when the iterator yields
        nothing (e.g. a validation set smaller than a drop_last batch size)
        instead of silently printing an empty metrics line."""
        import numpy as np

        eval_step = None
        tracker = _MetricMean()
        n_batches = 0
        for batch in batches:
            self._ensure_mesh(batch)
            n_data = self.mesh.shape[DATA_AXIS]
            b = next(iter(jax.tree.leaves(batch))).shape[0]
            if b % n_data:
                idx = np.resize(np.arange(b), ((b + n_data - 1) // n_data) * n_data)
                batch = jax.tree.map(lambda x: np.asarray(x)[idx], batch)
            if eval_step is None:
                eval_step = jax.jit(
                    lambda params, batch: loss_fn_eval(
                        params, batch, jax.random.PRNGKey(0))[1],
                    in_shardings=(replicated(self.mesh),
                                  data_sharding(self.mesh)),
                )
            tracker.update(eval_step(self.state.params,
                                     shard_batch(batch, self.mesh)))
            n_batches += 1
        if n_batches == 0:
            print("WARNING: evaluate() saw 0 batches — validation set "
                  "smaller than the batch size? pass drop_last=False",
                  flush=True)
        return tracker.result()

    def save(self, force: bool = True):
        if self.checkpointer is not None:
            self.checkpointer.save(self.step, self.state, force=force)
            self.checkpointer.wait()

    def _write_tb(self, step: int, metrics: Dict[str, float]):
        if self._writer is None:
            return
        import tensorflow as tf

        with self._writer.as_default():
            for k, v in metrics.items():
                tf.summary.scalar(k, v, step=step)


def build_state(params, opt_config: OptimizerConfig) -> TrainState:
    return TrainState.create(params, make_optimizer(opt_config))
