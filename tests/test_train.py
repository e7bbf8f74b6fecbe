"""Shared training harness: pjit DP step on the 8-device CPU mesh,
checkpoint/resume round trip, optimizer construction."""

import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from neuraltexttospeech_tpu.parallel.mesh import make_mesh
from neuraltexttospeech_tpu.train.harness import Trainer, TrainerConfig
from neuraltexttospeech_tpu.train.state import (
    OptimizerConfig, TrainState, make_optimizer,
)


class _Toy(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.Dense(1)(nn.relu(nn.Dense(16)(x)))


def _toy_setup():
    model = _Toy()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))

    def loss_fn(p, batch, rng):
        pred = model.apply(p, batch["x"])
        loss = jnp.mean(jnp.square(pred - batch["y"]))
        return loss, {"mse": loss}

    return params, loss_fn


def _toy_batch(rng, n=16):
    x = rng.standard_normal((n, 4)).astype(np.float32)
    y = (x.sum(axis=1, keepdims=True) * 0.5).astype(np.float32)
    return {"x": x, "y": y}


def test_dp_mesh_step_runs_and_learns():
    assert jax.device_count() == 8  # conftest virtual mesh
    mesh = make_mesh()
    assert mesh.devices.shape == (8, 1)
    params, loss_fn = _toy_setup()
    state = TrainState.create(params, make_optimizer(OptimizerConfig(
        learning_rate=1e-2)))
    trainer = Trainer(loss_fn, state, TrainerConfig(log_every=10**9), mesh)
    rng = np.random.default_rng(0)
    losses = [float(trainer.train_step(_toy_batch(rng))["mse"])
              for _ in range(20)]
    assert losses[-1] < losses[0] * 0.7
    assert trainer.step == 20


def test_checkpoint_resume_roundtrip(tmp_path):
    params, loss_fn = _toy_setup()
    opt = make_optimizer(OptimizerConfig(learning_rate=1e-2))
    state = TrainState.create(params, opt)
    ckpt_dir = os.path.join(str(tmp_path), "ckpt")
    cfg = TrainerConfig(log_every=10**9, checkpoint_dir=ckpt_dir,
                        checkpoint_every=1)
    trainer = Trainer(loss_fn, state, cfg)
    rng = np.random.default_rng(1)
    for _ in range(3):
        trainer.train_step(_toy_batch(rng))
    trainer.save()
    trained_params = jax.tree.map(np.asarray, trainer.state.params)

    # Fresh trainer resumes from the saved step with identical params.
    state2 = TrainState.create(_toy_setup()[0], opt)
    trainer2 = Trainer(loss_fn, state2, cfg)
    assert trainer2.resume() == 3
    restored = jax.tree.map(np.asarray, trainer2.state.params)
    jax.tree.map(np.testing.assert_array_equal, trained_params, restored)
    trainer.checkpointer.close()
    trainer2.checkpointer.close()


def test_optimizer_variants():
    for name in ("adam", "adamw", "lamb"):
        tx = make_optimizer(OptimizerConfig(optimizer=name))
        params = {"w": jnp.ones((3,))}
        st = tx.init(params)
        updates, _ = tx.update({"w": jnp.ones((3,))}, st, params)
        assert np.isfinite(np.asarray(updates["w"])).all()
    # grad accumulation wrapper
    tx = make_optimizer(OptimizerConfig(grad_accum_steps=4))
    st = tx.init({"w": jnp.ones((3,))})
    assert st is not None


def test_noam_schedule_shape():
    from neuraltexttospeech_tpu.train.state import _schedule
    sched = _schedule(OptimizerConfig(schedule="noam", learning_rate=1e-3,
                                      warmup_steps=100))
    lrs = [float(sched(s)) for s in [1, 50, 100, 1000]]
    assert lrs[1] > lrs[0]          # warming up
    assert lrs[3] < lrs[2]          # decaying
