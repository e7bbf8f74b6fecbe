"""Tensor parallelism on the ``model`` mesh axis.

Round 1 reserved the axis but sharded nothing onto it (the reference has no
TP at all — SURVEY §2.4). These tests put real Megatron-style layouts on the
FFT-transformer params (``parallel/tp.py``) and assert the sharded program
is numerically equivalent to the replicated one — shardings must never
change semantics, only placement — and that the params really are
distributed across the ``model`` axis.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuraltexttospeech_tpu.models.fastpitch import FastPitch, FastPitchConfig
from neuraltexttospeech_tpu.models.fastpitch_loss import fastpitch_loss
from neuraltexttospeech_tpu.parallel.mesh import (
    MODEL_AXIS, make_mesh, replicated, shard_batch,
)
from neuraltexttospeech_tpu.parallel.tp import (
    FFT_TRANSFORMER_TP_RULES, shard_params_tp, tp_param_specs,
)

CFG = FastPitchConfig(
    n_symbols=40, symbols_embedding_dim=32, in_fft_n_layers=1,
    in_fft_n_heads=2, in_fft_d_head=8, in_fft_conv1d_filter_size=64,
    out_fft_n_layers=1, out_fft_n_heads=2, out_fft_d_head=8,
    out_fft_conv1d_filter_size=64, dur_predictor_filter_size=16,
    pitch_predictor_filter_size=16, energy_predictor_filter_size=16,
)


def _batch(rng, B=4, Tt=8, Tm=16):
    return {
        "text": jnp.asarray(rng.integers(1, 40, (B, Tt)), jnp.int32),
        "input_lens": jnp.asarray([Tt] * B, jnp.int32),
        "mel": jnp.asarray(rng.standard_normal((B, Tm, 80)), jnp.float32),
        "mel_lens": jnp.asarray([Tm] * B, jnp.int32),
        "pitch": jnp.asarray(rng.standard_normal((B, 1, Tm)), jnp.float32),
        "energy": jnp.abs(jnp.asarray(rng.standard_normal((B, Tm)),
                                      jnp.float32)),
        "prior": jnp.asarray(np.abs(rng.standard_normal((B, Tm, Tt))) + 0.1,
                             jnp.float32),
    }


def _loss(model, params, batch):
    out = model.apply(params, batch["text"], batch["input_lens"],
                      batch["mel"], batch["mel_lens"], batch["pitch"],
                      batch["energy"], None, batch["prior"],
                      deterministic=False,
                      rngs={"dropout": jax.random.PRNGKey(1)})
    loss, _ = fastpitch_loss(out, batch["mel"], batch["input_lens"],
                             batch["mel_lens"])
    return loss


def test_tp_specs_cover_transformer_blocks():
    model = FastPitch(CFG)
    b = _batch(np.random.default_rng(0))
    params = model.init(jax.random.PRNGKey(0), b["text"], b["input_lens"],
                        b["mel"], b["mel_lens"], b["pitch"], b["energy"],
                        None, b["prior"])
    specs = tp_param_specs(params, FFT_TRANSFORMER_TP_RULES)
    flat = jax.tree.leaves(specs, is_leaf=lambda x: not isinstance(x, dict))
    sharded = [s for s in flat if s != jax.sharding.PartitionSpec()]
    # encoder + decoder, 1 layer each, 6 rules → 12 sharded leaves
    assert len(sharded) == 12, sharded


@pytest.mark.slow
def test_dp_step_matches_single_device():
    """Data parallelism must not change semantics: loss and grads of the
    batch-sharded step equal the single-device step up to reduction order
    (the data-axis mirror of the TP equivalence test below)."""
    assert jax.device_count() == 8
    model = FastPitch(CFG)
    b = _batch(np.random.default_rng(2))
    params = model.init(jax.random.PRNGKey(0), b["text"], b["input_lens"],
                        b["mel"], b["mel_lens"], b["pitch"], b["energy"],
                        None, b["prior"])

    grad_fn = jax.value_and_grad(lambda p, batch: _loss(model, p, batch))

    # single-device baseline: everything on one device, no mesh
    dev = jax.devices()[0]
    loss_ref, grads_ref = jax.jit(grad_fn)(
        jax.device_put(params, dev), jax.device_put(b, dev))

    # dp=4: batch sharded on data, params replicated — XLA inserts the
    # gradient all-reduce
    mesh = make_mesh(n_data=4)
    loss_dp, grads_dp = jax.jit(grad_fn)(
        jax.device_put(params, replicated(mesh)), shard_batch(b, mesh))
    batch_leaf = shard_batch(b, mesh)["mel"]
    assert len({s.device for s in batch_leaf.addressable_shards}) == 4

    np.testing.assert_allclose(float(loss_dp), float(loss_ref),
                               rtol=2e-5, atol=2e-5)
    for g_dp, g_ref in zip(jax.tree.leaves(grads_dp),
                           jax.tree.leaves(grads_ref)):
        np.testing.assert_allclose(np.asarray(g_dp), np.asarray(g_ref),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_tp_step_matches_replicated():
    assert jax.device_count() == 8
    model = FastPitch(CFG)
    b = _batch(np.random.default_rng(1))
    params = model.init(jax.random.PRNGKey(0), b["text"], b["input_lens"],
                        b["mel"], b["mel_lens"], b["pitch"], b["energy"],
                        None, b["prior"])

    grad_fn = jax.value_and_grad(lambda p, batch: _loss(model, p, batch))

    # replicated baseline on a 2-device DP mesh
    mesh_dp = make_mesh(n_data=2)
    loss_ref, grads_ref = jax.jit(grad_fn)(
        jax.device_put(params, replicated(mesh_dp)), shard_batch(b, mesh_dp))

    # dp=2 × tp=2 mesh: batch on data, transformer params on model
    mesh = make_mesh(n_data=2, n_model=2)
    params_tp = shard_params_tp(params, mesh)
    qkv = params_tp["params"]["encoder"]["blocks_0"]["MultiHeadAttn_0"][
        "Dense_0"]["kernel"]
    assert qkv.sharding.spec == jax.sharding.PartitionSpec(None, MODEL_AXIS)
    # the leaf is physically split: each shard holds half the columns
    shard_shapes = {s.data.shape for s in qkv.addressable_shards}
    assert shard_shapes == {(32, 24)}, shard_shapes

    loss_tp, grads_tp = jax.jit(grad_fn)(params_tp, shard_batch(b, mesh))
    np.testing.assert_allclose(float(loss_tp), float(loss_ref),
                               rtol=2e-5, atol=2e-5)
    for g_tp, g_ref in zip(jax.tree.leaves(grads_tp),
                           jax.tree.leaves(grads_ref)):
        np.testing.assert_allclose(np.asarray(g_tp), np.asarray(g_ref),
                                   rtol=2e-4, atol=2e-4)
