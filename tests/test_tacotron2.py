"""Tacotron 2: scan decoder shapes, gate stop, masked loss, train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuraltexttospeech_tpu.models.tacotron2 import (
    Tacotron2, Tacotron2Config, tacotron2_loss,
)
from neuraltexttospeech_tpu.models.tacotron2_train import (
    gate_targets, init_tacotron2, tacotron2_train_step,
)

TINY = Tacotron2Config(
    n_symbols=40, symbols_embedding_dim=32, encoder_embedding_dim=32,
    decoder_rnn_dim=48, attention_rnn_dim=48, attention_dim=16,
    attention_location_n_filters=4, attention_location_kernel_size=7,
    prenet_dim=16, postnet_embedding_dim=24, postnet_n_convolutions=3,
    max_decoder_steps=24,
)
B, TT, TM = 2, 9, 20


def _batch(rng):
    return {
        "text": jnp.asarray(rng.integers(1, 40, (B, TT)), jnp.int32),
        "input_lens": jnp.asarray([TT, 6], jnp.int32),
        "mel": jnp.asarray(rng.standard_normal((B, TM, 80)), jnp.float32),
        "mel_lens": jnp.asarray([TM, 14], jnp.int32),
    }


@pytest.fixture(scope="module")
def state():
    return init_tacotron2(TINY, jax.random.PRNGKey(0))


def test_teacher_forced_shapes_and_masking(state):
    model = Tacotron2(TINY)
    b = _batch(np.random.default_rng(0))
    out, _ = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        b["text"], b["input_lens"], b["mel"], b["mel_lens"], train=True,
        rngs={"dropout": jax.random.PRNGKey(1)}, mutable=["batch_stats"])
    assert out.mel_out.shape == (B, TM, 80)
    assert out.alignments.shape == (B, TM, TT)
    # attention over padded text positions must be zero
    assert float(jnp.abs(out.alignments[1, :, 6:]).max()) == 0.0
    # masked mel frames beyond mel_lens are zeroed (mask_padding=True)
    assert float(jnp.abs(out.mel_out[1, 14:]).max()) == 0.0
    # padded gate positions forced to "stopped"
    assert float(out.gate_out[1, 14:].min()) > 100.0


def test_train_step_decreases_loss(state):
    b = _batch(np.random.default_rng(1))
    rng = jax.random.PRNGKey(42)
    # the step donates its input state; copy so the fixture stays valid
    s = jax.tree.map(jnp.array, state)
    losses = []
    for _ in range(5):
        s, meta = tacotron2_train_step(TINY, s, b, rng)
        losses.append(float(meta["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]
    assert int(s.step) == 5


def test_inference_emits_lengths(state):
    model = Tacotron2(TINY)
    b = _batch(np.random.default_rng(2))
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        b["text"], b["input_lens"], method=Tacotron2.infer,
        rngs={"dropout": jax.random.PRNGKey(3)})
    assert out.mel_out_postnet.shape == (B, TINY.max_decoder_steps, 80)
    assert out.mel_lengths.shape == (B,)
    assert (np.asarray(out.mel_lengths) <= TINY.max_decoder_steps).all()
    assert bool(jnp.isfinite(out.mel_out_postnet).all())


def test_inference_early_stop_while_loop(state):
    """while_loop decode matches the scan decode's static output contract."""
    model = Tacotron2(TINY)
    b = _batch(np.random.default_rng(5))
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        b["text"], b["input_lens"], early_stop=True,
        method=Tacotron2.infer, rngs={"dropout": jax.random.PRNGKey(6)})
    assert out.mel_out_postnet.shape == (B, TINY.max_decoder_steps, 80)
    assert bool(jnp.isfinite(out.mel_out_postnet).all())
    assert (np.asarray(out.mel_lengths) <= TINY.max_decoder_steps).all()


def test_gate_targets():
    g = gate_targets(jnp.asarray([3, 5]), 6)
    np.testing.assert_array_equal(
        np.asarray(g), [[0, 0, 1, 1, 1, 1], [0, 0, 0, 0, 1, 1]])
