"""FastPitch model + loss: shapes, masking invariants, gradient flow.

Upgrades the reference's shape-trace methodology (SURVEY §4.2) into asserted
tests on a small config.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuraltexttospeech_tpu.models.fastpitch import (
    FastPitch, FastPitchConfig, average_pitch, regulate_len,
)
from neuraltexttospeech_tpu.models.fastpitch_loss import (
    FastPitchLossConfig, fastpitch_loss,
)

SMALL = FastPitchConfig(
    n_symbols=40, symbols_embedding_dim=64,
    in_fft_n_layers=2, in_fft_d_head=16, in_fft_n_heads=2,
    in_fft_conv1d_filter_size=128,
    out_fft_n_layers=2, out_fft_d_head=16, out_fft_n_heads=2,
    out_fft_conv1d_filter_size=128,
    dur_predictor_filter_size=32, pitch_predictor_filter_size=32,
    energy_predictor_filter_size=32,
)

B, T_TEXT, T_MEL = 2, 13, 40


def _batch(rng):
    text = rng.integers(1, 40, size=(B, T_TEXT)).astype(np.int32)
    input_lens = np.array([T_TEXT, 9], np.int32)
    text[1, 9:] = 0
    mel = rng.standard_normal((B, T_MEL, 80)).astype(np.float32)
    mel_lens = np.array([T_MEL, 30], np.int32)
    pitch = rng.standard_normal((B, 1, T_MEL)).astype(np.float32)
    energy = np.abs(rng.standard_normal((B, T_MEL))).astype(np.float32)
    prior = np.abs(rng.standard_normal((B, T_MEL, T_TEXT))).astype(np.float32) + 0.1
    return (jnp.asarray(text), jnp.asarray(input_lens), jnp.asarray(mel),
            jnp.asarray(mel_lens), jnp.asarray(pitch), jnp.asarray(energy),
            jnp.asarray(prior))


@pytest.fixture(scope="module")
def model_and_params():
    model = FastPitch(SMALL)
    text, input_lens, mel, mel_lens, pitch, energy, prior = _batch(
        np.random.default_rng(0))
    params = model.init(
        jax.random.PRNGKey(0), text, input_lens, mel, mel_lens, pitch,
        energy, None, prior)
    return model, params


def test_forward_shapes(model_and_params):
    model, params = model_and_params
    text, input_lens, mel, mel_lens, pitch, energy, prior = _batch(
        np.random.default_rng(1))
    out = model.apply(params, text, input_lens, mel, mel_lens, pitch,
                      energy, None, prior)
    assert out.mel_out.shape == (B, T_MEL, 80)
    assert out.dur_pred.shape == (B, T_TEXT)
    assert out.pitch_pred.shape == (B, 1, T_TEXT)
    assert out.attn_soft.shape == (B, T_MEL, T_TEXT)
    assert out.energy_pred.shape == (B, T_TEXT)
    # Durations from MAS must sum to mel lengths (reference model.py:317).
    np.testing.assert_array_equal(
        np.asarray(jnp.sum(out.attn_hard_dur, axis=1), np.int32),
        np.asarray(mel_lens))


def test_loss_finite_and_grads(model_and_params):
    model, params = model_and_params
    text, input_lens, mel, mel_lens, pitch, energy, prior = _batch(
        np.random.default_rng(2))

    def loss_fn(p):
        out = model.apply(
            p, text, input_lens, mel, mel_lens, pitch, energy, None, prior,
            deterministic=False, rngs={"dropout": jax.random.PRNGKey(3)})
        loss, meta = fastpitch_loss(out, mel, input_lens, mel_lens,
                                    FastPitchLossConfig())
        return loss, meta

    (loss, meta), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    for k, v in meta.items():
        assert np.isfinite(float(v)), k
    leaf_norms = [float(jnp.abs(g).max()) for g in jax.tree.leaves(grads)]
    assert all(np.isfinite(n) for n in leaf_norms)
    assert max(leaf_norms) > 0.0


def test_infer_runs(model_and_params):
    model, params = model_and_params
    text, input_lens, *_ = _batch(np.random.default_rng(4))
    mel_out, dec_lens, dur_pred, pitch_pred = model.apply(
        params, text, input_lens, max_mel_len=64, method=FastPitch.infer)
    assert mel_out.shape == (B, 64, 80)
    assert (np.asarray(dec_lens) <= 64).all()
    assert np.isfinite(np.asarray(mel_out)).all()


def test_multispeaker_conditioning():
    """n_speakers > 1 enables the speaker embedding path
    (reference ``model.py:157-163,272-278``)."""
    import dataclasses

    cfg = dataclasses.replace(SMALL, n_speakers=4, speaker_emb_weight=0.5)
    model = FastPitch(cfg)
    text, input_lens, mel, mel_lens, pitch, energy, prior = _batch(
        np.random.default_rng(7))
    speaker = jnp.asarray([0, 3], jnp.int32)
    params = model.init(jax.random.PRNGKey(5), text, input_lens, mel,
                        mel_lens, pitch, energy, speaker, prior)
    assert "speaker_emb" in params["params"]
    out = model.apply(params, text, input_lens, mel, mel_lens, pitch,
                      energy, speaker, prior)
    out_other = model.apply(params, text, input_lens, mel, mel_lens, pitch,
                            energy, jnp.asarray([1, 2], jnp.int32), prior)
    # different speakers change the output
    assert float(jnp.abs(out.mel_out - out_other.mel_out).max()) > 1e-4


def test_regulate_len_expansion():
    durs = jnp.array([[2, 3, 1], [1, 1, 0]], jnp.float32)
    enc = jnp.arange(2 * 3 * 4, dtype=jnp.float32).reshape(2, 3, 4)
    out, lens = regulate_len(durs, enc, mel_max_len=8)
    assert out.shape == (2, 8, 4)
    np.testing.assert_array_equal(np.asarray(lens), [6, 2])
    np.testing.assert_allclose(np.asarray(out[0, :2]), np.asarray(enc[0, :1].repeat(2, 0)))
    np.testing.assert_allclose(np.asarray(out[0, 2:5]), np.asarray(enc[0, 1:2].repeat(3, 0)))
    assert np.asarray(out[1, 2:]).sum() == 0  # padding rows are zero


def test_average_pitch_excludes_zeros():
    pitch = jnp.array([[[1.0, 0.0, 3.0, 5.0]]])  # [1, 1, 4]
    durs = jnp.array([[2, 2]], jnp.float32)
    avg = average_pitch(pitch, durs)
    np.testing.assert_allclose(np.asarray(avg[0, 0]), [1.0, 4.0])
