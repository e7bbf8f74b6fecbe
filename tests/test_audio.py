"""Audio DSP parity tests against the TF2 reference semantics.

Follows the reference's own methodology (SURVEY.md §4.1): compare our
pipeline numerically against the oracle — here tf.signal itself, which is
what ``FastPitch_TF/common/audio_processing_tf.py`` is built on — on random
signals and on the repo's real wav fixture.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuraltexttospeech_tpu.audio import (
    STFT,
    STFTConfig,
    dynamic_range_compression,
    hann_window,
    linear_to_mel_weight_matrix,
    mel_spectrogram,
    num_frames,
    stft_magnitude,
)

tf = pytest.importorskip("tensorflow")

FIXTURE_WAV = "/root/reference/AudioProcessing/LJ001-0001.wav"


def _tf_reference_mel(x, power=0.5, filter_length=1024, frame_length=1024,
                      frame_step=256, n_mel=80, sr=22050, fmin=0.0, fmax=8000.0):
    """The reference pipeline, re-run on real tf.signal as oracle."""
    spec = tf.signal.stft(
        tf.constant(x, dtype=tf.float32),
        frame_length=frame_length,
        frame_step=frame_step,
        fft_length=filter_length,
    )
    mag = tf.math.abs(spec)
    fb = tf.signal.linear_to_mel_weight_matrix(
        num_mel_bins=n_mel,
        num_spectrogram_bins=filter_length // 2 + 1,
        sample_rate=sr,
        lower_edge_hertz=fmin,
        upper_edge_hertz=fmax,
    )
    mel = tf.linalg.matmul(tf.math.pow(mag, power), fb)
    return tf.math.log(
        tf.clip_by_value(mel, 1e-5, tf.float32.max)
    ).numpy()


def test_mel_filterbank_matches_tf_signal():
    ours = linear_to_mel_weight_matrix(80, 513, 22050.0, 0.0, 8000.0)
    theirs = tf.signal.linear_to_mel_weight_matrix(
        num_mel_bins=80,
        num_spectrogram_bins=513,
        sample_rate=22050,
        lower_edge_hertz=0.0,
        upper_edge_hertz=8000.0,
    ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=5e-5)


def test_hann_window_matches_tf_signal():
    ours = hann_window(1024)
    theirs = tf.signal.hann_window(1024).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_stft_magnitude_matches_tf_signal():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(22050).astype(np.float32) * 0.1
    ours = np.asarray(stft_magnitude(jnp.asarray(x)))
    theirs = np.abs(
        tf.signal.stft(tf.constant(x), 1024, 256, 1024).numpy()
    )
    assert ours.shape == theirs.shape == (num_frames(22050, 1024, 256), 513)
    np.testing.assert_allclose(ours, theirs, atol=2e-3, rtol=1e-4)


@pytest.mark.parametrize("power", [0.5, 2.0])
def test_mel_spectrogram_matches_reference_pipeline(power):
    rng = np.random.default_rng(1)
    x = rng.standard_normal(3 * 22050).astype(np.float32) * 0.2
    cfg = STFTConfig(magnitude_power=power)
    ours = np.asarray(mel_spectrogram(jnp.asarray(x), cfg))
    theirs = _tf_reference_mel(x, power=power)
    np.testing.assert_allclose(ours, theirs, atol=1e-3, rtol=1e-4)


def test_pallas_fused_mel_matches_plain_path():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(22050).astype(np.float32) * 0.2
    cfg = STFTConfig()
    plain = np.asarray(mel_spectrogram(jnp.asarray(x), cfg))
    fused = np.asarray(mel_spectrogram(jnp.asarray(x), cfg, use_pallas=True))
    assert plain.shape == fused.shape
    np.testing.assert_allclose(plain, fused, atol=1e-3, rtol=1e-4)


@pytest.mark.parametrize("power", [0.5, 2.0])
def test_fused_mel_vjp_matches_xla_autodiff(power):
    """The fused kernel's analytic custom_vjp (ops/mel_kernel.py) must agree
    with XLA autodiff through the rFFT path — gradient paths (HiFi-GAN mel
    loss, reference ``HiFiGAN_TF/gan.py:47-52``) ride the fused pipeline."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal(22050).astype(np.float32) * 0.2)
    cfg = STFTConfig(magnitude_power=power)

    def loss(fn_pallas):
        return lambda s: jnp.sum(
            jnp.cos(mel_spectrogram(s, cfg, use_pallas=fn_pallas)))

    g_fused = np.asarray(jax.grad(loss(True))(x))
    g_xla = np.asarray(jax.grad(loss(False))(x))
    assert np.isfinite(g_fused).all()
    scale = np.abs(g_xla).max()
    np.testing.assert_allclose(g_fused / scale, g_xla / scale, atol=1e-4)


def test_stft_class_api_batched():
    stft = STFT()
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 22050)).astype(np.float32)
    mel = stft.mel_spectrogram(x)
    assert mel.shape == (2, num_frames(22050, 1024, 256), 80)
    single = stft.mel_spectrogram(x[0])
    np.testing.assert_allclose(np.asarray(mel[0]), np.asarray(single), atol=1e-5)
    # [1, T] squeeze path mirrors the reference's shape handling.
    squeezed = stft.mel_spectrogram(x[:1])
    np.testing.assert_allclose(np.asarray(squeezed), np.asarray(single), atol=1e-5)


def test_dynamic_range_compression():
    x = jnp.asarray([0.0, 1e-6, 1.0, 10.0])
    out = np.asarray(dynamic_range_compression(x))
    np.testing.assert_allclose(
        out, np.log(np.clip(np.asarray(x), 1e-5, None)), atol=1e-4
    )


@pytest.mark.skipif(not os.path.exists(FIXTURE_WAV), reason="fixture wav missing")
def test_real_wav_parity():
    from scipy.io import wavfile

    sr, data = wavfile.read(FIXTURE_WAV)
    assert sr == 22050
    x = data.astype(np.float32) / 32768.0
    ours = np.asarray(mel_spectrogram(jnp.asarray(x)))
    theirs = _tf_reference_mel(x)
    np.testing.assert_allclose(ours, theirs, atol=1e-3, rtol=1e-3)
