"""Can-it-learn checks beyond FastPitch (VERDICT round-1 item 7).

Synthetic-corpus overfit runs for the families whose round-1 coverage only
asserted "loss decreases over 4 steps":

- Tacotron 2: after overfitting a 2-utterance corpus, free-running
  inference must *stop via the gate* before ``max_decoder_steps`` — the
  behavior the reference's inference branch relies on
  (``Tacotron2_TF/model.py:587-603``) but never validated.
- Grad-TTS: the composite (duration + prior + diffusion) loss, evaluated
  with a fixed RNG so the diffusion-time sampling is deterministic, halves.
- HiFi-GAN: the mel-L1 lane of the GAN step (the ×45-weighted term from
  ``HiFiGAN_TF/gan.py:85-89``) halves on a consistent mel↔audio pair —
  i.e. the generator actually vocodes, not merely "losses decrease".
- DiffWave: fixed-RNG eval of the noise-prediction L1 drops well below the
  zero-predictor floor E|ε| ≈ 0.8 (the out-projection is zero-init, so the
  initial loss IS that floor; any drop means real denoising was learned).

The reference's only quality assurance was smoke training (SURVEY §4.4);
these tests check the optimization actually converges model-by-model.
All use tiny configs on the CPU mesh; each is marked slow.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest


pytestmark = pytest.mark.slow

def _smooth_mel(rng, b, t, c, amp=0.5):
    """Smooth per-channel sinusoid targets — reproducible by an AR decoder
    running on its own outputs (random noise is not)."""
    phase = rng.uniform(0, 2 * np.pi, (b, 1, c))
    period = rng.uniform(4.0, 16.0, (1, 1, c))
    tt = np.arange(t)[None, :, None]
    return jnp.asarray(amp * np.sin(2 * np.pi * tt / period + phase),
                       jnp.float32)


@pytest.mark.slow
def test_tacotron2_overfit_gate_fires_at_inference():
    from neuraltexttospeech_tpu.models.tacotron2 import (
        Tacotron2, Tacotron2Config,
    )
    from neuraltexttospeech_tpu.models.tacotron2_train import (
        init_tacotron2, tacotron2_train_step,
    )

    cfg = Tacotron2Config(
        n_symbols=40, symbols_embedding_dim=32, encoder_embedding_dim=32,
        decoder_rnn_dim=48, attention_rnn_dim=48, attention_dim=16,
        attention_location_n_filters=4, attention_location_kernel_size=7,
        prenet_dim=16, postnet_embedding_dim=24, postnet_n_convolutions=3,
        max_decoder_steps=40)
    rng = np.random.default_rng(0)
    B, TT, TM = 2, 9, 20
    batch = {
        "text": jnp.asarray(rng.integers(1, 40, (B, TT)), jnp.int32),
        "input_lens": jnp.asarray([TT, 6], jnp.int32),
        "mel": _smooth_mel(rng, B, TM, cfg.n_mel_channels),
        "mel_lens": jnp.asarray([TM, 14], jnp.int32),
    }
    state = init_tacotron2(cfg, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(7)
    # measured trajectory: loss 2.61 → 0.31 by step 450; free-running gate
    # first fires between steps 200 and 400 (lens 40,40 → 22,20)
    first = last = None
    for _ in range(450):
        state, meta = tacotron2_train_step(cfg, state, batch, key)
        last = float(meta["loss"])
        if first is None:
            first = last
    assert np.isfinite(last) and last < 0.25 * first, (first, last)

    model = Tacotron2(cfg)
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["text"], batch["input_lens"], method=Tacotron2.infer,
        rngs={"dropout": jax.random.PRNGKey(3)})
    lens = np.asarray(out.mel_lengths)
    # the gate must fire for every utterance before the step cap
    assert (lens < cfg.max_decoder_steps).all(), lens
    assert (lens >= 5).all(), lens


@pytest.mark.slow
def test_gradtts_overfit_composite_loss_halves():
    from neuraltexttospeech_tpu.models.gradtts import GradTTS, GradTTSConfig

    cfg = GradTTSConfig(
        n_symbols=40, n_enc_channels=32, filter_channels=64,
        filter_channels_dp=32, n_enc_layers=2, dec_dim=8, out_size=16)
    rng = np.random.default_rng(1)
    B, TT, TM = 2, 11, 32
    x = jnp.asarray(rng.integers(1, 40, (B, TT)), jnp.int32)
    xl = jnp.asarray([TT, 7], jnp.int32)
    y = _smooth_mel(rng, B, TM, 80, amp=1.0)
    yl = jnp.asarray([TM, 24], jnp.int32)

    model = GradTTS(cfg)
    params = jax.jit(lambda k: model.init(
        {"params": k, "dropout": jax.random.fold_in(k, 1)}, x, xl, y, yl,
        jax.random.fold_in(k, 2), out_size=cfg.out_size,
        method=GradTTS.compute_loss))(jax.random.PRNGKey(0))
    tx = optax.adam(2e-3)
    opt_state = tx.init(params)

    def composite(p, key, drop_key):
        d, pr, df = model.apply(
            p, x, xl, y, yl, key, out_size=cfg.out_size,
            method=GradTTS.compute_loss, rngs={"dropout": drop_key})
        return d + pr + df

    @jax.jit
    def train_step(p, o, key):
        loss, grads = jax.value_and_grad(composite)(
            p, key, jax.random.fold_in(key, 1))
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    eval_loss = jax.jit(functools.partial(
        composite, key=jax.random.PRNGKey(99),
        drop_key=jax.random.PRNGKey(98)))
    before = float(eval_loss(params))
    key = jax.random.PRNGKey(11)
    # ~300 steps clears 0.5× with margin (the prior term carries an
    # irreducible 0.5·log(2π) ≈ 0.92 Gaussian-NLL constant, so the
    # composite cannot go to zero; measured floor ≈ 1.5 ≈ 0.37× init)
    for i in range(300):
        params, opt_state, loss = train_step(params, opt_state,
                                             jax.random.fold_in(key, i))
        assert np.isfinite(float(loss))
    after = float(eval_loss(params))
    assert after < 0.5 * before, (before, after)


@pytest.mark.slow
def test_hifigan_overfit_mel_l1_halves():
    from neuraltexttospeech_tpu.models.hifigan import HiFiGANConfig
    from neuraltexttospeech_tpu.models.hifigan_gan import (
        hifigan_train_step, init_hifigan, loss_stft_config, mel_for_loss,
    )

    cfg = HiFiGANConfig(
        resblock="2", upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=32, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),), n_fft=64, hop_size=16, win_size=64,
        segment_size=256, num_mels=8, learning_rate=2e-3)
    # learnable target: a chord of sines (periodic, within tanh range)
    t = np.arange(256) / 22050.0
    rng = np.random.default_rng(2)
    audio = np.zeros((2, 256), np.float32)
    for b in range(2):
        for f in rng.uniform(200, 2000, 3):
            audio[b] += 0.2 * np.sin(2 * np.pi * f * t)
    audio = jnp.asarray(audio)
    stft_cfg = loss_stft_config(cfg)
    mel = mel_for_loss(audio, stft_cfg)
    batch = {"mel": mel, "audio": audio[..., None], "mel_loss": mel}

    state = init_hifigan(cfg, jax.random.PRNGKey(0))
    # measured at lr 2e-3: mel_l1 74.4 → 30.2 (0.41×) by step 80
    first = last = None
    for _ in range(80):
        state, metrics = hifigan_train_step(cfg, state, batch)
        last = float(metrics["mel_l1_x45"])
        if first is None:
            first = last
        assert np.isfinite(last)
    assert last < 0.5 * first, (first, last)


@pytest.mark.slow
def test_diffwave_overfit_beats_zero_predictor_floor():
    from neuraltexttospeech_tpu.models.diffwave import (
        DiffWave, DiffWaveConfig, diffwave_loss,
    )

    cfg = DiffWaveConfig(residual_layers=4, residual_channels=16,
                         dilation_cycle_length=4, crop_mel_frames=4,
                         n_mels=8, hop_length=16)
    T = cfg.crop_mel_frames * cfg.hop_length
    t = np.arange(T) / 22050.0
    audio = jnp.asarray(
        0.5 * np.sin(2 * np.pi * 440.0 * t)[None, :].repeat(2, 0), jnp.float32)
    rng = np.random.default_rng(3)
    mel = jnp.asarray(rng.standard_normal((2, cfg.crop_mel_frames, cfg.n_mels)),
                      jnp.float32)
    batch = {"audio": audio, "mel": mel}

    model = DiffWave(cfg)
    params = jax.jit(lambda k: model.init(
        k, audio, jnp.zeros((2,), jnp.int32), mel))(jax.random.PRNGKey(0))
    tx = optax.adam(2e-3)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(p, o, key):
        (loss, _), grads = jax.value_and_grad(
            lambda q: diffwave_loss(model, q, batch, key), has_aux=True)(p)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    eval_loss = jax.jit(lambda p: diffwave_loss(
        model, p, batch, jax.random.PRNGKey(123))[0])
    before = float(eval_loss(params))
    # zero-init output projection ⇒ the initial loss is the zero-predictor
    # floor E|ε| = sqrt(2/pi) ≈ 0.798
    assert abs(before - np.sqrt(2 / np.pi)) < 0.08, before
    key = jax.random.PRNGKey(5)
    for i in range(200):
        params, opt_state, loss = train_step(params, opt_state,
                                             jax.random.fold_in(key, i))
        assert np.isfinite(float(loss))
    after = float(eval_loss(params))
    assert after < 0.6 * before, (before, after)
