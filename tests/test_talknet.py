"""TalkNet/QuartzNet: backbone shapes, CTC, greedy decode, WER,
Gaussian embedding expansion, TTS heads."""

import jax
import jax.numpy as jnp
import numpy as np

from neuraltexttospeech_tpu.models.talknet import (
    GaussianEmbedding, GraphemeDuration, PitchPredictor, QuartzNet,
    QuartzNetConfig, SpectrogramModel, StringMap, TalkNet2Config, ctc_loss,
    greedy_decode, word_error_rate,
)

TINY_BB = QuartzNetConfig(
    block_repeat=1, module_repeat=2,
    block_params=((16, 5), (16, 7)),
    initial_filters=16, initial_kernel=5,
    penultimate_filters=16, penultimate_kernel=7, final_filters=32)
TINY = TalkNet2Config(n_symbols=30, emb_dim=16, n_mel_channels=8,
                      backbone=TINY_BB)


def test_quartznet_asr_shapes_and_ctc():
    vocab = StringMap()
    model = QuartzNet(len(vocab), TINY_BB)
    B, T = 2, 64
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, T, 8)),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    logp = model.apply(variables, x)
    assert logp.shape == (B, T // 2, len(vocab))
    # log-probs sum to 1
    np.testing.assert_allclose(
        np.asarray(jnp.exp(logp).sum(-1)), 1.0, atol=1e-4)

    labels = jnp.asarray([[5, 3, 7, 0], [2, 2, 0, 0]], jnp.int32)
    loss = ctc_loss(logp, jnp.asarray([32, 20]), labels, jnp.asarray([3, 2]))
    assert np.isfinite(float(loss))


def test_greedy_decode_collapses():
    lp = np.full((1, 6, 4), -10.0, np.float32)
    for t, k in enumerate([1, 1, 0, 2, 2, 3]):
        lp[0, t, k] = 0.0
    out = greedy_decode(jnp.asarray(lp), jnp.asarray([6]))
    assert out == [[1, 2, 3]]


def test_wer():
    assert word_error_rate(["the cat sat"], ["the cat sat"]) == 0.0
    assert word_error_rate(["the cat sat"], ["the bat sat"]) == 1 / 3


def test_string_map_roundtrip():
    sm = StringMap()
    ids = sm.encode("Hello world")
    assert sm.decode(ids) == "hello world"


def test_gaussian_embedding_expansion():
    ge = GaussianEmbedding(n_symbols=10, emb_dim=4)
    text = jnp.asarray([[1, 2, 3]], jnp.int32)
    durs = jnp.asarray([[2.0, 3.0, 1.0]])
    params = ge.init(jax.random.PRNGKey(0), text, durs, 8)
    out = ge.apply(params, text, durs, 8)
    assert out.shape == (1, 8, 4)
    assert bool(jnp.isfinite(out).all())


def test_tts_heads():
    rng = np.random.default_rng(1)
    text = jnp.asarray(rng.integers(1, 30, (2, 6)), jnp.int32)
    tlens = jnp.asarray([6, 4], jnp.int32)
    durs = jnp.asarray(np.full((2, 6), 4.0, np.float32))

    gd = GraphemeDuration(TINY)
    v = gd.init(jax.random.PRNGKey(0), text, tlens)
    d = gd.apply(v, text, tlens)
    assert d.shape == (2, 6)
    assert float(jnp.abs(d[1, 4:]).max()) == 0.0  # masked

    pp = PitchPredictor(TINY)
    v = pp.init(jax.random.PRNGKey(1), text, durs, 24)
    f0, voiced = pp.apply(v, text, durs, 24)
    assert f0.shape == (2, 24) and voiced.shape == (2, 24)

    sm = SpectrogramModel(TINY)
    v = sm.init(jax.random.PRNGKey(2), text, durs, f0, 24)
    mel = sm.apply(v, text, durs, f0, 24)
    assert mel.shape == (2, 24, TINY.n_mel_channels)
    assert bool(jnp.isfinite(mel).all())
