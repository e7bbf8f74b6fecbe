"""FastSpeech 2: forward shapes, teacher forcing vs prediction, loss,
TextGrid parsing + preprocessing alignment."""

import jax
import jax.numpy as jnp
import numpy as np

from neuraltexttospeech_tpu.data.textgrid import parse_textgrid
from neuraltexttospeech_tpu.models.fastspeech2 import (
    FastSpeech2, FastSpeech2Config, fastspeech2_loss,
)

TINY = FastSpeech2Config(
    n_symbols=40, encoder_layer=1, decoder_layer=1, encoder_hidden=32,
    decoder_hidden=32, conv_filter_size=64, variance_filter_size=16,
    n_bins=16, postnet_dim=24, postnet_layers=2)
B, TT, TM = 2, 8, 24


def _data(rng):
    text_np = rng.integers(1, 40, (B, TT)).astype(np.int32)
    text_np[1, 5:] = 0  # padding idx drives the encoder mask
    text = jnp.asarray(text_np)
    ilens = jnp.asarray([TT, 5], jnp.int32)
    dur = np.zeros((B, TT), np.float32)
    dur[0, :TT] = 3
    dur[1, :5] = [4, 4, 4, 4, 4]
    pitch = jnp.asarray(rng.standard_normal((B, TT)), jnp.float32)
    energy = jnp.asarray(rng.standard_normal((B, TT)), jnp.float32)
    mel = jnp.asarray(rng.standard_normal((B, TM, 80)), jnp.float32)
    olens = jnp.asarray([24, 20], jnp.int32)
    return text, ilens, jnp.asarray(dur), pitch, energy, mel, olens


def test_teacher_forced_and_loss():
    model = FastSpeech2(TINY)
    text, ilens, dur, pitch, energy, mel, olens = _data(
        np.random.default_rng(0))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        text, ilens, mel_max_len=TM, dur_tgt=dur, pitch_tgt=pitch,
        energy_tgt=energy)

    def lf(p):
        out = model.apply(p, text, ilens, mel_max_len=TM, dur_tgt=dur,
                          pitch_tgt=pitch, energy_tgt=energy,
                          deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(2)})
        return fastspeech2_loss(out, mel, dur, pitch, energy, ilens, olens)

    (loss, meta), grads = jax.value_and_grad(lf, has_aux=True)(params)
    assert np.isfinite(float(loss))
    gmax = max(float(jnp.abs(g).max()) for g in jax.tree.leaves(grads))
    assert np.isfinite(gmax) and gmax > 0

    out = model.apply(params, text, ilens, mel_max_len=TM, dur_tgt=dur,
                      pitch_tgt=pitch, energy_tgt=energy)
    assert out.mel_out.shape == (B, TM, 80)
    assert out.mel_postnet.shape == (B, TM, 80)
    np.testing.assert_array_equal(np.asarray(out.dec_lens), [24, 20])


def test_inference_predicts_variances():
    model = FastSpeech2(TINY)
    text, ilens, dur, pitch, energy, mel, _ = _data(np.random.default_rng(1))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        text, ilens, mel_max_len=TM, dur_tgt=dur, pitch_tgt=pitch,
        energy_tgt=energy)
    out = model.apply(params, text, ilens, mel_max_len=48)
    assert out.mel_out.shape == (B, 48, 80)
    assert bool(jnp.isfinite(out.mel_out).all())
    # masked predictor outputs are exactly zero on padding
    assert float(jnp.abs(out.log_dur_pred[1, 5:]).max()) == 0.0


TEXTGRID = """File type = "ooTextFile"
Object class = "TextGrid"

xmin = 0
xmax = 1.0
tiers? <exists>
size = 2
item []:
    item [1]:
        class = "IntervalTier"
        name = "words"
        xmin = 0
        xmax = 1.0
        intervals: size = 1
        intervals [1]:
            xmin = 0
            xmax = 1.0
            text = "hi"
    item [2]:
        class = "IntervalTier"
        name = "phones"
        xmin = 0
        xmax = 1.0
        intervals: size = 3
        intervals [1]:
            xmin = 0
            xmax = 0.25
            text = "sil"
        intervals [2]:
            xmin = 0.25
            xmax = 0.6
            text = "HH"
        intervals [3]:
            xmin = 0.6
            xmax = 1.0
            text = "AY1"
"""


def test_parse_textgrid():
    tiers = parse_textgrid(TEXTGRID)
    assert set(tiers) == {"words", "phones"}
    assert tiers["phones"][1] == (0.25, 0.6, "HH")
    assert len(tiers["phones"]) == 3


def test_fs2_get_alignment(tmp_path):
    from neuraltexttospeech_tpu.data.fs2_preprocess import FS2Preprocessor

    pre = FS2Preprocessor(str(tmp_path), str(tmp_path), str(tmp_path / "out"))
    tiers = parse_textgrid(TEXTGRID)
    phones, durs, start, end = pre.get_alignment(tiers["phones"])
    assert phones == ["HH", "AY1"]
    assert start == 0.25 and end == 1.0
    # durations in frames at 22050/256
    assert durs[0] == round(0.6 * 22050 / 256) - round(0.25 * 22050 / 256)
