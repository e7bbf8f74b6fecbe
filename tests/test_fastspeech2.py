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


# --------------------------------------------------------------------------
# Preprocessing arithmetic vs an in-test oracle of the reference's math
# (``FastSpeech2_TF/preprocessor/preprocessor.py:151-333``) — VERDICT r2 #9
# --------------------------------------------------------------------------

_ORACLE_SIL = ["sil", "sp", "spn"]


def _oracle_get_alignment(intervals, sr, hop):
    """Literal port of the reference ``get_alignment`` loop arithmetic
    (``preprocessor.py:273-313``): leading-silence skip, absolute-time
    rounding to frames, trailing-silence trim."""
    phones, durations = [], []
    start_time = end_time = 0.0
    end_idx = 0
    for (s, e, p) in intervals:
        if phones == []:
            if p in _ORACLE_SIL:
                continue
            else:
                start_time = s
        if p not in _ORACLE_SIL:
            phones.append(p)
            end_time = e
            end_idx = len(phones)
        else:
            phones.append(p)
        durations.append(int(np.round(e * sr / hop) - np.round(s * sr / hop)))
    return phones[:end_idx], durations[:end_idx], start_time, end_time


def _oracle_remove_outlier(values):
    """Reference ``preprocessor.py:316-325``: strict 1.5·IQR fences."""
    values = np.array(values)
    p25 = np.percentile(values, 25)
    p75 = np.percentile(values, 75)
    lower = p25 - 1.5 * (p75 - p25)
    upper = p75 + 1.5 * (p75 - p25)
    return values[np.logical_and(values > lower, values < upper)]


def _tg(intervals, xmax):
    items = "\n".join(
        f"""        intervals [{i + 1}]:
            xmin = {s}
            xmax = {e}
            text = "{p}\"""" for i, (s, e, p) in enumerate(intervals))
    return f"""File type = "ooTextFile"
Object class = "TextGrid"

xmin = 0
xmax = {xmax}
tiers? <exists>
size = 1
item []:
    item [1]:
        class = "IntervalTier"
        name = "phones"
        xmin = 0
        xmax = {xmax}
        intervals: size = {len(intervals)}
{items}
"""


def test_fs2_preprocess_matches_reference_oracle(tmp_path):
    """End-to-end ``FS2Preprocessor`` vs the oracle: per-utterance phones,
    trim offsets, and frame durations match the reference loop exactly;
    stats.json (IQR-filtered pooled mean/std, post-normalization min/max)
    matches the reference's StandardScaler arithmetic; saved features are
    normalized with the same mean/std everywhere (zeros included)."""
    from scipy.io import wavfile

    from neuraltexttospeech_tpu.data.fs2_preprocess import FS2Preprocessor

    sr, hop = 22050, 256
    raw = tmp_path / "raw"
    tgd = tmp_path / "tg"
    raw.mkdir(), tgd.mkdir()

    # three utterances: leading sil + trailing sp trims, a mid spn, and a
    # zero-duration phone (interval shorter than half a hop); one pure-
    # silence utterance that must be skipped
    grids = {
        "utt1": [(0.0, 0.2, "sil"), (0.2, 0.45, "HH"), (0.45, 0.451, "AH0"),
                 (0.451, 0.8, "AY1"), (0.8, 0.95, "sp")],
        "utt2": [(0.0, 0.31, "DH"), (0.31, 0.5, "spn"), (0.5, 0.77, "IY1")],
        "utt3": [(0.0, 0.6, "sil"), (0.6, 0.7, "sp")],
    }
    rng = np.random.default_rng(23)
    for utt, ivs in grids.items():
        xmax = ivs[-1][1]
        (tgd / f"{utt}.TextGrid").write_text(_tg(ivs, xmax))
        t = np.arange(int(sr * xmax)) / sr
        tone = 0.4 * np.sin(2 * np.pi * 220.0 * t)
        noise = 0.01 * rng.standard_normal(len(t))
        wavfile.write(raw / f"{utt}.wav", sr,
                      ((tone + noise) * 32767).astype(np.int16))

    pre = FS2Preprocessor(str(raw), str(tgd), str(tmp_path / "out"),
                          sampling_rate=sr, hop_length=hop, val_size=1)

    # ---- per-utterance: alignment arithmetic is exact -------------------
    raw_feats = {}
    for utt, ivs in grids.items():
        ph_o, dur_o, start_o, end_o = _oracle_get_alignment(ivs, sr, hop)
        ph, dur, start, end = pre.get_alignment(ivs)
        assert ph == ph_o
        assert dur == dur_o
        assert (start, end) == (start_o, end_o)
        r = pre.process_utterance(utt, utt, str(raw / f"{utt}.wav"),
                                  str(tgd / f"{utt}.TextGrid"))
        if not ph_o:
            assert r is None
            continue
        raw_feats[utt] = r
        # saved durations = oracle durations clipped to the mel length
        saved = np.load(tmp_path / "out" / f"{utt}_duration.npy")
        n_frames = r["n_frames"]
        cum = np.minimum(np.cumsum(dur_o), n_frames)
        np.testing.assert_array_equal(
            saved, np.diff(np.concatenate([[0], cum])))

    assert "utt3" not in raw_feats      # pure silence rejected

    # ---- corpus stats: reference StandardScaler arithmetic --------------
    stats = pre.build_from_path([(u, u) for u in grids])
    pitch_cat = np.concatenate(
        [_oracle_remove_outlier(raw_feats[u]["pitch"]) for u in raw_feats])
    energy_cat = np.concatenate(
        [_oracle_remove_outlier(raw_feats[u]["energy"]) for u in raw_feats])
    np.testing.assert_allclose(stats["pitch_mean"], pitch_cat.mean(),
                               rtol=1e-5)
    np.testing.assert_allclose(stats["pitch_std"], pitch_cat.std(),
                               rtol=1e-5)
    np.testing.assert_allclose(stats["energy_mean"], energy_cat.mean(),
                               rtol=1e-5)
    np.testing.assert_allclose(stats["energy_std"], energy_cat.std(),
                               rtol=1e-5)

    # post-normalization extrema over every (zero included) value
    for key, field in (("pitch", "pitch"), ("energy", "energy")):
        allv = np.concatenate([
            (raw_feats[u][field] - stats[f"{key}_mean"]) / stats[f"{key}_std"]
            for u in raw_feats])
        np.testing.assert_allclose(stats[f"{key}_min"], allv.min(), rtol=1e-5)
        np.testing.assert_allclose(stats[f"{key}_max"], allv.max(), rtol=1e-5)
        # saved arrays were normalized in place with the same mean/std
        for u in raw_feats:
            saved = np.load(tmp_path / "out" / f"{u}_{field}.npy")
            np.testing.assert_allclose(
                saved,
                (raw_feats[u][field] - stats[f"{key}_mean"])
                / stats[f"{key}_std"], rtol=2e-5, atol=1e-5)
        # reference-format nested entry mirrors the flat keys
        np.testing.assert_allclose(
            stats[key], [stats[f"{key}_min"], stats[f"{key}_max"],
                         stats[f"{key}_mean"], stats[f"{key}_std"]])

    # train/val metadata excludes the silent utterance
    listed = (tmp_path / "out" / "train.txt").read_text() + \
        (tmp_path / "out" / "val.txt").read_text()
    assert "utt3" not in listed
    assert "utt1" in listed and "utt2" in listed
