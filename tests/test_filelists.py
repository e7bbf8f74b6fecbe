"""The shipped LJSpeech filelists match the reference's data contract
(``FastPitch_TF/filelists/``: 12,496 train / 100 val / 500 test, pipe-
separated ``wav|[pitch|]text``) and parse through our loaders."""

import pathlib

import numpy as np
import pytest

from neuraltexttospeech_tpu.data.filelist import (
    load_filepaths_and_text, save_wav,
)

ROOT = pathlib.Path(__file__).resolve().parents[1] / "filelists"

EXPECTED = {
    "ljs_audio_text_train_v3.txt": (12496, 2),
    "ljs_audio_text_val.txt": (100, 2),
    "ljs_audio_text_test.txt": (500, 2),
    "ljs_audio_pitch_text_train_v3.txt": (12496, 3),
    "ljs_audio_pitch_text_val.txt": (100, 3),
    "ljs_audio_pitch_text_test.txt": (500, 3),
    "ljs_audio_text.txt": (13100, 2),
}


@pytest.mark.parametrize("name,expected", sorted(EXPECTED.items()))
def test_filelist_contract(name, expected):
    n_lines, n_cols = expected
    entries = load_filepaths_and_text(str(ROOT / name))
    assert len(entries) == n_lines
    for e in entries[:50] + entries[-50:]:
        assert len(e) == n_cols, e
        assert e[0].endswith(".wav")
        if n_cols == 3:
            assert e[1].startswith("pitch/") and e[1].endswith(".pt")
        assert e[-1]  # non-empty transcript


def test_train_val_test_disjoint():
    def wavs(name):
        return {e[0] for e in load_filepaths_and_text(str(ROOT / name))}

    train = wavs("ljs_audio_text_train_v3.txt")
    val = wavs("ljs_audio_text_val.txt")
    test = wavs("ljs_audio_text_test.txt")
    assert not (train & val) and not (train & test) and not (val & test)
    assert train | val | test <= wavs("ljs_audio_text.txt")


def test_pitch_column_through_dataset(tmp_path):
    """``wav|pitch.pt|text`` rows drive FastPitchDataset's
    load_pitch_from_disk path (.pt names resolve to prepared .npy)."""
    from neuraltexttospeech_tpu.data.dataset import FastPitchDataset

    rng = np.random.default_rng(0)
    wav_dir = tmp_path / "wavs"
    pitch_dir = tmp_path / "pitch"
    wav_dir.mkdir(), pitch_dir.mkdir()
    lines = []
    for i in range(2):
        wav = wav_dir / f"u{i}.wav"
        t = np.arange(8192) / 22050.0
        save_wav(str(wav), (0.2 * np.sin(2 * np.pi * 150 * t)).astype(
            np.float32), 22050)
        n_mel = 1 + (8192 - 1024) // 256
        np.save(pitch_dir / f"u{i}.npy",
                rng.standard_normal(n_mel + 4).astype(np.float32))
        # the filelist names the torch-style .pt path, like the LJ lists
        lines.append(f"{wav}|{pitch_dir / f'u{i}.pt'}|sample text {i}")
    fl = tmp_path / "list.txt"
    fl.write_text("\n".join(lines) + "\n")

    ds = FastPitchDataset(str(tmp_path / "feats"), str(fl),
                          p_arpabet=0.0, load_pitch_from_disk=True)
    batch = next(ds.batches(2, shuffle=False))
    assert batch["pitch"].shape[0] == 2
    assert np.isfinite(batch["pitch"]).all()
    assert batch["text"].shape[0] == 2
