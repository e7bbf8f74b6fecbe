"""VocoderDataset: segment cropping, batched mels, fine-tuning mel path."""

import numpy as np
import pytest

from neuraltexttospeech_tpu.data.filelist import save_wav
from neuraltexttospeech_tpu.data.mel_dataset import VocoderDataset


@pytest.fixture()
def wav_filelist(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    for i in range(3):
        p = tmp_path / f"utt{i}.wav"
        save_wav(str(p), rng.standard_normal(22050) * 0.1, 22050)
        paths.append(str(p))
    fl = tmp_path / "list.txt"
    fl.write_text("\n".join(f"{p}|text" for p in paths) + "\n")
    return str(fl), tmp_path


def test_segment_batches(wav_filelist):
    fl, _ = wav_filelist
    ds = VocoderDataset(fl, segment_size=4096, n_fft=1024, hop_size=256,
                        win_size=1024, num_mels=80)
    batch = next(ds.batches(2, shuffle=False))
    assert batch["audio"].shape == (2, 4096, 1)
    assert batch["mel"].shape == (2, 16, 80)
    assert batch["mel_loss"].shape == (2, 16, 80)
    assert np.isfinite(batch["mel"]).all()


def test_tiny_corpus_fills_batch_with_replacement(wav_filelist):
    # corpus (3 files) smaller than the batch: random-crop training must
    # sample with replacement, not silently yield zero batches
    fl, _ = wav_filelist
    ds = VocoderDataset(fl, segment_size=4096, n_fft=1024, hop_size=256,
                        win_size=1024, num_mels=80)
    batches = list(ds.batches(8, seed=3, max_batches=2))
    assert len(batches) == 2
    assert batches[0]["audio"].shape == (8, 4096, 1)
    # without max_batches a shuffled epoch still yields one batch
    assert len(list(ds.batches(8, seed=3))) == 1
    # deterministic eval path keeps exact-epoch semantics
    assert list(ds.batches(8, shuffle=False)) == []


def test_fine_tuning_path_uses_saved_mels(wav_filelist):
    fl, tmp = wav_filelist
    mel_dir = tmp / "gen_mels"
    mel_dir.mkdir()
    rng = np.random.default_rng(1)
    for i in range(3):
        np.save(mel_dir / f"utt{i}_mel.npy",
                rng.standard_normal((86, 80)).astype(np.float32))
    ds = VocoderDataset(fl, segment_size=4096, hop_size=256, num_mels=80,
                        fine_tuning_mel_dir=str(mel_dir))
    batch = next(ds.batches(2, shuffle=False))
    assert batch["mel"].shape == (2, 16, 80)
    assert batch["audio"].shape == (2, 4096, 1)
    # input mel comes from the saved files, not recomputed from audio
    assert not np.allclose(batch["mel"], batch["mel_loss"])
