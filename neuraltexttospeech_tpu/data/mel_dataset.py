"""HiFi-GAN / vocoder dataset: random fixed-size waveform segments + mels.

Re-design of ``HiFiGAN_TF/data.py:40-236`` / ``mel_dataset.py``: each item is
a random ``segment_size``-sample crop (zero-padded if the clip is shorter),
with two mel spectrograms — the generator input (fmin..fmax) and the
reconstruction-loss target (fmax_for_loss) — computed with HiFi-GAN's
centered reflect padding so frame count = segment/hop. Fixed segment size ⇒
one static shape for the whole training run (SURVEY §5 long-context notes).

Mels are computed in **batched jitted JAX** per collated batch, not
per-sample on the host: the extractor is the same fused device pipeline the
GAN step uses, so data prep is a single STFT+matmul per batch.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import jax.numpy as jnp
import numpy as np

from ..audio.stft import STFTConfig, mel_spectrogram
from .filelist import load_filepaths_and_text, load_wav

__all__ = ["VocoderDataset"]


class VocoderDataset:
    def __init__(
        self,
        filelist_path,
        *,
        segment_size: int = 8192,
        n_fft: int = 1024,
        hop_size: int = 256,
        win_size: int = 1024,
        num_mels: int = 80,
        sampling_rate: int = 22050,
        fmin: float = 0.0,
        fmax: float = 8000.0,
        fmax_for_loss: Optional[float] = None,
        split: bool = True,
        fine_tuning_mel_dir: Optional[str] = None,
        seed: int = 1234,
    ):
        self.files = [f[0] for f in load_filepaths_and_text(filelist_path)]
        self.segment_size = segment_size
        self.hop_size = hop_size
        self.split = split
        self.sampling_rate = sampling_rate
        self.fine_tuning_mel_dir = fine_tuning_mel_dir
        self.rng = np.random.default_rng(seed)
        self.mel_cfg = STFTConfig(
            filter_length=n_fft, frame_length=win_size, frame_step=hop_size,
            n_mel_channels=num_mels, sampling_rate=sampling_rate,
            mel_fmin=fmin, mel_fmax=fmax,
        )
        self.mel_loss_cfg = STFTConfig(
            filter_length=n_fft, frame_length=win_size, frame_step=hop_size,
            n_mel_channels=num_mels, sampling_rate=sampling_rate,
            mel_fmin=fmin,
            mel_fmax=fmax_for_loss if fmax_for_loss is not None else sampling_rate / 2.0,
        )

    def __len__(self):
        return len(self.files)

    def _segment(self, audio: np.ndarray) -> np.ndarray:
        """Random crop / zero-pad to segment_size (reference ``data.py:113-130``)."""
        if not self.split:
            # full-utterance mode, truncated to a hop multiple
            n = (len(audio) // self.hop_size) * self.hop_size
            return audio[:n]
        if len(audio) >= self.segment_size:
            start = int(self.rng.integers(0, len(audio) - self.segment_size + 1))
            return audio[start : start + self.segment_size]
        return np.pad(audio, (0, self.segment_size - len(audio)))

    def __getitem__(self, index: int) -> np.ndarray:
        audio, _ = load_wav(self.files[index], self.sampling_rate)
        return self._segment(audio)

    def _fine_tuning_item(self, index: int):
        """Fine-tuning mode (reference ``HiFiGAN_TF/data.py`` fine_tuning
        branch): generator input mel comes from the acoustic model's saved
        ``<utt>_mel.npy``; the audio crop is aligned to the mel crop."""
        import os

        audio, _ = load_wav(self.files[index], self.sampling_rate)
        base = os.path.basename(self.files[index]).replace(".wav", "_mel.npy")
        mel = np.load(os.path.join(self.fine_tuning_mel_dir, base))
        frames = self.segment_size // self.hop_size
        if mel.shape[0] >= frames:
            start = int(self.rng.integers(0, mel.shape[0] - frames + 1))
        else:
            mel = np.pad(mel, ((0, frames - mel.shape[0]), (0, 0)))
            start = 0
        mel_crop = mel[start : start + frames]
        a0 = start * self.hop_size
        seg = audio[a0 : a0 + self.segment_size]
        if len(seg) < self.segment_size:
            seg = np.pad(seg, (0, self.segment_size - len(seg)))
        return seg.astype(np.float32), mel_crop.astype(np.float32)

    def _mels(self, audio_b: np.ndarray):
        """Batched centered mel for input + loss target."""
        pad = (self.mel_cfg.filter_length - self.hop_size) // 2
        padded = jnp.pad(jnp.asarray(audio_b), ((0, 0), (pad, pad)), mode="reflect")
        mel = mel_spectrogram(padded, self.mel_cfg)
        mel_loss = mel_spectrogram(padded, self.mel_loss_cfg)
        return mel, mel_loss

    def batches(
        self, batch_size: int, *, shuffle: bool = True, seed: int = 0,
        drop_last: bool = True, max_batches: Optional[int] = None,
        audio_only: bool = False,
    ) -> Iterator[Dict[str, np.ndarray]]:
        """``audio_only=True`` yields just the audio crops — both mels are
        deterministic functions of the crop, and ``hifigan_train_step``
        recomputes them inside the jitted step (fused Pallas mel on TPU),
        so collation skips two host→device→host mel round trips and the
        mel bytes per batch. Ignored in fine-tuning mode, where the
        generator-input mel comes from the acoustic model's files."""
        order = np.arange(len(self))
        rng = np.random.default_rng(seed)
        if shuffle:
            rng.shuffle(order)
        if shuffle and len(order) < batch_size:
            # Corpus smaller than the batch: since every item is a fresh
            # random crop anyway, sample files with replacement instead of
            # silently yielding zero batches (tiny-corpus overfit runs).
            n = max_batches if max_batches is not None else 1
            batch_idxs = [rng.integers(0, len(order), size=batch_size)
                          for _ in range(n)]
        else:
            stop = len(order) - (batch_size - 1 if drop_last else 0)
            batch_idxs = [order[i : i + batch_size]
                          for i in range(0, stop, batch_size)]
        count = 0
        for idxs in batch_idxs:
            if max_batches is not None and count >= max_batches:
                return
            if self.fine_tuning_mel_dir is not None:
                pairs = [self._fine_tuning_item(j) for j in idxs]
                audio = np.stack([p[0] for p in pairs])
                mel = np.stack([p[1] for p in pairs])
                pad = (self.mel_loss_cfg.filter_length - self.hop_size) // 2
                padded = jnp.pad(jnp.asarray(audio), ((0, 0), (pad, pad)),
                                 mode="reflect")
                mel_loss = np.asarray(
                    mel_spectrogram(padded, self.mel_loss_cfg), np.float32)
            else:
                audio = np.stack([self[j] for j in idxs])
                if audio_only:
                    yield {"audio": audio[..., None].astype(np.float32)}
                    count += 1
                    continue
                mel, mel_loss = self._mels(audio)
            yield {
                "audio": audio[..., None].astype(np.float32),
                "mel": np.asarray(mel, np.float32),
                "mel_loss": np.asarray(mel_loss, np.float32),
            }
            count += 1
