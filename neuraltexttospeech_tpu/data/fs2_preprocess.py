"""FastSpeech 2 preprocessing: MFA TextGrids → duration/pitch/energy/mel.

Re-design of ``FastSpeech2_TF/preprocessor/preprocessor.py:16-333``
(``Preprocessor.{build_from_path, process_utterance, get_alignment,
normalize}``): per utterance, align MFA phone intervals to mel frames,
extract frame pitch with the JAX YIN kernel (replacing pyworld) and frame
energy from the magnitude STFT, average both over phone durations
(``phoneme_level`` features, ``preprocess.yaml``), then z-normalize with
corpus statistics written to ``stats.json``.

Outputs per utterance (under ``out_dir``): ``<utt>_{duration,pitch,energy,
mel}.npy`` plus ``train.txt``/``val.txt`` metadata and ``stats.json`` —
the same on-disk contract the reference's scaffold defines.
"""

from __future__ import annotations

import json
import os
import pathlib
from typing import List, Optional, Tuple

import numpy as np

from ..audio.stft import STFT
from .filelist import load_wav
from .pitch import yin_pitch
from .textgrid import parse_textgrid

__all__ = ["FS2Preprocessor"]

SIL_PHONES = {"sil", "sp", "spn", ""}


class FS2Preprocessor:
    def __init__(
        self,
        raw_path: str,
        textgrid_path: str,
        out_dir: str,
        *,
        sampling_rate: int = 22050,
        hop_length: int = 256,
        filter_length: int = 1024,
        win_length: int = 1024,
        n_mel_channels: int = 80,
        mel_fmin: float = 0.0,
        mel_fmax: float = 8000.0,
        val_size: int = 512,
        pitch_normalization: bool = True,
        energy_normalization: bool = True,
    ):
        self.raw_path = pathlib.Path(raw_path)
        self.textgrid_path = pathlib.Path(textgrid_path)
        self.out_dir = pathlib.Path(out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self.sampling_rate = sampling_rate
        self.hop_length = hop_length
        self.val_size = val_size
        self.pitch_normalization = pitch_normalization
        self.energy_normalization = energy_normalization
        self.stft = STFT(
            filter_length=filter_length, frame_length=win_length,
            frame_step=hop_length, n_mel_channels=n_mel_channels,
            sampling_rate=sampling_rate, mel_fmin=mel_fmin, mel_fmax=mel_fmax)

    def get_alignment(self, intervals) -> Tuple[List[str], List[int], float, float]:
        """Phone labels + per-phone frame durations; strips leading/trailing
        silence (reference ``preprocessor.py:get_alignment``)."""
        phones, durations = [], []
        start_time = end_time = 0.0
        end_idx = 0
        sr, hop = self.sampling_rate, self.hop_length
        for (s, e, p) in intervals:
            if not phones:
                if p in SIL_PHONES:
                    continue
                start_time = s
            phones.append(p)
            durations.append(
                int(np.round(e * sr / hop) - np.round(s * sr / hop)))
            if p not in SIL_PHONES:
                end_time = e
                end_idx = len(phones)
        return (phones[:end_idx], durations[:end_idx], start_time, end_time)

    def process_utterance(self, utt_id: str, text: str,
                          wav_path: str, tg_path: str) -> Optional[dict]:
        tiers = parse_textgrid(tg_path)
        if "phones" not in tiers:
            return None
        phones, durations, start, end = self.get_alignment(tiers["phones"])
        if not phones or end <= start:
            return None
        audio, _ = load_wav(wav_path, self.sampling_rate)
        a = audio[int(self.sampling_rate * start):
                  int(self.sampling_rate * end)].astype(np.float32)

        mel = np.asarray(self.stft.mel_spectrogram(a), np.float32)
        n_frames = min(mel.shape[0], int(np.sum(durations)))
        mel = mel[:n_frames]
        pitch = np.asarray(yin_pitch(
            a, sr=self.sampling_rate, hop_length=self.hop_length,
            n_frames=n_frames), np.float32)
        energy = np.linalg.norm(mel, axis=1)

        # Linearly interpolate pitch through unvoiced regions, then average
        # frame-level pitch/energy per phone (phoneme_level feature,
        # reference ``preprocessor.py:225-248``).
        voiced_ids = np.where(pitch > 0)[0]
        if len(voiced_ids):
            pitch = np.interp(
                np.arange(len(pitch)), voiced_ids, pitch[voiced_ids]
            ).astype(np.float32)
        durations = np.asarray(durations, np.int64)
        # clip duration sum to available frames
        cum = np.minimum(np.cumsum(durations), n_frames)
        starts = np.concatenate([[0], cum[:-1]])
        ph_pitch = np.zeros(len(durations), np.float32)
        ph_energy = np.zeros(len(durations), np.float32)
        for i, (s, e) in enumerate(zip(starts, cum)):
            if e > s:
                ph_pitch[i] = pitch[s:e].mean()
                ph_energy[i] = energy[s:e].mean()
        durations = (cum - starts).astype(np.int64)

        np.save(self.out_dir / f"{utt_id}_duration.npy", durations)
        np.save(self.out_dir / f"{utt_id}_pitch.npy", ph_pitch)
        np.save(self.out_dir / f"{utt_id}_energy.npy", ph_energy)
        np.save(self.out_dir / f"{utt_id}_mel.npy", mel)
        return {"id": utt_id, "text": text,
                "phones": "{" + " ".join(phones) + "}",
                "pitch": ph_pitch, "energy": ph_energy,
                "n_frames": n_frames}

    @staticmethod
    def remove_outlier(values: np.ndarray) -> np.ndarray:
        """IQR filter for corpus statistics (reference
        ``preprocessor.py:remove_outlier``: strict 1.5·IQR fences)."""
        values = np.asarray(values)
        if values.size == 0:
            return values
        p25 = np.percentile(values, 25)
        p75 = np.percentile(values, 75)
        lower = p25 - 1.5 * (p75 - p25)
        upper = p75 + 1.5 * (p75 - p25)
        return values[np.logical_and(values > lower, values < upper)]

    def normalize(self, suffix: str, mean: float, std: float) -> Tuple[float, float]:
        """Z-normalize saved features in place (every value — the reference
        ``preprocessor.py:normalize`` does not special-case zeros); returns
        (min, max) over the normalized corpus."""
        vmin, vmax = np.inf, -np.inf
        for f in self.out_dir.glob(f"*_{suffix}.npy"):
            x = (np.load(f) - mean) / std
            vmin = min(vmin, float(x.min(initial=np.inf)))
            vmax = max(vmax, float(x.max(initial=-np.inf)))
            np.save(f, x)
        return vmin, vmax

    def build_from_path(self, metadata: List[Tuple[str, str]],
                        verbose: bool = True) -> dict:
        """metadata: [(utt_id, text)]. Expects ``<raw>/<utt>.wav`` and
        ``<textgrid>/<utt>.TextGrid``."""
        entries = []
        pitch_all, energy_all = [], []
        n_total_frames = 0
        for i, (utt_id, text) in enumerate(metadata):
            wav = self.raw_path / f"{utt_id}.wav"
            tg = self.textgrid_path / f"{utt_id}.TextGrid"
            if not wav.exists() or not tg.exists():
                continue
            r = self.process_utterance(utt_id, text, str(wav), str(tg))
            if r is None:
                continue
            entries.append(f"{r['id']}|{r['phones']}|{r['text']}")
            # corpus statistics over IQR-filtered values (reference
            # ``preprocessor.py:103-110`` feeds remove_outlier'd arrays to
            # a StandardScaler — pooled mean/std over the concatenation)
            pitch_all.append(self.remove_outlier(r["pitch"]))
            energy_all.append(self.remove_outlier(r["energy"]))
            n_total_frames += r["n_frames"]
            if verbose and (i + 1) % 200 == 0:
                print(f"processed {i + 1}/{len(metadata)}")

        pitch_cat = (np.concatenate(pitch_all)
                     if pitch_all else np.zeros(1, np.float32))
        energy_cat = (np.concatenate(energy_all)
                      if energy_all else np.zeros(1, np.float32))
        stats = {
            "pitch_mean": float(pitch_cat.mean()),
            "pitch_std": float(pitch_cat.std() + 1e-9),
            "energy_mean": float(energy_cat.mean()),
            "energy_std": float(energy_cat.std() + 1e-9),
            "n_frames": int(n_total_frames),
        }
        if self.pitch_normalization:
            stats["pitch_min"], stats["pitch_max"] = self.normalize(
                "pitch", stats["pitch_mean"], stats["pitch_std"])
        if self.energy_normalization:
            stats["energy_min"], stats["energy_max"] = self.normalize(
                "energy", stats["energy_mean"], stats["energy_std"])
        # reference-format entries ("pitch"/"energy": [min, max, mean, std],
        # ``preprocessor.py:136-153``) alongside the flat keys, so the
        # stats.json is a drop-in for tooling written against either
        for k in ("pitch", "energy"):
            if f"{k}_min" in stats:
                stats[k] = [stats[f"{k}_min"], stats[f"{k}_max"],
                            stats[f"{k}_mean"], stats[f"{k}_std"]]
        with open(self.out_dir / "stats.json", "w") as f:
            json.dump(stats, f, indent=2)

        rng = np.random.default_rng(1234)
        rng.shuffle(entries)
        val = entries[: self.val_size]
        train = entries[self.val_size:]
        (self.out_dir / "train.txt").write_text("\n".join(train) + "\n")
        (self.out_dir / "val.txt").write_text("\n".join(val) + "\n")
        return stats
