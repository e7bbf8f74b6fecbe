"""Audio-library parity harness — the repo's oracle-diff methodology.

Port of the reference's ``AudioProcessing/main.py:19-226`` capability: load
one reference wav through the available backends (scipy, tensorflow, torch)
and push it through the mel pipelines (tf.signal oracle, a torch
Tacotron-STFT-style pipeline, this framework's XLA path and fused Pallas
path), reporting L1/L∞ distances between every pair — the ≤1e-3 budget from
BASELINE.json is asserted for our paths vs the tf.signal oracle.

Usage:
  python tools/audio_compare.py [--wav /root/reference/AudioProcessing/LJ001-0001.wav]
"""

import argparse
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def load_backends(wav_path: str):
    from scipy.io import wavfile

    out = {}
    sr, data = wavfile.read(wav_path)
    out["scipy"] = data.astype(np.float32) / 32768.0

    try:
        import tensorflow as tf

        audio, tf_sr = tf.audio.decode_wav(tf.io.read_file(wav_path))
        out["tensorflow"] = tf.squeeze(audio, -1).numpy()
    except Exception as e:  # pragma: no cover
        print("tf load failed:", e)

    try:
        import torch
        import torchaudio

        wav, _ = torchaudio.load(wav_path)
        out["torchaudio"] = wav[0].numpy()
    except Exception:
        pass  # torchaudio optional
    return sr, out


def mel_pipelines(x: np.ndarray, sr: int):
    mels = {}

    # tf.signal oracle (the reference's canonical extractor)
    import tensorflow as tf

    spec = tf.signal.stft(tf.constant(x), 1024, 256, 1024)
    fb = tf.signal.linear_to_mel_weight_matrix(
        num_mel_bins=80, num_spectrogram_bins=513, sample_rate=sr,
        lower_edge_hertz=0.0, upper_edge_hertz=8000.0)
    mels["tf.signal"] = tf.math.log(tf.clip_by_value(
        tf.linalg.matmul(tf.math.pow(tf.abs(spec), 0.5), fb),
        1e-5, tf.float32.max)).numpy()

    # torch pipeline (frame+window+rfft, same filterbank)
    try:
        import torch

        xt = torch.from_numpy(x)
        window = torch.hann_window(1024, periodic=True)
        frames = xt.unfold(0, 1024, 256) * window
        mag = torch.fft.rfft(frames, n=1024).abs()
        fb_t = torch.from_numpy(fb.numpy())
        mel = torch.log(torch.clamp(mag.pow(0.5) @ fb_t, min=1e-5))
        mels["torch"] = mel.numpy()
    except Exception as e:  # pragma: no cover
        print("torch pipeline failed:", e)

    # this framework: XLA path and fused Pallas path
    from neuraltexttospeech_tpu.audio import STFT

    mels["tpu_xla"] = np.asarray(STFT().mel_spectrogram(x))
    try:
        mels["tpu_pallas"] = np.asarray(
            STFT(use_pallas=True).mel_spectrogram(x))
    except Exception as e:  # pragma: no cover
        print("pallas path failed:", e)
    return mels


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--wav",
                   default="/root/reference/AudioProcessing/LJ001-0001.wav")
    args = p.parse_args(argv)

    sr, loads = load_backends(args.wav)
    print(f"sample rate {sr}; loaders: {sorted(loads)}")
    base = loads["scipy"]
    for name, arr in loads.items():
        if name == "scipy":
            continue
        d = np.abs(base[: len(arr)] - arr[: len(base)]).max()
        print(f"  wav {name} vs scipy: max abs diff {d:.2e}")

    mels = mel_pipelines(base, sr)
    names = sorted(mels)
    print(f"mel pipelines: {names} (shape {mels[names[0]].shape})")
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            n = min(len(mels[a]), len(mels[b]))
            diff = np.abs(mels[a][:n] - mels[b][:n])
            print(f"  {a} vs {b}: L1 {diff.mean():.3e}  Linf {diff.max():.3e}")

    budget = 1e-3
    for ours in ("tpu_xla", "tpu_pallas"):
        if ours in mels:
            d = np.abs(mels[ours] - mels["tf.signal"]).max()
            status = "OK" if d <= budget else "FAIL"
            print(f"parity {ours} vs tf.signal: {d:.2e} (budget {budget}) "
                  f"{status}")


if __name__ == "__main__":
    main()
