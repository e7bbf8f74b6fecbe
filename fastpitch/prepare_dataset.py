"""Precompute FastPitch features (mel / YIN pitch / beta-binomial priors).

Public CLI mirroring the reference's dataset-prep pass
(``FastPitch_TF/prepare_dataset.py`` / the cold feature loop in
``data_function.py``): reads a pipe-separated filelist, writes ``.npy``
caches into --dataset-path. Unlike the reference's 16h45m host loop
(BASELINE.md), pitch runs as batched FFT autocorrelation in JAX.

Usage:
  python fastpitch/prepare_dataset.py --dataset-path out/feats \
      --training-files filelists/ljs_audio_text_train.txt
"""

import argparse
import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from neuraltexttospeech_tpu.data.dataset import FastPitchDataset


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset-path", "-d", required=True)
    p.add_argument("--training-files", required=True)
    p.add_argument("--text-cleaners", nargs="*", default=["english_cleaners_v2"])
    p.add_argument("--symbol-set", default="english_basic")
    p.add_argument("--p-arpabet", type=float, default=1.0)
    p.add_argument("--n-speakers", type=int, default=1)
    p.add_argument("--sampling-rate", type=int, default=22050)
    p.add_argument("--filter-length", type=int, default=1024)
    p.add_argument("--hop-length", type=int, default=256)
    p.add_argument("--win-length", type=int, default=1024)
    p.add_argument("--mel-fmin", type=float, default=0.0)
    p.add_argument("--mel-fmax", type=float, default=8000.0)
    p.add_argument("--n-mel-channels", type=int, default=80)
    return p.parse_args()


def main():
    args = parse_args()
    ds = FastPitchDataset(
        args.dataset_path, args.training_files,
        text_cleaners=args.text_cleaners, symbol_set=args.symbol_set,
        p_arpabet=args.p_arpabet, n_speakers=args.n_speakers,
        sampling_rate=args.sampling_rate, filter_length=args.filter_length,
        hop_length=args.hop_length, win_length=args.win_length,
        mel_fmin=args.mel_fmin, mel_fmax=args.mel_fmax,
        n_mel_channels=args.n_mel_channels,
    )
    t0 = time.perf_counter()
    ds.prepare()
    print(f"prepared {len(ds)} items in {time.perf_counter() - t0:.1f}s")


if __name__ == "__main__":
    main()
