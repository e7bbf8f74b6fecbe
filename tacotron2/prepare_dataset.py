"""Tacotron 2 dataset prep: cache mels for a filelist (text+mel pipeline,
reference ``Tacotron2_TF/data_utils.py`` lazily computed these per epoch —
20–30 min/pass, BASELINE.md).

Usage:
  python tacotron2/prepare_dataset.py -d out/feats \
      --training-files filelists/ljs_audio_text_train.txt
"""

import argparse
import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from neuraltexttospeech_tpu.data.dataset import FastPitchDataset


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-d", "--dataset-path", required=True)
    p.add_argument("--training-files", required=True)
    p.add_argument("--text-cleaners", nargs="*", default=["english_cleaners"])
    args = p.parse_args(argv)

    ds = FastPitchDataset(
        args.dataset_path, args.training_files,
        text_cleaners=args.text_cleaners, p_arpabet=0.0,
        with_pitch=False, with_prior=False)
    t0 = time.perf_counter()
    ds.prepare()
    print(f"prepared {len(ds)} items in {time.perf_counter() - t0:.1f}s")


if __name__ == "__main__":
    main()
