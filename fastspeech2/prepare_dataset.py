"""FastSpeech 2 preprocessing CLI: MFA TextGrids → duration/pitch/energy/mel
+ stats.json (reference surface: ``FastSpeech2_TF/preprocess.py`` driving
``preprocessor/preprocessor.py`` with ``config/LJSpeech/preprocess.yaml``).

Usage:
  python fastspeech2/prepare_dataset.py --config config.yaml
  # or flag-style:
  python fastspeech2/prepare_dataset.py --raw-path raw/LJSpeech \
      --textgrid-path TextGrid/LJSpeech --out-dir preprocessed/LJSpeech \
      --metadata metadata.csv
"""

import argparse
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default=None, help="preprocess.yaml")
    p.add_argument("--raw-path", default=None)
    p.add_argument("--textgrid-path", default=None)
    p.add_argument("--out-dir", default=None)
    p.add_argument("--metadata", default=None,
                   help="LJSpeech metadata.csv (id|raw|normalized)")
    p.add_argument("--val-size", type=int, default=512)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from neuraltexttospeech_tpu.data.fs2_preprocess import FS2Preprocessor

    kw = {}
    if args.config:
        import yaml

        cfg = yaml.safe_load(open(args.config))
        path = cfg["path"]
        pp = cfg["preprocessing"]
        args.raw_path = args.raw_path or path["raw_path"]
        args.out_dir = args.out_dir or path["preprocessed_path"]
        args.textgrid_path = (args.textgrid_path
                              or str(pathlib.Path(path["preprocessed_path"])
                                     / "TextGrid"))
        kw = dict(
            sampling_rate=pp["audio"]["sampling_rate"],
            hop_length=pp["stft"]["hop_length"],
            filter_length=pp["stft"]["filter_length"],
            win_length=pp["stft"]["win_length"],
            n_mel_channels=pp["mel"]["n_mel_channels"],
            mel_fmin=pp["mel"]["mel_fmin"],
            mel_fmax=pp["mel"]["mel_fmax"] or 8000.0,
            val_size=cfg["preprocessing"]["val_size"],
            pitch_normalization=pp["pitch"]["normalization"],
            energy_normalization=pp["energy"]["normalization"],
        )
    assert args.raw_path and args.textgrid_path and args.out_dir, \
        "--config or all of --raw-path/--textgrid-path/--out-dir required"

    metadata = []
    meta_file = args.metadata or str(pathlib.Path(args.raw_path)
                                     / "metadata.csv")
    with open(meta_file, encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split("|")
            if len(parts) >= 2:
                metadata.append((parts[0], parts[-1]))

    pre = FS2Preprocessor(args.raw_path, args.textgrid_path, args.out_dir,
                          val_size=args.val_size, **kw)
    stats = pre.build_from_path(metadata)
    print("stats:", stats)


if __name__ == "__main__":
    main()
