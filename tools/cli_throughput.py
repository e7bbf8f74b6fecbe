"""Measure HOST-FED training throughput through the real CLI loop.

Every PERF.md/bench number is a pure-device chained step; this tool answers
the question the reference's host pipeline made painful
(``FastPitch_TF/README.md``: 16h45m data prep; ``data_function.py:161-632``
generator feeding the GPU): does the actual CLI loop — Python batcher →
``prefetch`` thread → ``shard_batch`` → jitted step → metric/checkpoint
bookkeeping — sustain the bench step rate on one host core?

It builds a synthetic full-size corpus (N wavs at LJSpeech-like lengths,
listed R times so an epoch has enough batches; features cached up front like
``prepare_dataset.py``), runs the REAL train CLI in a subprocess, and
reports steady-state steps/s per epoch (epoch 0 pays the compile; later
epochs are the number that matters) against the device step from bench.py:

    python -u tools/cli_throughput.py fastpitch --device-ms 19.5
    python -u tools/cli_throughput.py hifigan  --device-ms 49.9

Results feed the PERF.md "host-fed CLI loop" table (VERDICT r4 #3).
"""

from __future__ import annotations

import argparse
import pathlib
import re
import subprocess
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# A few distinct mel lengths (frames): realistic bucket spread without
# paying one pitch-program compile per unique length.
MEL_LENS = (640, 704, 768, 832)
HOP = 256
SR = 22050
WORDS = ("the quick brown fox jumps over a lazy dog while printing from "
         "movable type remains the great invention of the age").split()


def build_corpus(root: pathlib.Path, n_items: int, list_repeat: int):
    """n_items synthetic wavs (+ filelist listing each ``list_repeat``×)."""
    from neuraltexttospeech_tpu.data.filelist import save_wav

    wav_dir = root / "wavs"
    wav_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    lines = []
    for i in range(n_items):
        n = MEL_LENS[i % len(MEL_LENS)] * HOP
        p = wav_dir / f"utt{i:03d}.wav"
        if not p.exists():
            t = np.arange(n) / SR
            f0 = 110.0 + 10.0 * (i % 7)
            audio = (0.25 * np.sin(2 * np.pi * f0 * t)
                     + 0.1 * np.sin(2 * np.pi * 2 * f0 * t)
                     + 0.03 * rng.standard_normal(n))
            save_wav(str(p), audio.astype(np.float32), SR)
        text = " ".join(WORDS[(i + j) % len(WORDS)] for j in range(18))
        lines.append(f"{p}|{text}.")
    fl = root / "train.txt"
    fl.write_text("\n".join(lines * list_repeat) + "\n")
    return fl


def prepare_features(root: pathlib.Path, fl: pathlib.Path):
    """Materialize the mel/pitch/prior caches (= prepare_dataset.py)."""
    from neuraltexttospeech_tpu.data.dataset import FastPitchDataset

    feats = root / "feats"
    t0 = time.perf_counter()
    ds = FastPitchDataset(str(feats), str(fl))
    ds.prepare(verbose=False)
    print(f"# features cached in {time.perf_counter() - t0:.1f}s "
          f"({len(ds)} rows)", flush=True)
    return feats


def run_cli(cmd, parse_line):
    """Run a train CLI, streaming output; return per-epoch steps/s list."""
    print("#", " ".join(cmd), flush=True)
    proc = subprocess.Popen(cmd, cwd=REPO, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    rates = []
    for line in proc.stdout:
        line = line.rstrip()
        if line and not re.search(r"WARNING|I0000|E0000", line):
            print(line, flush=True)
        rate = parse_line(line)
        if rate is not None:
            rates.append(rate)
    proc.wait()
    if proc.returncode != 0:
        raise SystemExit(f"CLI failed rc={proc.returncode}")
    return rates


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("what", choices=["fastpitch", "hifigan"])
    ap.add_argument("--device-ms", type=float, default=None,
                    help="bench.py pure-device ms/step for the ratio")
    ap.add_argument("--items", type=int, default=32)
    ap.add_argument("--list-repeat", type=int, default=24)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--steps-per-epoch", type=int, default=40)
    ap.add_argument("--workdir", default="/tmp/cli_throughput")
    a = ap.parse_args()

    root = pathlib.Path(a.workdir)
    fl = build_corpus(root, a.items, a.list_repeat)
    feats = prepare_features(root, fl)

    out = root / f"out_{a.what}"
    if a.what == "fastpitch":
        cmd = [sys.executable, "-u", "fastpitch/train.py",
               "-o", str(out), "-d", str(feats),
               "--training-files", str(fl), "--amp",
               "-bs", str(a.batch_size), "--epochs", str(a.epochs),
               "--steps-per-epoch", str(a.steps_per_epoch)]

        def parse(line):  # fit_epoch's epoch-mean line
            m = re.search(r"steps_per_sec=([0-9.]+)", line)
            return float(m.group(1)) if m else None
    else:
        cmd = [sys.executable, "-u", "hifigan/train.py",
               "-o", str(out), "--training-files", str(fl), "--amp",
               "--batch-size", str(a.batch_size), "--epochs", str(a.epochs),
               "--steps-per-epoch", str(a.steps_per_epoch)]

        def parse(line):  # "epoch N: <n> steps in <dt>s (...)"
            m = re.search(r"epoch \d+: (\d+) steps in ([0-9.]+)s", line)
            return float(m.group(1)) / float(m.group(2)) if m else None

    rates = run_cli(cmd, parse)
    steady = max(rates[1:]) if len(rates) > 1 else (rates[0] if rates else 0)
    print(f"\n{a.what} CLI loop: per-epoch steps/s = "
          f"{[round(r, 2) for r in rates]}")
    if steady:
        print(f"steady-state: {steady:.2f} steps/s = "
              f"{1e3 / steady:.1f} ms/step host-fed")
        if a.device_ms:
            print(f"pure-device step: {a.device_ms:.1f} ms "
                  f"→ CLI efficiency {a.device_ms * steady / 1e3:.1%}")


if __name__ == "__main__":
    main()
