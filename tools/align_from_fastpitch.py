"""Generate FastSpeech2-style alignments from a trained FastPitch.

FastSpeech 2 and the TalkNet TTS heads train from MFA-preprocessed
per-utterance features (``<utt>_mel/_duration/_pitch/_energy.npy`` +
``train.txt``, reference ``FastSpeech2_TF/preprocessor/preprocessor.py``).
When no Montreal-Forced-Aligner alignments exist, a trained FastPitch is an
aligner: its teacher-forced forward runs MAS over the ConvAttention
posteriors and returns exact per-token durations (summing to the true frame
count) plus duration-averaged pitch/energy targets — the same quantities
MFA + preprocessing would produce.

Usage:
  python tools/align_from_fastpitch.py \
      --checkpoint out/fastpitch/checkpoints -d feats \
      --training-files filelist.txt -o preprocessed/
"""

import argparse
import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True,
                   help="trained FastPitch orbax checkpoint dir")
    p.add_argument("-d", "--dataset-path", required=True)
    p.add_argument("--training-files", required=True)
    p.add_argument("-o", "--output", required=True,
                   help="FS2-preprocessed output dir")
    p.add_argument("--split", default="train")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--text-cleaners", nargs="*", default=None,
                   help="override the front-end recorded in the checkpoint's "
                        "model_config.json (default: use the recorded one)")
    p.add_argument("--symbol-set", default=None)
    p.add_argument("--p-arpabet", type=float, default=None)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp

    from fastpitch.inference import load_fastpitch
    from neuraltexttospeech_tpu.data.dataset import FastPitchDataset
    from neuraltexttospeech_tpu.models.registry import (
        find_model_config, load_frontend_config, load_model_config,
    )
    from neuraltexttospeech_tpu.text.processing import TextProcessing

    config = (load_model_config(args.checkpoint)[1]
              if find_model_config(args.checkpoint) else None)
    model, params = load_fastpitch(args.checkpoint, config)
    # The checkpoint must be fed the SAME text encoding it trained on, or
    # the MAS durations silently degrade for text where cleaners diverge
    # (numbers, dates, URLs). Read the recorded front-end from the run's
    # model_config.json; CLI flags override; legacy checkpoints without a
    # record fall back to fastpitch/train.py's defaults.
    fe = load_frontend_config(args.checkpoint, default={}) or {}
    cleaners = (args.text_cleaners if args.text_cleaners is not None
                else fe.get("text_cleaners", ["english_cleaners_v2"]))
    symbol_set = args.symbol_set or fe.get("symbol_set", "english_basic")
    p_arpabet = (args.p_arpabet if args.p_arpabet is not None
                 else fe.get("p_arpabet", 1.0))
    print(f"front-end: cleaners={cleaners} symbol_set={symbol_set} "
          f"p_arpabet={p_arpabet}", flush=True)
    ds = FastPitchDataset(args.dataset_path, args.training_files,
                          text_cleaners=cleaners,
                          symbol_set=symbol_set, p_arpabet=p_arpabet)
    tp = TextProcessing(symbol_set, cleaners, p_arpabet=p_arpabet)

    out = pathlib.Path(args.output)
    out.mkdir(parents=True, exist_ok=True)
    # Record the front-end next to the dumped features so FS2Dataset (and
    # any later consumer) re-encodes train.txt identically.
    (out / "frontend.json").write_text(json.dumps({
        "text_cleaners": list(cleaners), "symbol_set": symbol_set,
        "p_arpabet": p_arpabet}, indent=1))

    @jax.jit
    def forward(params, batch):
        return model.apply(
            params, batch["text"], batch["input_lens"], batch["mel"],
            batch["mel_lens"], batch["pitch"], batch.get("energy"), None,
            batch["attn_prior"])

    lines = []
    for start in range(0, len(ds), args.batch_size):
        idxs = list(range(start, min(start + args.batch_size, len(ds))))
        items = [ds[i] for i in idxs]
        batch = FastPitchDataset.collate(items)
        o = forward(params, {k: jnp.asarray(v) for k, v in batch.items()
                             if isinstance(v, np.ndarray)})
        durs = np.asarray(o.attn_hard_dur)
        pitch = np.asarray(o.pitch_tgt)
        energy = np.asarray(o.energy_tgt)
        for j, it in enumerate(items):
            stem = pathlib.Path(it["audiopath"]).name.replace(".wav", "")
            n_text = len(it["text"])
            n_mel = it["mel"].shape[0]
            text_field = ds.audiopaths_and_text[idxs[j]][-1]
            n_check = len(tp.encode_text(text_field))
            if n_check != n_text:
                raise SystemExit(
                    f"{stem}: FS2 re-encode gives {n_check} tokens but the "
                    f"dump used {n_text} — cleaners out of sync")
            d = durs[j, :n_text].astype(np.float32)
            assert int(d.sum()) == n_mel, (stem, d.sum(), n_mel)
            np.save(out / f"{stem}_mel.npy",
                    it["mel"].astype(np.float32))
            np.save(out / f"{stem}_duration.npy", d)
            np.save(out / f"{stem}_pitch.npy",
                    pitch[j, 0, :n_text].astype(np.float32))
            np.save(out / f"{stem}_energy.npy",
                    energy[j, :n_text].astype(np.float32))
            lines.append(f"{stem}|{text_field}")
        print(f"aligned {len(lines)}/{len(ds)}", flush=True)
    (out / f"{args.split}.txt").write_text("\n".join(lines) + "\n")
    print(f"wrote {out / (args.split + '.txt')}")


if __name__ == "__main__":
    main()
