"""Dump teacher-aligned (ground-truth-aligned) mels for vocoder fine-tuning.

The reference's HiFi-GAN fine-tuning path trains the vocoder on mels
*predicted by the acoustic model* instead of ground-truth mels
(``HiFiGAN_TF/data.py`` fine-tuning branch reads Tacotron2-generated
``.npy`` files). This tool produces those files: it runs a trained
FastPitch (teacher-forced through MAS alignment) or Tacotron 2
(teacher-forced decode) over a filelist and writes ``<wav-stem>_mel.npy``
per utterance — exactly the names ``hifigan/train.py
--fine-tuning-mel-dir`` expects.

Usage:
  python tools/dump_mels.py --model fastpitch \
      --checkpoint out/fastpitch/checkpoints -d feats \
      --training-files filelists/ljs_audio_text_train_v3.txt -o gen_mels
"""

import argparse
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", choices=["fastpitch", "tacotron2"],
                   default="fastpitch")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("-d", "--dataset-path", required=True,
                   help="feature cache dir (from prepare_dataset.py)")
    p.add_argument("--training-files", required=True)
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--n-speakers", type=int, default=1)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp

    from neuraltexttospeech_tpu.data.dataset import FastPitchDataset

    out_dir = pathlib.Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)

    if args.model == "fastpitch":
        from fastpitch.inference import load_fastpitch
        from neuraltexttospeech_tpu.models.registry import (
            find_model_config, load_model_config)
        config = (load_model_config(args.checkpoint)[1]
                  if find_model_config(args.checkpoint) else None)
        model, params = load_fastpitch(args.checkpoint, config)
        ds = FastPitchDataset(args.dataset_path, args.training_files,
                              n_speakers=args.n_speakers)

        @jax.jit
        def forward(params, batch):
            out = model.apply(
                params, batch["text"], batch["input_lens"], batch["mel"],
                batch["mel_lens"], batch["pitch"], batch.get("energy"),
                batch.get("speaker_in"), batch["attn_prior"])
            return out.mel_out
    else:
        import dataclasses

        from neuraltexttospeech_tpu.models.registry import (
            find_model_config, load_model_config)
        from neuraltexttospeech_tpu.models.tacotron2 import (
            Tacotron2, Tacotron2Config)
        from neuraltexttospeech_tpu.models.tacotron2_train import (
            init_tacotron2)
        from neuraltexttospeech_tpu.train.checkpoint import Checkpointer

        config = (load_model_config(args.checkpoint)[1]
                  if find_model_config(args.checkpoint)
                  else Tacotron2Config())
        state = init_tacotron2(config, jax.random.PRNGKey(0))
        state = Checkpointer(args.checkpoint).restore(state)
        model = Tacotron2(config)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        ds = FastPitchDataset(args.dataset_path, args.training_files,
                              n_speakers=args.n_speakers,
                              with_pitch=False, with_prior=False)

        @jax.jit
        def forward(variables, batch):
            out = model.apply(variables, batch["text"], batch["input_lens"],
                              batch["mel"], batch["mel_lens"])
            return out.mel_post

    weights = params if args.model == "fastpitch" else variables
    n_done = 0
    for start in range(0, len(ds), args.batch_size):
        idxs = list(range(start, min(start + args.batch_size, len(ds))))
        items = [ds[i] for i in idxs]
        batch = FastPitchDataset.collate(items)
        if args.n_speakers > 1:
            batch["speaker_in"] = batch["speaker"]
        mel_out = np.asarray(forward(weights, {
            k: jnp.asarray(v) for k, v in batch.items()
            if isinstance(v, np.ndarray)}))
        for j, it in enumerate(items):
            n = int(batch["mel_lens"][j])
            stem = pathlib.Path(it["audiopath"]).name.replace(".wav", "")
            np.save(out_dir / f"{stem}_mel.npy",
                    mel_out[j, :n].astype(np.float32))
        n_done += len(items)
        print(f"dumped {n_done}/{len(ds)}", flush=True)


if __name__ == "__main__":
    main()
