"""Grad-TTS training CLI (reference surface: ``Grad-TTS_TF/train.py`` with
``params.py`` — Adam 1e-4, batch 16, blank-interspersed text, 2-second
``out_size`` segment loss).

Usage:
  python gradtts/train.py -o out/gradtts -d out/feats \
      --training-files filelists/ljs_audio_text_train.txt --epochs 10000
"""

import argparse
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-o", "--output", required=True)
    p.add_argument("-d", "--dataset-path", required=True)
    p.add_argument("--training-files", required=True)
    p.add_argument("--validation-files", default=None)
    p.add_argument("--epochs", type=int, default=10000)
    p.add_argument("-lr", "--learning-rate", type=float, default=1e-4)
    p.add_argument("-bs", "--batch-size", type=int, default=16)
    p.add_argument("--seed", type=int, default=37)
    p.add_argument("--out-size", type=int, default=172)
    p.add_argument("--n-enc-layers", type=int, default=6)
    p.add_argument("--n-enc-channels", type=int, default=192)
    p.add_argument("--dec-dim", type=int, default=64)
    p.add_argument("--no-blank", dest="add_blank", action="store_false")
    p.add_argument("--amp", action="store_true",
                   help="bfloat16 compute (TPU mixed precision)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--epochs-per-checkpoint", type=int, default=1)
    p.add_argument("--steps-per-epoch", type=int, default=None)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from neuraltexttospeech_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from neuraltexttospeech_tpu.data.dataset import FastPitchDataset
    from neuraltexttospeech_tpu.data.prefetch import prefetch
    from neuraltexttospeech_tpu.models.gradtts import GradTTS, GradTTSConfig
    from neuraltexttospeech_tpu.text.processing import intersperse
    from neuraltexttospeech_tpu.train.harness import Trainer, TrainerConfig
    from neuraltexttospeech_tpu.train.state import (
        OptimizerConfig, TrainState, make_optimizer,
    )

    ds = FastPitchDataset(
        args.dataset_path, args.training_files,
        text_cleaners=["english_cleaners"], p_arpabet=0.0,
        with_pitch=False, with_prior=False,
    )
    val_ds = (FastPitchDataset(
        args.dataset_path, args.validation_files,
        text_cleaners=["english_cleaners"], p_arpabet=0.0,
        with_pitch=False, with_prior=False,
    ) if args.validation_files else None)
    n_base_symbols = 148
    config = GradTTSConfig(
        n_symbols=n_base_symbols + (1 if args.add_blank else 0),
        out_size=args.out_size, learning_rate=args.learning_rate,
        n_enc_layers=args.n_enc_layers, n_enc_channels=args.n_enc_channels,
        dec_dim=args.dec_dim,
        dtype=jnp.bfloat16 if args.amp else None)
    from neuraltexttospeech_tpu.models.registry import save_model_config
    save_model_config(args.output, "GradTTS", config)
    model = GradTTS(config)
    blank_id = n_base_symbols  # blank token id = len(symbols)
    # (reference ``Grad-TTS_TF/utils.py:9-13`` intersperse)

    def prep_batch(batch):
        if args.add_blank:
            texts = []
            for row, n in zip(batch["text"], batch["input_lens"]):
                ids = intersperse(list(row[:n]), blank_id)
                texts.append(ids)
            T = max(len(t) for t in texts)
            T = ((T + 15) // 16) * 16
            text = np.zeros((len(texts), T), np.int32)
            for i, t in enumerate(texts):
                text[i, : len(t)] = t
            batch = dict(batch)
            batch["text"] = text
            batch["input_lens"] = np.asarray([len(t) for t in texts],
                                             np.int32)
        return batch

    def loss_fn(params, batch, rng):
        dur, prior, diff = model.apply(
            params, batch["text"], batch["input_lens"], batch["mel"],
            batch["mel_lens"], rng, out_size=args.out_size,
            method=GradTTS.compute_loss, rngs={"dropout": rng})
        loss = dur + prior + diff
        return loss, {"dur_loss": dur, "prior_loss": prior,
                      "diff_loss": diff}

    first = prep_batch(next(ds.batches(min(2, len(ds)), shuffle=False, max_batches=1,
                                       mel_pad_multiple=32)))
    params = jax.jit(lambda k: model.init(
        {"params": k, "dropout": jax.random.fold_in(k, 1)},
        jnp.asarray(first["text"]), jnp.asarray(first["input_lens"]),
        jnp.asarray(first["mel"]), jnp.asarray(first["mel_lens"]),
        jax.random.fold_in(k, 2), out_size=args.out_size,
        method=GradTTS.compute_loss))(jax.random.PRNGKey(args.seed))
    print(f"GradTTS: {sum(p.size for p in jax.tree.leaves(params))/1e6:.1f}M "
          f"params, {len(ds)} items")

    opt_cfg = OptimizerConfig(learning_rate=args.learning_rate,
                              grad_clip_norm=1.0, beta2=0.999, eps=1e-8)
    trainer = Trainer(
        loss_fn, TrainState.create(params, make_optimizer(opt_cfg)),
        TrainerConfig(
            optimizer=opt_cfg, seed=args.seed,
            checkpoint_dir=str(pathlib.Path(args.output) / "checkpoints"),
            tensorboard_dir=str(pathlib.Path(args.output) / "tb"),
        ))
    if args.resume:
        print(f"resumed at step {trainer.resume()}")

    for epoch in range(args.epochs):
        batches = (prep_batch(b) for b in ds.batches(
            args.batch_size, seed=args.seed + epoch,
            max_batches=args.steps_per_epoch))
        means = trainer.fit_epoch(prefetch(batches), epoch=epoch)
        print(f"epoch {epoch}: " +
              " ".join(f"{k}={v:.4f}" for k, v in sorted(means.items())))
        if val_ds is not None:
            val = trainer.evaluate(
                loss_fn,
                (prep_batch(b) for b in
                 val_ds.batches(args.batch_size, shuffle=False,
                                drop_last=False)))
            print(f"epoch {epoch} val: " +
                  " ".join(f"{k}={v:.4f}" for k, v in sorted(val.items())))
        if (epoch + 1) % max(args.epochs_per_checkpoint, 1) == 0:
            trainer.save()
    trainer.save()
    print("done")


if __name__ == "__main__":
    main()
