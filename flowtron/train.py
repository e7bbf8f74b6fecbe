"""Flowtron training CLI (reference surface: ``Flowtron_TF/train.py`` with
``config.json`` — train/data/model sections, 1e-4 Adam, sigma 1.0, gate
loss; the reference's flow steps are stubs, this trains the complete flow).

Usage:
  python flowtron/train.py -o out/flowtron -d out/feats \
      --training-files filelists/ljs_audio_text_train.txt --epochs 1000
"""

import argparse
import json
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-c", "--config", default=None,
                   help="JSON config with model_config keys "
                        "(reference Flowtron_TF/config.json)")
    p.add_argument("-o", "--output", required=True)
    p.add_argument("-d", "--dataset-path", required=True)
    p.add_argument("--training-files", required=True)
    p.add_argument("--validation-files", default=None)
    p.add_argument("--epochs", type=int, default=1000)
    p.add_argument("-lr", "--learning-rate", type=float, default=1e-4)
    p.add_argument("-bs", "--batch-size", type=int, default=6)
    p.add_argument("--sigma", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--amp", action="store_true",
                   help="bfloat16 compute (TPU mixed precision)")
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
    from neuraltexttospeech_tpu.models.flowtron import (
        Flowtron, FlowtronConfig, flowtron_loss,
    )
    from neuraltexttospeech_tpu.train.harness import Trainer, TrainerConfig
    from neuraltexttospeech_tpu.train.state import (
        OptimizerConfig, TrainState, make_optimizer,
    )

    model_kw = {}
    if args.config:
        raw = json.load(open(args.config)).get("model_config", {})
        keys = set(FlowtronConfig.__dataclass_fields__)
        model_kw = {k: v for k, v in raw.items() if k in keys}
    if args.amp:
        model_kw["dtype"] = jnp.bfloat16
    config = FlowtronConfig(**model_kw)
    from neuraltexttospeech_tpu.models.registry import save_model_config
    save_model_config(args.output, "Flowtron", config)
    model = Flowtron(config)

    ds = FastPitchDataset(
        args.dataset_path, args.training_files,
        text_cleaners=["english_cleaners"], p_arpabet=0.0,
        with_pitch=False, with_prior=False,
        n_speakers=config.n_speakers,
    )
    val_ds = (FastPitchDataset(
        args.dataset_path, args.validation_files,
        text_cleaners=["english_cleaners"], p_arpabet=0.0,
        with_pitch=False, with_prior=False,
        n_speakers=config.n_speakers,
    ) if args.validation_files else None)

    def gate_tgt(mel_lens, T):
        pos = jnp.arange(T)[None, :]
        return (pos >= (mel_lens[:, None] - 1)).astype(jnp.float32)

    def loss_fn(params, batch, rng):
        out = model.apply(
            params, batch["mel"], batch["speaker"], batch["text"],
            batch["input_lens"], batch["mel_lens"], deterministic=False,
            rngs={"dropout": rng})
        return flowtron_loss(out, batch["mel_lens"],
                             gate_tgt(batch["mel_lens"],
                                      batch["mel"].shape[1]),
                             sigma=args.sigma)

    first = next(ds.batches(min(2, len(ds)), shuffle=False, max_batches=1))
    params = jax.jit(lambda k: model.init(
        {"params": k, "dropout": jax.random.fold_in(k, 1)},
        jnp.asarray(first["mel"]), jnp.asarray(first["speaker"]),
        jnp.asarray(first["text"]), jnp.asarray(first["input_lens"]),
        jnp.asarray(first["mel_lens"])))(jax.random.PRNGKey(args.seed))
    print(f"Flowtron: {sum(p.size for p in jax.tree.leaves(params))/1e6:.1f}M "
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
        means = trainer.fit_epoch(
            ds.batches(args.batch_size, seed=args.seed + epoch,
                       max_batches=args.steps_per_epoch), epoch=epoch)
        print(f"epoch {epoch}: " +
              " ".join(f"{k}={v:.4f}" for k, v in sorted(means.items())))
        if val_ds is not None:
            val = trainer.evaluate(
                loss_fn, val_ds.batches(args.batch_size, shuffle=False,
                                        drop_last=False))
            print(f"epoch {epoch} val: " +
                  " ".join(f"{k}={v:.4f}" for k, v in sorted(val.items())))
        if (epoch + 1) % max(args.epochs_per_checkpoint, 1) == 0:
            trainer.save()
    trainer.save()
    print("done")


if __name__ == "__main__":
    main()
