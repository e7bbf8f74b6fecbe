"""DiffWave training CLI.

Mirrors the reference surface (``DiffWave_TF/train.py``: params.py config,
random 62-frame mel crops with aligned audio, L1 noise-prediction loss,
per-epoch checkpointing with resume, optional multi-device) on the shared
pjit harness — data parallelism is the same jitted step on a device mesh for
any number of chips, replacing ``distribute_train``'s MirroredStrategy fork
(``train.py:336-613``).

Usage:
  python diffwave/train.py -o out/diffwave \
      --training-files filelists/ljs_audio_text_train.txt --epochs 100
"""

import argparse
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--training-files", required=True)
    p.add_argument("--validation-files", default=None)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("-lr", "--learning-rate", type=float, default=2e-4)
    p.add_argument("--max-grad-norm", type=float, default=None)
    p.add_argument("--crop-mel-frames", type=int, default=62)
    p.add_argument("--residual-layers", type=int, default=30)
    p.add_argument("--residual-channels", type=int, default=64)
    p.add_argument("--unconditional", action="store_true")
    p.add_argument("--amp", action="store_true",
                   help="bfloat16 compute (TPU mixed precision)")
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--checkpoint-every-steps", type=int, default=1000)
    p.add_argument("--epochs-per-checkpoint", type=int, default=1)
    p.add_argument("--resume", action="store_true",
                   help="resume from latest checkpoint (reference "
                        "--resume_training)")
    p.add_argument("--steps-per-epoch", type=int, default=None)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from neuraltexttospeech_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from neuraltexttospeech_tpu.data.mel_dataset import VocoderDataset
    from neuraltexttospeech_tpu.data.prefetch import prefetch
    from neuraltexttospeech_tpu.models.diffwave import (
        DiffWave, DiffWaveConfig, diffwave_loss,
    )
    from neuraltexttospeech_tpu.train.harness import Trainer, TrainerConfig
    from neuraltexttospeech_tpu.train.state import (
        OptimizerConfig, TrainState, make_optimizer,
    )

    config = DiffWaveConfig(
        crop_mel_frames=args.crop_mel_frames,
        residual_layers=args.residual_layers,
        residual_channels=args.residual_channels,
        unconditional=args.unconditional,
        learning_rate=args.learning_rate,
        max_grad_norm=args.max_grad_norm,
        dtype=jnp.bfloat16 if args.amp else None,
    )
    from neuraltexttospeech_tpu.models.registry import save_model_config
    save_model_config(args.output, "DiffWave", config)
    model = DiffWave(config)
    segment = config.crop_mel_frames * config.hop_length
    ds = VocoderDataset(
        args.training_files, segment_size=segment,
        hop_size=config.hop_length, num_mels=config.n_mels,
        sampling_rate=config.sample_rate, seed=args.seed,
    )
    val_ds = (VocoderDataset(
        args.validation_files, segment_size=segment,
        hop_size=config.hop_length, num_mels=config.n_mels,
        sampling_rate=config.sample_rate, seed=args.seed + 1,
    ) if args.validation_files else None)

    def loss_fn(params, batch, rng):
        b = {"audio": batch["audio"][..., 0],
             "mel": None if config.unconditional else batch["mel"]}
        return diffwave_loss(model, params, b, rng)

    B, F = 2, config.crop_mel_frames
    params = jax.jit(lambda k: model.init(
        k, jnp.zeros((B, F * config.hop_length)), jnp.zeros((B,), jnp.int32),
        None if config.unconditional else jnp.zeros((B, F, config.n_mels))))(
        jax.random.PRNGKey(args.seed))
    print(f"DiffWave: {sum(p.size for p in jax.tree.leaves(params))/1e6:.1f}M "
          f"params, {len(ds)} clips, {jax.device_count()} devices")

    opt_cfg = OptimizerConfig(
        learning_rate=args.learning_rate,
        grad_clip_norm=args.max_grad_norm, beta1=0.9, beta2=0.999, eps=1e-8)
    trainer = Trainer(
        loss_fn, TrainState.create(params, make_optimizer(opt_cfg)),
        TrainerConfig(
            optimizer=opt_cfg, seed=args.seed,
            checkpoint_dir=str(pathlib.Path(args.output) / "checkpoints"),
            checkpoint_every=args.checkpoint_every_steps,
            tensorboard_dir=str(pathlib.Path(args.output) / "tb"),
        ))
    if args.resume:
        start = trainer.resume()
        print(f"resumed at step {start}")

    for epoch in range(args.epochs):
        means = trainer.fit_epoch(
            prefetch(ds.batches(args.batch_size, seed=args.seed + epoch,
                       max_batches=args.steps_per_epoch)),
            epoch=epoch)
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
