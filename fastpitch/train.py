"""FastPitch training CLI.

Mirrors the reference surface (``FastPitch_TF/train.py:30-152`` argparse
groups + ``arg_parser.py`` model flags) on top of the shared pjit harness:
one data-parallel jitted step, orbax checkpoint/resume, TensorBoard metrics.

Usage:
  python fastpitch/train.py -o out/fastpitch -d out/feats \
      --training-files filelists/ljs_audio_text_train.txt \
      --validation-files filelists/ljs_audio_text_val.txt \
      --epochs 100 -lr 1e-4 -bs 16
"""

import argparse
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    io = p.add_argument_group("io")
    io.add_argument("-o", "--output", required=True)
    io.add_argument("-d", "--dataset-path", required=True)
    io.add_argument("--training-files", required=True)
    io.add_argument("--validation-files", default=None)
    io.add_argument("--log-file", default=None)

    tr = p.add_argument_group("training")
    tr.add_argument("--epochs", type=int, default=100)
    tr.add_argument("-lr", "--learning-rate", type=float, default=1e-4)
    tr.add_argument("-bs", "--batch-size", type=int, default=16)
    tr.add_argument("--optimizer", default="adam", choices=["adam", "adamw", "lamb"])
    tr.add_argument("--grad-clip-thresh", type=float, default=1000.0)
    tr.add_argument("--gradient-accumulation-steps", type=int, default=1)
    tr.add_argument("--warmup-steps", type=int, default=1000)
    tr.add_argument("--seed", type=int, default=1234)
    tr.add_argument("--epochs-per-checkpoint", type=int, default=1)
    tr.add_argument("--resume", action="store_true",
                    help="resume from the latest checkpoint in --output")
    tr.add_argument("--amp", action="store_true",
                    help="bfloat16 compute (TPU mixed precision)")
    tr.add_argument("--steps-per-epoch", type=int, default=None,
                    help="cap batches per epoch (smoke runs)")

    ds = p.add_argument_group("dataset")
    ds.add_argument("--host-prior", action="store_true",
                    help="ship scipy-precomputed beta-binomial priors with "
                         "each batch (the reference pipeline) instead of "
                         "recomputing them on device from the length "
                         "vectors — the prior is the batch's largest "
                         "tensor, so the default saves most of the "
                         "host->device transfer (PERF.md round 5)")
    ds.add_argument("--text-cleaners", nargs="*", default=["english_cleaners_v2"])
    ds.add_argument("--symbol-set", default="english_basic")
    ds.add_argument("--p-arpabet", type=float, default=1.0)
    ds.add_argument("--n-speakers", type=int, default=1)

    m = p.add_argument_group("model (reference arg_parser.py defaults)")
    m.add_argument("--n-mel-channels", type=int, default=80)
    m.add_argument("--n-symbols", type=int, default=148)
    m.add_argument("--symbols-embedding-dim", type=int, default=384)
    m.add_argument("--in-fft-n-layers", type=int, default=6)
    m.add_argument("--out-fft-n-layers", type=int, default=6)
    m.add_argument("--energy-conditioning", action="store_true", default=True)
    m.add_argument("--no-energy-conditioning", dest="energy_conditioning",
                   action="store_false")

    loss = p.add_argument_group("loss scales")
    loss.add_argument("--dur-predictor-loss-scale", type=float, default=0.1)
    loss.add_argument("--pitch-predictor-loss-scale", type=float, default=0.1)
    loss.add_argument("--attn-loss-scale", type=float, default=1.0)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from neuraltexttospeech_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp

    from neuraltexttospeech_tpu.data.dataset import FastPitchDataset
    from neuraltexttospeech_tpu.models.fastpitch import FastPitch, FastPitchConfig
    from neuraltexttospeech_tpu.models.fastpitch_loss import (
        FastPitchLossConfig, fastpitch_loss,
    )
    from neuraltexttospeech_tpu.train.harness import Trainer, TrainerConfig
    from neuraltexttospeech_tpu.train.state import (
        OptimizerConfig, TrainState, make_optimizer,
    )

    train_ds = FastPitchDataset(
        args.dataset_path, args.training_files,
        text_cleaners=args.text_cleaners, symbol_set=args.symbol_set,
        p_arpabet=args.p_arpabet, n_speakers=args.n_speakers,
        n_mel_channels=args.n_mel_channels, with_prior=args.host_prior,
    )
    val_ds = (FastPitchDataset(
        args.dataset_path, args.validation_files,
        text_cleaners=args.text_cleaners, symbol_set=args.symbol_set,
        p_arpabet=args.p_arpabet, n_speakers=args.n_speakers,
        n_mel_channels=args.n_mel_channels, with_prior=args.host_prior,
    ) if args.validation_files else None)

    config = FastPitchConfig(
        n_mel_channels=args.n_mel_channels, n_symbols=args.n_symbols,
        symbols_embedding_dim=args.symbols_embedding_dim,
        in_fft_n_layers=args.in_fft_n_layers,
        out_fft_n_layers=args.out_fft_n_layers,
        energy_conditioning=args.energy_conditioning,
        n_speakers=args.n_speakers,
        dtype=jnp.bfloat16 if args.amp else None,
    )
    from neuraltexttospeech_tpu.models.registry import save_model_config
    save_model_config(args.output, "FastPitch", config, frontend={
        "text_cleaners": list(args.text_cleaners),
        "symbol_set": args.symbol_set, "p_arpabet": args.p_arpabet})
    model = FastPitch(config)
    loss_cfg = FastPitchLossConfig(
        dur_predictor_loss_scale=args.dur_predictor_loss_scale,
        pitch_predictor_loss_scale=args.pitch_predictor_loss_scale,
        attn_loss_scale=args.attn_loss_scale,
    )

    from neuraltexttospeech_tpu.ops.prior import beta_binomial_prior

    def _prior(batch):
        # Device path (default): the [B, T_mel, T_text] beta-binomial
        # prior is a pure function of the two length vectors, so compute
        # it inside the jitted step instead of shipping the batch's
        # largest tensor over the host→device link (ops/prior.py; scipy
        # parity in tests/test_misc.py). --host-prior restores the
        # reference's precomputed-npy pipeline.
        if "attn_prior" in batch:
            return batch["attn_prior"]
        return beta_binomial_prior(batch["mel_lens"], batch["input_lens"],
                                   batch["mel"].shape[1],
                                   batch["text"].shape[1])

    def loss_fn(params, batch, rng):
        out = model.apply(
            params, batch["text"], batch["input_lens"], batch["mel"],
            batch["mel_lens"], batch["pitch"], batch["energy"],
            batch["speaker"] if args.n_speakers > 1 else None,
            _prior(batch), deterministic=False,
            rngs={"dropout": rng})
        return fastpitch_loss(out, batch["mel"], batch["input_lens"],
                              batch["mel_lens"], loss_cfg)

    # Init on one small batch.
    first = next(train_ds.batches(min(args.batch_size, 2), shuffle=False,
                                  max_batches=1))
    params = jax.jit(lambda: model.init(
        jax.random.PRNGKey(args.seed),
        first["text"], first["input_lens"], first["mel"], first["mel_lens"],
        first["pitch"], first["energy"],
        first["speaker"] if args.n_speakers > 1 else None,
        _prior(first)))()
    n_params = sum(p.size for p in jax.tree.leaves(params))
    print(f"FastPitch: {n_params/1e6:.1f}M params, "
          f"{len(train_ds)} train items, {jax.device_count()} devices")

    opt_cfg = OptimizerConfig(
        optimizer=args.optimizer, learning_rate=args.learning_rate,
        grad_clip_norm=args.grad_clip_thresh,
        grad_accum_steps=args.gradient_accumulation_steps,
        schedule="noam", warmup_steps=args.warmup_steps,
    )
    trainer = Trainer(
        loss_fn, TrainState.create(params, make_optimizer(opt_cfg)),
        TrainerConfig(
            optimizer=opt_cfg, seed=args.seed,
            checkpoint_dir=str(pathlib.Path(args.output) / "checkpoints"),
            tensorboard_dir=str(pathlib.Path(args.output) / "tb"),
        ))
    start = trainer.resume() if args.resume else 0
    if start:
        print(f"resumed at step {start}")

    for epoch in range(args.epochs):
        # device_iter: collation AND host→device transfer run in the
        # producer thread, overlapping the in-flight step
        means = trainer.fit_epoch(
            trainer.device_iter(
                train_ds.batches(args.batch_size, seed=args.seed + epoch,
                                 max_batches=args.steps_per_epoch)),
            epoch=epoch)
        print(f"epoch {epoch}: " +
              " ".join(f"{k}={v:.4f}" for k, v in sorted(means.items())))
        if val_ds is not None:
            val = trainer.evaluate(
                lambda p, b, r: loss_fn(p, b, r),
                val_ds.batches(args.batch_size, shuffle=False,
                               drop_last=False))
            print(f"epoch {epoch} val: " +
                  " ".join(f"{k}={v:.4f}" for k, v in sorted(val.items())))
        if (epoch + 1) % max(args.epochs_per_checkpoint, 1) == 0:
            trainer.save()
    trainer.save()
    print("done")


if __name__ == "__main__":
    main()
