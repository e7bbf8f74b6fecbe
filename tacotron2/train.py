"""Tacotron 2 training CLI (reference surface: ``Tacotron2_TF/train.py`` +
``hparams.py`` — Adam 1e-3, weight decay 1e-6, grad clip 1.0, batch 64).

Usage:
  python tacotron2/train.py -o out/tacotron2 -d out/feats \
      --training-files filelists/ljs_audio_text_train.txt --epochs 500
"""

import argparse
import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-o", "--output", required=True)
    p.add_argument("-d", "--dataset-path", required=True)
    p.add_argument("--training-files", required=True)
    p.add_argument("--validation-files", default=None)
    p.add_argument("--epochs", type=int, default=500)
    p.add_argument("-lr", "--learning-rate", type=float, default=1e-3)
    p.add_argument("-bs", "--batch-size", type=int, default=64)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--iters-per-checkpoint", type=int, default=1000)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--epochs-per-checkpoint", type=int, default=1)
    p.add_argument("--steps-per-epoch", type=int, default=None)
    p.add_argument("--text-cleaners", nargs="*", default=["english_cleaners"])
    p.add_argument("--n-symbols", type=int, default=148)
    p.add_argument("--override", action="append", default=[],
                   help="config override key=value (repeatable, dotted keys)")
    p.add_argument("--amp", action="store_true",
                   help="bfloat16 compute (TPU mixed precision)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from neuraltexttospeech_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax

    from neuraltexttospeech_tpu.data.dataset import FastPitchDataset
    from neuraltexttospeech_tpu.models.tacotron2 import Tacotron2Config
    from neuraltexttospeech_tpu.models.tacotron2_train import (
        init_tacotron2, tacotron2_train_step,
    )
    from neuraltexttospeech_tpu.train.checkpoint import Checkpointer

    ds = FastPitchDataset(
        args.dataset_path, args.training_files,
        text_cleaners=args.text_cleaners, p_arpabet=0.0,
        with_pitch=False, with_prior=False,
    )
    from neuraltexttospeech_tpu.models.registry import (
        apply_overrides, save_model_config,
    )

    import jax.numpy as jnp

    config = apply_overrides(
        Tacotron2Config(n_symbols=args.n_symbols,
                        dtype=jnp.bfloat16 if args.amp else None),
        args.override)
    save_model_config(args.output, "Tacotron2", config)
    state = init_tacotron2(config, jax.random.PRNGKey(args.seed),
                           learning_rate=args.learning_rate)
    n_params = sum(p.size for p in jax.tree.leaves(state.params))
    print(f"Tacotron2: {n_params/1e6:.1f}M params, {len(ds)} items")

    ckpt = Checkpointer(str(pathlib.Path(args.output) / "checkpoints"),
                        save_interval_steps=args.iters_per_checkpoint)
    if args.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        print(f"resumed at step {int(state.step)}")

    rng = jax.random.PRNGKey(args.seed)
    for epoch in range(args.epochs):
        t0, n = time.perf_counter(), 0
        for batch in ds.batches(args.batch_size, seed=args.seed + epoch,
                                max_batches=args.steps_per_epoch):
            state, meta = tacotron2_train_step(config, state, batch, rng)
            n += 1
            step = int(state.step)
            if step % 100 == 0:
                print(f"epoch {epoch} step {step} " + " ".join(
                    f"{k}={float(v):.4f}" for k, v in sorted(meta.items())))
            ckpt.save(step, state)
        print(f"epoch {epoch}: {n} steps in {time.perf_counter()-t0:.1f}s")
        if (epoch + 1) % max(args.epochs_per_checkpoint, 1) == 0:
            ckpt.save(int(state.step), state, force=True)
    ckpt.save(int(state.step), state, force=True)
    ckpt.close()
    print("done")


if __name__ == "__main__":
    main()
