"""FastSpeech 2 training CLI over the preprocessed (MFA-aligned) features
(reference surface: ``FastSpeech2_TF/train.py`` + ``config/LJSpeech/
{model,train}.yaml``; the reference's dataset/model are stubs — this trains
the full capability).

Usage:
  python fastspeech2/train.py -o out/fs2 -d preprocessed/LJSpeech --epochs 900
"""

import argparse
import json
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-o", "--output", required=True)
    p.add_argument("-d", "--preprocessed-path", required=True)
    p.add_argument("--validation-split", default=None,
                   help="evaluate on <preprocessed>/<split>.txt each epoch")
    p.add_argument("--epochs", type=int, default=900)
    p.add_argument("-lr", "--learning-rate", type=float, default=1e-3)
    p.add_argument("-bs", "--batch-size", type=int, default=16)
    p.add_argument("--warmup-steps", type=int, default=4000)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--amp", action="store_true",
                   help="bfloat16 compute (TPU mixed precision)")
    p.add_argument("--epochs-per-checkpoint", type=int, default=1)
    p.add_argument("--steps-per-epoch", type=int, default=None)
    p.add_argument("--override", action="append", default=[],
                   help="config override key=value (repeatable, dotted keys)")
    return p.parse_args(argv)


class FS2Dataset:
    """Reads the preprocessed train.txt + per-utterance npys
    (counterpart of the stubbed ``FastSpeech2_TF/dataset.py:12-26``)."""

    def __init__(self, preprocessed_path: str, split: str = "train"):
        from neuraltexttospeech_tpu.text.processing import TextProcessing

        self.root = pathlib.Path(preprocessed_path)
        # Use the front-end the preprocessing run recorded (written by
        # tools/align_from_fastpitch.py) so token ids match the dumped
        # duration rows; directories without a record keep the historical
        # defaults.
        fe = {}
        fe_path = self.root / "frontend.json"
        if fe_path.exists():
            fe = json.loads(fe_path.read_text())
        self.frontend = {
            "symbol_set": fe.get("symbol_set", "english_basic"),
            "text_cleaners": list(fe.get("text_cleaners",
                                         ["english_cleaners"])),
            "p_arpabet": fe.get("p_arpabet", 1.0),
        }
        self.tp = TextProcessing(
            self.frontend["symbol_set"], self.frontend["text_cleaners"],
            p_arpabet=self.frontend["p_arpabet"])
        self.entries = []
        for line in (self.root / f"{split}.txt").read_text().splitlines():
            parts = line.split("|")
            if len(parts) >= 2:
                self.entries.append((parts[0], parts[1]))

    def __len__(self):
        return len(self.entries)

    def __getitem__(self, i):
        utt, phones = self.entries[i]
        text = np.asarray(self.tp.encode_text(phones), np.int32)
        mel = np.load(self.root / f"{utt}_mel.npy")
        dur = np.load(self.root / f"{utt}_duration.npy").astype(np.float32)
        pitch = np.load(self.root / f"{utt}_pitch.npy").astype(np.float32)
        energy = np.load(self.root / f"{utt}_energy.npy").astype(np.float32)
        n = min(len(text), len(dur))
        return dict(text=text[:n], mel=mel, dur=dur[:n], pitch=pitch[:n],
                    energy=energy[:n])

    def batches(self, batch_size, *, shuffle=True, seed=0, max_batches=None,
                drop_last=True):
        from neuraltexttospeech_tpu.data.dataset import pad_to, round_up

        order = np.arange(len(self))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        count = 0
        stop = len(order) - batch_size + 1 if drop_last else len(order)
        for s in range(0, max(stop, 0), batch_size):
            if max_batches is not None and count >= max_batches:
                return
            items = [self[j] for j in order[s : s + batch_size]]
            T_text = round_up(max(len(it["text"]) for it in items), 8)
            T_mel = round_up(max(it["mel"].shape[0] for it in items), 32)
            yield {
                "text": np.stack([pad_to(it["text"], T_text) for it in items]),
                "input_lens": np.asarray([len(it["text"]) for it in items],
                                         np.int32),
                "mel": np.stack([pad_to(it["mel"], T_mel) for it in items]),
                "mel_lens": np.asarray([it["mel"].shape[0] for it in items],
                                       np.int32),
                "dur": np.stack([pad_to(it["dur"], T_text) for it in items]),
                "pitch": np.stack([pad_to(it["pitch"], T_text)
                                   for it in items]),
                "energy": np.stack([pad_to(it["energy"], T_text)
                                    for it in items]),
            }
            count += 1


def main(argv=None):
    args = parse_args(argv)
    from neuraltexttospeech_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from neuraltexttospeech_tpu.models.fastspeech2 import (
        FastSpeech2, FastSpeech2Config, fastspeech2_loss,
    )
    from neuraltexttospeech_tpu.train.harness import Trainer, TrainerConfig
    from neuraltexttospeech_tpu.train.state import (
        OptimizerConfig, TrainState, make_optimizer,
    )

    ds = FS2Dataset(args.preprocessed_path)
    val_ds = (FS2Dataset(args.preprocessed_path, split=args.validation_split)
              if args.validation_split else None)
    stats_path = pathlib.Path(args.preprocessed_path) / "stats.json"
    kw = {}
    if stats_path.exists():
        stats = json.load(open(stats_path))
        kw = {k: stats[k] for k in ("pitch_min", "pitch_max", "energy_min",
                                    "energy_max") if k in stats}
    from neuraltexttospeech_tpu.models.registry import (
        apply_overrides, save_model_config,
    )

    if args.amp:
        kw["dtype"] = jnp.bfloat16
    config = apply_overrides(FastSpeech2Config(**kw), args.override)
    save_model_config(args.output, "FastSpeech2", config,
                      frontend=ds.frontend)
    model = FastSpeech2(config)

    def loss_fn(params, batch, rng):
        out = model.apply(
            params, batch["text"], batch["input_lens"],
            mel_max_len=batch["mel"].shape[1], dur_tgt=batch["dur"],
            pitch_tgt=batch["pitch"], energy_tgt=batch["energy"],
            deterministic=False, rngs={"dropout": rng})
        return fastspeech2_loss(out, batch["mel"], batch["dur"],
                                batch["pitch"], batch["energy"],
                                batch["input_lens"], batch["mel_lens"])

    first = next(ds.batches(min(2, len(ds)), shuffle=False, max_batches=1))
    params = jax.jit(lambda k: model.init(
        {"params": k, "dropout": jax.random.fold_in(k, 1)},
        jnp.asarray(first["text"]), jnp.asarray(first["input_lens"]),
        mel_max_len=first["mel"].shape[1], dur_tgt=jnp.asarray(first["dur"]),
        pitch_tgt=jnp.asarray(first["pitch"]),
        energy_tgt=jnp.asarray(first["energy"])))(
        jax.random.PRNGKey(args.seed))
    print(f"FastSpeech2: {sum(p.size for p in jax.tree.leaves(params))/1e6:.1f}M "
          f"params, {len(ds)} items")

    opt_cfg = OptimizerConfig(learning_rate=args.learning_rate,
                              schedule="noam", warmup_steps=args.warmup_steps,
                              grad_clip_norm=1.0, beta2=0.98, eps=1e-9)
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
