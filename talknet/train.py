"""TalkNet 2 training CLI — trains one of the pipeline's models:
``asr`` (QuartzNet CTC, reference ``TalkNet_TF/quartznet.py``), or the TTS
heads ``duration`` / ``pitch`` / ``spectrogram`` (the parts the reference
stubs in ``talknet.py``). The TTS heads read MFA-aligned features prepared
by ``fastspeech2/prepare_dataset.py`` (grapheme durations / pitch / mels).

Usage:
  python talknet/train.py --model duration -o out/talknet-dur \
      -d preprocessed/LJSpeech --epochs 100
"""

import argparse
import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True,
                   choices=["asr", "duration", "pitch", "spectrogram"])
    p.add_argument("-o", "--output", required=True)
    p.add_argument("-d", "--preprocessed-path", required=True,
                   help="fastspeech2-preprocessed dir (TTS heads) or "
                        "filelist (asr)")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("-lr", "--learning-rate", type=float, default=1e-3)
    p.add_argument("-bs", "--batch-size", type=int, default=32)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--steps-per-epoch", type=int, default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--amp", action="store_true",
                   help="bfloat16 compute (TPU mixed precision)")
    p.add_argument("--epochs-per-checkpoint", type=int, default=1)
    p.add_argument("--override", action="append", default=[],
                   help="config override key=value (repeatable, dotted keys "
                        "e.g. backbone.module_repeat=1)")
    return p.parse_args(argv)


def _train_asr(args):
    """QuartzNet CTC ASR over a ``wav|transcript`` filelist (reference
    ``TalkNet_TF/quartznet.py`` + its CTC loss / greedy decode / WER
    callback). Mels bucketed by length; WER reported each epoch."""
    import jax
    import jax.numpy as jnp
    import optax

    from neuraltexttospeech_tpu.audio.stft import STFT
    from neuraltexttospeech_tpu.data.dataset import pad_to, round_up
    from neuraltexttospeech_tpu.data.filelist import (
        load_filepaths_and_text, load_wav,
    )
    from neuraltexttospeech_tpu.models.talknet import (
        QuartzNet, QuartzNetConfig, StringMap, ctc_loss, greedy_decode,
        word_error_rate,
    )
    from neuraltexttospeech_tpu.train.checkpoint import Checkpointer

    vocab = StringMap()
    stft = STFT()
    entries = load_filepaths_and_text(args.preprocessed_path)

    def item(i):
        wav, text = entries[i][0], entries[i][-1]
        audio, _ = load_wav(wav, 22050)
        mel = np.asarray(stft.mel_spectrogram(audio), np.float32)
        labels = np.asarray(vocab.encode(text), np.int32)
        return mel, labels, text

    def batches(batch_size, seed=0, max_batches=None):
        order = np.arange(len(entries))
        np.random.default_rng(seed).shuffle(order)
        count = 0
        for s in range(0, len(order) - batch_size + 1, batch_size):
            if max_batches is not None and count >= max_batches:
                return
            items = [item(j) for j in order[s : s + batch_size]]
            T = round_up(max(m.shape[0] for m, _, _ in items), 64)
            L = round_up(max(len(l) for _, l, _ in items), 16)
            yield {
                "mel": np.stack([pad_to(m, T) for m, _, _ in items]),
                "mel_lens": np.asarray([m.shape[0] for m, _, _ in items],
                                       np.int32),
                "labels": np.stack([pad_to(l, L) for _, l, _ in items]),
                "label_lens": np.asarray([len(l) for _, l, _ in items],
                                         np.int32),
                "texts": [t for _, _, t in items],
            }
            count += 1

    from neuraltexttospeech_tpu.models.registry import save_model_config

    qn_config = QuartzNetConfig(block_repeat=1, module_repeat=5)
    save_model_config(args.output, "QuartzNet", qn_config)
    model = QuartzNet(len(vocab), qn_config)
    first = next(batches(2))
    variables = jax.jit(lambda k: model.init(
        {"params": k, "dropout": jax.random.fold_in(k, 1)},
        jnp.asarray(first["mel"]), train=True))(
        jax.random.PRNGKey(args.seed))
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adam(args.learning_rate))
    opt_state = tx.init(variables["params"])
    print(f"QuartzNet ASR: "
          f"{sum(p.size for p in jax.tree.leaves(variables['params']))/1e6:.1f}M"
          f" params, {len(entries)} utterances, vocab {len(vocab)}")

    @jax.jit
    def step(variables, opt_state, mel, mel_lens, labels, label_lens, rng):
        def wrapped(params):
            logp, mut = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                mel, train=True, rngs={"dropout": rng},
                mutable=["batch_stats"])
            loss = ctc_loss(logp, mel_lens // 2, labels, label_lens)
            return loss, mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            wrapped, has_aux=True)(variables["params"])
        updates, opt2 = tx.update(grads, opt_state, variables["params"])
        return ({"params": optax.apply_updates(variables["params"], updates),
                 "batch_stats": new_stats}, opt2, loss)

    ckpt = Checkpointer(str(pathlib.Path(args.output) / "checkpoints"))
    step_n = 0
    for epoch in range(args.epochs):
        t0, losses = time.perf_counter(), []
        hyps, refs = [], []
        for b in batches(args.batch_size, seed=args.seed + epoch,
                         max_batches=args.steps_per_epoch):
            rng = jax.random.fold_in(jax.random.PRNGKey(args.seed), step_n)
            variables, opt_state, loss = step(
                variables, opt_state, jnp.asarray(b["mel"]),
                jnp.asarray(b["mel_lens"]), jnp.asarray(b["labels"]),
                jnp.asarray(b["label_lens"]), rng)
            losses.append(float(loss))
            step_n += 1
            # greedy decode for WER (eval-mode forward)
            logp = model.apply(
                {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]},
                jnp.asarray(b["mel"]), train=False)
            for ids, ref in zip(
                    greedy_decode(logp, jnp.asarray(b["mel_lens"]) // 2),
                    b["texts"]):
                hyps.append(vocab.decode(ids))
                refs.append(ref)
        wer = word_error_rate(refs, hyps)
        print(f"epoch {epoch}: ctc={np.mean(losses):.3f} WER={wer:.3f} "
              f"({time.perf_counter()-t0:.1f}s)")
        if (epoch + 1) % max(args.epochs_per_checkpoint, 1) == 0:
            ckpt.save(step_n, variables, force=True)
    ckpt.save(step_n, variables, force=True)
    ckpt.close()
    print("done")


def main(argv=None):
    args = parse_args(argv)
    from neuraltexttospeech_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    if args.model == "asr":
        return _train_asr(args)
    import jax
    import jax.numpy as jnp
    import optax

    from fastspeech2.train import FS2Dataset
    from neuraltexttospeech_tpu.models.talknet import (
        GraphemeDuration, PitchPredictor, SpectrogramModel, TalkNet2Config,
    )
    from neuraltexttospeech_tpu.train.checkpoint import Checkpointer
    from neuraltexttospeech_tpu.utils.masking import mask_from_lens

    from neuraltexttospeech_tpu.models.registry import (
        apply_overrides, save_model_config,
    )

    config = apply_overrides(
        TalkNet2Config(dtype=jnp.bfloat16 if args.amp else None),
        args.override)
    ds = FS2Dataset(args.preprocessed_path)
    save_model_config(args.output, "TalkNet2", config, frontend=ds.frontend)
    rng0 = jax.random.PRNGKey(args.seed)

    if args.model == "duration":
        model = GraphemeDuration(config)

        def init_fn(k, b):
            return model.init(
                {"params": k, "dropout": jax.random.fold_in(k, 1)},
                jnp.asarray(b["text"]), jnp.asarray(b["input_lens"]),
                train=True)

        def loss_fn(variables, b, rng):
            d, mut = model.apply(
                variables, b["text"], b["input_lens"], train=True,
                rngs={"dropout": rng}, mutable=["batch_stats"])
            m = mask_from_lens(b["input_lens"], b["text"].shape[1])
            m = m.astype(jnp.float32)
            loss = jnp.sum(jnp.square(d - b["dur"]) * m) / jnp.maximum(
                jnp.sum(m), 1.0)
            return loss, ({"mse": loss}, mut["batch_stats"])

    elif args.model == "pitch":
        model = PitchPredictor(config)

        def init_fn(k, b):
            return model.init(
                {"params": k, "dropout": jax.random.fold_in(k, 1)},
                jnp.asarray(b["text"]), jnp.asarray(b["dur"]),
                int(b["mel"].shape[1]), train=True)

        def _frame_pitch(b):
            # expand phoneme pitch to frames via durations (targets)
            from neuraltexttospeech_tpu.models.gradtts import generate_path
            m = jnp.ones((b["dur"].shape[0], b["dur"].shape[1],
                          b["mel"].shape[1]))
            path = generate_path(jnp.asarray(b["dur"]), m)
            return jnp.einsum("bxt,bx->bt", path, jnp.asarray(b["pitch"]))

        def loss_fn(variables, b, rng):
            (f0, voiced), mut = model.apply(
                variables, b["text"], b["dur"], int(b["mel"].shape[1]),
                train=True, rngs={"dropout": rng}, mutable=["batch_stats"])
            tgt = _frame_pitch(b)
            m = mask_from_lens(b["mel_lens"], b["mel"].shape[1]).astype(
                jnp.float32)
            f0_loss = jnp.sum(jnp.square(f0 - tgt) * m) / jnp.maximum(
                jnp.sum(m), 1.0)
            v_tgt = (tgt != 0).astype(jnp.float32)
            bce = jnp.mean((jnp.maximum(voiced, 0) - voiced * v_tgt
                            + jnp.log1p(jnp.exp(-jnp.abs(voiced)))) * m)
            loss = f0_loss + bce
            return loss, ({"f0_mse": f0_loss, "voiced_bce": bce},
                          mut["batch_stats"])

    else:  # spectrogram
        model = SpectrogramModel(config)

        def _frame_pitch(b):
            from neuraltexttospeech_tpu.models.gradtts import generate_path
            m = jnp.ones((b["dur"].shape[0], b["dur"].shape[1],
                          b["mel"].shape[1]))
            path = generate_path(jnp.asarray(b["dur"]), m)
            return jnp.einsum("bxt,bx->bt", path, jnp.asarray(b["pitch"]))

        def init_fn(k, b):
            return model.init(
                {"params": k, "dropout": jax.random.fold_in(k, 1)},
                jnp.asarray(b["text"]), jnp.asarray(b["dur"]),
                _frame_pitch(b), int(b["mel"].shape[1]), train=True)

        def loss_fn(variables, b, rng):
            mel, mut = model.apply(
                variables, b["text"], b["dur"], _frame_pitch(b),
                int(b["mel"].shape[1]), train=True,
                rngs={"dropout": rng}, mutable=["batch_stats"])
            m = mask_from_lens(b["mel_lens"], b["mel"].shape[1])[..., None]
            m = m.astype(jnp.float32)
            loss = jnp.sum(jnp.abs(mel - b["mel"]) * m) / jnp.maximum(
                jnp.sum(m), 1.0)
            return loss, ({"mel_l1": loss}, mut["batch_stats"])

    first = next(ds.batches(min(2, len(ds)), shuffle=False, max_batches=1))
    variables = jax.jit(lambda k: init_fn(k, first))(rng0)
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adam(args.learning_rate))
    opt_state = tx.init(variables["params"])
    print(f"TalkNet2/{args.model}: "
          f"{sum(p.size for p in jax.tree.leaves(variables['params']))/1e6:.1f}M"
          f" params, {len(ds)} items")

    @jax.jit
    def step(variables, opt_state, batch, rng):
        def wrapped(params):
            return loss_fn({"params": params,
                            "batch_stats": variables["batch_stats"]},
                           batch, rng)

        (loss, (meta, new_stats)), grads = jax.value_and_grad(
            wrapped, has_aux=True)(variables["params"])
        updates, opt_state2 = tx.update(grads, opt_state,
                                        variables["params"])
        new_vars = {"params": optax.apply_updates(variables["params"],
                                                  updates),
                    "batch_stats": new_stats}
        return new_vars, opt_state2, meta

    ckpt = Checkpointer(str(pathlib.Path(args.output) / "checkpoints"))
    step_n = 0
    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        for batch in ds.batches(args.batch_size, seed=args.seed + epoch,
                                max_batches=args.steps_per_epoch):
            rng = jax.random.fold_in(rng0, step_n)
            variables, opt_state, meta = step(variables, opt_state, batch,
                                              rng)
            step_n += 1
            if step_n % 100 == 0:
                print(f"epoch {epoch} step {step_n} " + " ".join(
                    f"{k}={float(v):.4f}" for k, v in sorted(meta.items())))
        print(f"epoch {epoch} done in {time.perf_counter()-t0:.1f}s")
        if (epoch + 1) % max(args.epochs_per_checkpoint, 1) == 0:
            ckpt.save(step_n, variables, force=True)
    ckpt.save(step_n, variables, force=True)
    ckpt.close()


if __name__ == "__main__":
    main()
