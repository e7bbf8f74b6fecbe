"""TalkNet 2 inference CLI: text → mel through the three-head pipeline
(grapheme durations → pitch → spectrogram; → wav with --hifigan-checkpoint).

The reference stubs the whole TalkNet model (``TalkNet_TF/talknet.py:15-141``);
this drives the implemented heads trained by ``talknet/train.py --model
duration|pitch|spectrogram``.

Usage:
  python talknet/inference.py --duration-checkpoint out/tn-dur \
      --pitch-checkpoint out/tn-pitch --spectrogram-checkpoint out/tn-spec \
      -i phrases.txt -o out/mels
"""

import argparse
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--duration-checkpoint", required=True,
                   help="run dir or checkpoints dir of --model duration")
    p.add_argument("--pitch-checkpoint", required=True)
    p.add_argument("--spectrogram-checkpoint", required=True)
    p.add_argument("-i", "--input", required=True)
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--max-mel-len", type=int, default=1024)
    p.add_argument("-bs", "--batch-size", type=int, default=8,
                   help="utterances per device batch; inputs are length-"
                        "sorted and padded to text-length buckets so the "
                        "whole run compiles O(distinct buckets) programs, "
                        "not O(utterances)")
    p.add_argument("--hifigan-checkpoint", default=None)
    p.add_argument("--amp", action="store_true",
                   help="bf16 compute for all three heads + vocoder "
                        "(recommended TPU serving config; checkpoint params "
                        "stay f32)")
    p.add_argument("--sampling-rate", type=int, default=22050)
    return p.parse_args(argv)


def _restore_head(model, ckpt_path, init_fn):
    """Init a head to get the variable template, then restore the
    ``{"params", "batch_stats"}`` tree saved by ``talknet/train.py``."""
    import pathlib as _p

    from neuraltexttospeech_tpu.train.checkpoint import Checkpointer

    root = _p.Path(ckpt_path)
    ckpt_dir = root if root.name == "checkpoints" else root / "checkpoints"
    variables = init_fn()
    return Checkpointer(str(ckpt_dir)).restore(variables)


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp

    from neuraltexttospeech_tpu.data.filelist import save_wav
    from neuraltexttospeech_tpu.models.registry import (
        find_model_config, load_frontend_config, load_model_config,
    )
    from neuraltexttospeech_tpu.models.talknet import (
        GraphemeDuration, PitchPredictor, SpectrogramModel, TalkNet2Config,
    )
    from neuraltexttospeech_tpu.text.processing import TextProcessing

    if find_model_config(args.duration_checkpoint):
        _, config = load_model_config(args.duration_checkpoint)
    else:
        config = TalkNet2Config()
    if args.amp:
        import dataclasses
        config = dataclasses.replace(config, dtype=jnp.bfloat16)
    fe = load_frontend_config(args.duration_checkpoint, default={}) or {}
    tp = TextProcessing(fe.get("symbol_set", "english_basic"),
                        fe.get("text_cleaners", ["english_cleaners"]),
                        p_arpabet=fe.get("p_arpabet", 1.0))
    rng = jax.random.PRNGKey(0)
    T0, M0 = 8, 16  # template shapes for init (restore replaces values)

    dur_model = GraphemeDuration(config)
    dur_vars = _restore_head(
        dur_model, args.duration_checkpoint,
        lambda: jax.jit(lambda k: dur_model.init(
            {"params": k, "dropout": jax.random.fold_in(k, 1)},
            jnp.zeros((1, T0), jnp.int32), jnp.full((1,), T0, jnp.int32),
            train=True))(rng))
    pitch_model = PitchPredictor(config)
    pitch_vars = _restore_head(
        pitch_model, args.pitch_checkpoint,
        lambda: jax.jit(lambda k: pitch_model.init(
            {"params": k, "dropout": jax.random.fold_in(k, 1)},
            jnp.zeros((1, T0), jnp.int32), jnp.ones((1, T0)), M0,
            train=True))(rng))
    spec_model = SpectrogramModel(config)
    spec_vars = _restore_head(
        spec_model, args.spectrogram_checkpoint,
        lambda: jax.jit(lambda k: spec_model.init(
            {"params": k, "dropout": jax.random.fold_in(k, 1)},
            jnp.zeros((1, T0), jnp.int32), jnp.ones((1, T0)),
            jnp.zeros((1, M0)), M0, train=True))(rng))

    vocoder = None
    if args.hifigan_checkpoint:
        from hifigan.inference import load_generator
        vocoder = load_generator(args.hifigan_checkpoint, amp=args.amp)

    from neuraltexttospeech_tpu.utils.masking import mask_from_lens

    @jax.jit
    def synth(text, text_lens):
        durs = dur_model.apply(dur_vars, text, text_lens, train=False)
        durs = jnp.clip(jnp.round(durs.astype(jnp.float32)), 0.0,
                        float(config.max_duration))
        # pad tokens beyond each row's length contribute zero frames
        durs = durs * mask_from_lens(text_lens, text.shape[1]).astype(
            durs.dtype)
        f0, voiced = pitch_model.apply(pitch_vars, text, durs,
                                       args.max_mel_len, train=False)
        f0 = jnp.where(jax.nn.sigmoid(voiced) > 0.5,
                       f0.astype(jnp.float32), 0.0)
        mel = spec_model.apply(spec_vars, text, durs, f0,
                               args.max_mel_len, train=False)
        n = jnp.minimum(jnp.sum(durs, axis=1).astype(jnp.int32),
                        args.max_mel_len)
        # host boundary: mels cross back as f32 whatever the compute dtype
        return mel.astype(jnp.float32), n, durs

    vocode = None
    if vocoder is not None:
        gen, gen_params = vocoder
        hop = gen.config.hop_size
        vocode = jax.jit(lambda p, m: gen.apply(p, m).astype(jnp.float32))

    from neuraltexttospeech_tpu.utils.serving import (
        round_up, serving_sharding, text_batches,
    )

    out_dir = pathlib.Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)
    lines = [l.strip() for l in open(args.input, encoding="utf-8") if l.strip()]

    # Batched serving loop: text padded to 16-token buckets, vocoder input
    # to 128-frame buckets — O(distinct buckets) compiles for the whole
    # run; with >1 visible devices the batch dim is sharded over all of
    # them (SPMD serving).
    put, replicate, batch_size = serving_sharding(args.batch_size)
    # synth closes over the head variables; rebinding before the first
    # (tracing) call places them replicated on the serving mesh
    dur_vars, pitch_vars, spec_vars = (
        replicate(dur_vars), replicate(pitch_vars), replicate(spec_vars))
    if vocode is not None:
        gen_params = replicate(gen_params)
    encoded = [np.asarray(tp.encode_text(l), np.int32) for l in lines]
    for idxs, text, lens in text_batches(encoded, batch_size):
        mel, n_all, _ = synth(put(text), put(lens))
        n_all = np.asarray(n_all)
        audio = None
        if vocode is not None:
            M = min(round_up(max(int(n_all[:len(idxs)].max()), 1), 128),
                    args.max_mel_len)
            audio = np.asarray(vocode(gen_params, mel[:, :M])[..., 0])
        for r, j in enumerate(idxs):
            n = int(n_all[r])
            np.save(out_dir / f"utt_{j:04d}_mel.npy", np.asarray(mel[r, :n]))
            if audio is not None:
                save_wav(str(out_dir / f"utt_{j:04d}.wav"),
                         audio[r, :n * hop], args.sampling_rate)
            print(f"[{j}] {n} frames: {lines[j][:60]}")


if __name__ == "__main__":
    main()
