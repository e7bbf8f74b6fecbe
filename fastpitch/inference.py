"""FastPitch inference CLI: text → mel (→ wav via HiFi-GAN).

Implements the capability the reference stubs (``FastPitch_TF/model.py:365``
``inference`` is ``pass``): reads lines of text, runs the jitted synthesis
path, writes mel ``.npy`` and (with --hifigan-checkpoint) 22 kHz wavs.

Usage:
  python fastpitch/inference.py --checkpoint out/fastpitch/checkpoints \
      -i phrases.txt -o out/wavs [--hifigan-checkpoint out/hifigan/checkpoints]
"""

import argparse
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True,
                   help="orbax checkpoint dir from fastpitch/train.py")
    p.add_argument("-i", "--input", required=True,
                   help="text file, one utterance per line")
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--hifigan-checkpoint", default=None)
    p.add_argument("--amp", action="store_true",
                   help="bf16 compute for model + vocoder (recommended TPU "
                        "serving config; checkpoint params stay f32)")
    p.add_argument("-bs", "--batch-size", type=int, default=8,
                   help="utterances per device batch; inputs are length-"
                        "sorted and padded to text-length buckets so the "
                        "whole run compiles O(distinct buckets) programs, "
                        "not O(utterances)")
    p.add_argument("--pace", type=float, default=1.0)
    p.add_argument("--max-mel-len", type=int, default=2048)
    # default None: use the front-end recorded in the run's model_config.json
    p.add_argument("--text-cleaners", nargs="*", default=None)
    p.add_argument("--symbol-set", default=None)
    p.add_argument("--p-arpabet", type=float, default=None)
    p.add_argument("--sampling-rate", type=int, default=22050)
    p.add_argument("--hop-length", type=int, default=256)
    # model dims must match the trained checkpoint
    p.add_argument("--n-symbols", type=int, default=148)
    p.add_argument("--symbols-embedding-dim", type=int, default=384)
    p.add_argument("--in-fft-n-layers", type=int, default=6)
    p.add_argument("--out-fft-n-layers", type=int, default=6)
    p.add_argument("--n-speakers", type=int, default=1)
    return p.parse_args(argv)


def load_fastpitch(ckpt_dir, config=None):
    """Restore (model, params) from an orbax checkpoint directory."""
    import jax
    import jax.numpy as jnp

    from neuraltexttospeech_tpu.models.fastpitch import FastPitch, FastPitchConfig
    from neuraltexttospeech_tpu.train.checkpoint import Checkpointer
    from neuraltexttospeech_tpu.train.harness import build_state
    from neuraltexttospeech_tpu.train.state import OptimizerConfig

    config = config or FastPitchConfig()
    model = FastPitch(config)
    # init through the TRAINING forward: it builds every submodule
    # (including the ConvAttention aligner) so the restore template
    # matches the checkpoint's full tree.
    text = jnp.zeros((1, 8), jnp.int32)
    lens = jnp.ones((1,), jnp.int32) * 8
    mel = jnp.zeros((1, 16, config.n_mel_channels))
    mel_lens = jnp.full((1,), 16, jnp.int32)
    pitch = jnp.zeros((1, config.pitch_conditioning_formants, 16))
    energy = jnp.zeros((1, 16))
    prior = jnp.ones((1, 16, 8))
    params = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), text, lens, mel, mel_lens, pitch, energy,
        None, prior))()
    state = build_state(params, OptimizerConfig())
    ckpt = Checkpointer(ckpt_dir)
    state = ckpt.restore(state)
    return model, state.params


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp

    from neuraltexttospeech_tpu.data.filelist import save_wav
    from neuraltexttospeech_tpu.models.fastpitch import FastPitch
    from neuraltexttospeech_tpu.text.processing import TextProcessing

    from neuraltexttospeech_tpu.models.fastpitch import FastPitchConfig
    from neuraltexttospeech_tpu.models.registry import (
        find_model_config, load_model_config,
    )

    if find_model_config(args.checkpoint):
        # checkpoints are self-describing (model_config.json in the run dir)
        _, config = load_model_config(args.checkpoint)
    else:
        config = FastPitchConfig(
            n_symbols=args.n_symbols,
            symbols_embedding_dim=args.symbols_embedding_dim,
            in_fft_n_layers=args.in_fft_n_layers,
            out_fft_n_layers=args.out_fft_n_layers,
            n_speakers=args.n_speakers)
    if args.amp:
        import dataclasses
        config = dataclasses.replace(config, dtype=jnp.bfloat16)
    model, params = load_fastpitch(args.checkpoint, config)
    from neuraltexttospeech_tpu.models.registry import load_frontend_config
    fe = load_frontend_config(args.checkpoint, default={}) or {}
    tp = TextProcessing(
        args.symbol_set or fe.get("symbol_set", "english_basic"),
        (args.text_cleaners if args.text_cleaners is not None
         else fe.get("text_cleaners", ["english_cleaners_v2"])),
        p_arpabet=(args.p_arpabet if args.p_arpabet is not None
                   else fe.get("p_arpabet", 1.0)))

    vocoder = None
    if args.hifigan_checkpoint:
        from hifigan.inference import load_generator
        vocoder = load_generator(args.hifigan_checkpoint, amp=args.amp)

    out_dir = pathlib.Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)
    lines = [l.strip() for l in open(args.input, encoding="utf-8") if l.strip()]

    @jax.jit
    def synth_mel(params, text, lens):
        mel, dec_lens = model.apply(params, text, lens, pace=args.pace,
                                    max_mel_len=args.max_mel_len,
                                    method=FastPitch.infer)[:2]
        # host boundary: mels cross back as f32 whatever the compute dtype
        return mel.astype(jnp.float32), dec_lens

    vocode = None
    if vocoder is not None:
        gen, gen_params = vocoder
        vocode = jax.jit(
            lambda p, m: gen.apply(p, m).astype(jnp.float32))

    from neuraltexttospeech_tpu.utils.serving import (
        round_up, serving_sharding, text_batches,
    )

    # Serving loop: length-sort, batch, pad text to 16-token buckets and
    # vocoder input to 128-frame buckets, so the whole run compiles
    # O(distinct buckets) XLA programs instead of one per utterance.
    # With >1 visible devices the batch dim is sharded over all of them
    # (SPMD serving, same data axis the training harness shards on).
    put, replicate, batch_size = serving_sharding(args.batch_size)
    params = replicate(params)
    if vocode is not None:
        gen_params = replicate(gen_params)
    encoded = [np.asarray(tp.encode_text(l), np.int32) for l in lines]
    for idxs, text, lens in text_batches(encoded, batch_size):
        mel, dec_lens = synth_mel(params, put(text), put(lens))
        dec_lens = np.asarray(dec_lens)
        audio = None
        if vocode is not None:
            M = min(round_up(int(dec_lens[:len(idxs)].max()), 128),
                    args.max_mel_len)
            audio = np.asarray(vocode(gen_params, mel[:, :M])[..., 0])
        for r, j in enumerate(idxs):
            n = int(dec_lens[r])
            np.save(out_dir / f"utt_{j:04d}_mel.npy", np.asarray(mel[r, :n]))
            if audio is not None:
                save_wav(str(out_dir / f"utt_{j:04d}.wav"),
                         audio[r, :n * args.hop_length], args.sampling_rate)
            print(f"[{j}] {n} frames: {lines[j][:60]}")


if __name__ == "__main__":
    main()
