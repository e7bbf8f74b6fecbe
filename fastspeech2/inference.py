"""FastSpeech 2 inference CLI: text → mel with pitch/energy/duration
controls (→ wav with --hifigan-checkpoint).

Usage:
  python fastspeech2/inference.py --checkpoint out/fs2/checkpoints \
      -i phrases.txt -o out/mels --pitch-control 1.0 --duration-control 1.0
"""

import argparse
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("-i", "--input", required=True)
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--pitch-control", type=float, default=1.0)
    p.add_argument("--energy-control", type=float, default=1.0)
    p.add_argument("--duration-control", type=float, default=1.0)
    p.add_argument("--max-mel-len", type=int, default=1024)
    p.add_argument("--hifigan-checkpoint", default=None)
    p.add_argument("--amp", action="store_true",
                   help="bf16 compute for model + vocoder (recommended TPU "
                        "serving config; checkpoint params stay f32)")
    p.add_argument("-bs", "--batch-size", type=int, default=8,
                   help="utterances per device batch; inputs are length-"
                        "sorted and padded to text-length buckets so the "
                        "whole run compiles O(distinct buckets) programs, "
                        "not O(utterances)")
    p.add_argument("--sampling-rate", type=int, default=22050)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp

    from neuraltexttospeech_tpu.data.filelist import save_wav
    from neuraltexttospeech_tpu.models.fastspeech2 import (
        FastSpeech2, FastSpeech2Config,
    )
    from neuraltexttospeech_tpu.text.processing import TextProcessing
    from neuraltexttospeech_tpu.train.checkpoint import Checkpointer
    from neuraltexttospeech_tpu.train.harness import build_state
    from neuraltexttospeech_tpu.train.state import OptimizerConfig

    from neuraltexttospeech_tpu.models.registry import (
        find_model_config, load_frontend_config, load_model_config,
    )

    if find_model_config(args.checkpoint):
        _, config = load_model_config(args.checkpoint)
    else:
        config = FastSpeech2Config()
    if args.amp:
        import dataclasses
        config = dataclasses.replace(config, dtype=jnp.bfloat16)
    model = FastSpeech2(config)
    fe = load_frontend_config(args.checkpoint, default={}) or {}
    tp = TextProcessing(fe.get("symbol_set", "english_basic"),
                        fe.get("text_cleaners", ["english_cleaners"]),
                        p_arpabet=fe.get("p_arpabet", 1.0))

    params = jax.jit(lambda k: model.init(
        {"params": k, "dropout": jax.random.fold_in(k, 1)},
        jnp.zeros((1, 8), jnp.int32), jnp.full((1,), 8, jnp.int32),
        mel_max_len=16))(jax.random.PRNGKey(0))
    state = build_state(params, OptimizerConfig())
    state = Checkpointer(args.checkpoint).restore(state)
    params = state.params

    vocoder = None
    if args.hifigan_checkpoint:
        from hifigan.inference import load_generator
        vocoder = load_generator(args.hifigan_checkpoint, amp=args.amp)

    @jax.jit
    def synth(params, text, lens):
        out = model.apply(params, text, lens, mel_max_len=args.max_mel_len,
                          p_control=args.pitch_control,
                          e_control=args.energy_control,
                          d_control=args.duration_control)
        # host boundary: mels cross back as f32 whatever the compute dtype
        f32 = lambda x: None if x is None else x.astype(jnp.float32)
        return out._replace(mel_out=f32(out.mel_out),
                            mel_postnet=f32(out.mel_postnet))

    vocode = None
    if vocoder is not None:
        gen, gen_params = vocoder
        hop = gen.config.hop_size
        vocode = jax.jit(
            lambda p, m: gen.apply(p, m).astype(jnp.float32))

    out_dir = pathlib.Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)
    lines = [l.strip() for l in open(args.input, encoding="utf-8") if l.strip()]

    from neuraltexttospeech_tpu.utils.serving import (
        round_up, serving_sharding, text_batches,
    )

    # batched serving loop: text padded to 16-token buckets, vocoder input
    # to 128-frame buckets — O(distinct buckets) compiles for the whole
    # run; with >1 visible devices the batch dim is sharded over all of
    # them (SPMD serving)
    put, replicate, batch_size = serving_sharding(args.batch_size)
    params = replicate(params)
    if vocode is not None:
        gen_params = replicate(gen_params)
    encoded = [np.asarray(tp.encode_text(l), np.int32) for l in lines]
    for idxs, text, lens in text_batches(encoded, batch_size):
        out = synth(params, put(text), put(lens))
        dec_lens = np.asarray(out.dec_lens)
        mel = out.mel_postnet if out.mel_postnet is not None else out.mel_out
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
                         audio[r, :n * hop], args.sampling_rate)
            print(f"[{j}] {n} frames: {lines[j][:60]}")


if __name__ == "__main__":
    main()
