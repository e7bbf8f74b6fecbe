"""Tacotron 2 inference CLI: text → mel via gate-stopped scan decode
(→ wav with --hifigan-checkpoint).

Usage:
  python tacotron2/inference.py --checkpoint out/tacotron2/checkpoints \
      -i phrases.txt -o out/mels
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
    p.add_argument("--hifigan-checkpoint", default=None)
    p.add_argument("--amp", action="store_true",
                   help="bf16 compute for model + vocoder (recommended TPU "
                        "serving config; checkpoint params stay f32, the "
                        "decoder scan carry is pinned f32)")
    p.add_argument("-bs", "--batch-size", type=int, default=8,
                   help="utterances per device batch; inputs are length-"
                        "sorted and padded to text-length buckets so the "
                        "whole run compiles O(distinct buckets) programs, "
                        "not O(utterances)")
    p.add_argument("--max-decoder-steps", type=int, default=1000)
    p.add_argument("--text-cleaners", nargs="*", default=["english_cleaners"])
    p.add_argument("--sampling-rate", type=int, default=22050)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp

    from neuraltexttospeech_tpu.data.filelist import save_wav
    from neuraltexttospeech_tpu.models.tacotron2 import Tacotron2, Tacotron2Config
    from neuraltexttospeech_tpu.models.tacotron2_train import init_tacotron2
    from neuraltexttospeech_tpu.text.processing import TextProcessing
    from neuraltexttospeech_tpu.train.checkpoint import Checkpointer

    import dataclasses

    from neuraltexttospeech_tpu.models.registry import (
        find_model_config, load_model_config,
    )

    if find_model_config(args.checkpoint):
        _, config = load_model_config(args.checkpoint)
        config = dataclasses.replace(
            config, max_decoder_steps=args.max_decoder_steps)
    else:
        config = Tacotron2Config(max_decoder_steps=args.max_decoder_steps)
    if args.amp:
        config = dataclasses.replace(config, dtype=jnp.bfloat16)
    state = init_tacotron2(config, jax.random.PRNGKey(0))
    state = Checkpointer(args.checkpoint).restore(state)
    model = Tacotron2(config)
    tp = TextProcessing("english_basic", args.text_cleaners, p_arpabet=0.0)

    vocoder = None
    if args.hifigan_checkpoint:
        from hifigan.inference import load_generator
        vocoder = load_generator(args.hifigan_checkpoint, amp=args.amp)

    out_dir = pathlib.Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)

    @jax.jit
    def infer(variables, text, lens):
        out = model.apply(variables, text, lens, method=Tacotron2.infer,
                          rngs={"dropout": jax.random.PRNGKey(7)})
        # host boundary: mels cross back as f32 whatever the compute dtype
        return out._replace(
            mel_out_postnet=out.mel_out_postnet.astype(jnp.float32))

    vocode = None
    if vocoder is not None:
        gen, gen_params = vocoder
        hop = gen.config.hop_size
        vocode = jax.jit(lambda p, m: gen.apply(p, m).astype(jnp.float32))

    from neuraltexttospeech_tpu.utils.serving import (
        round_up, serving_sharding, text_batches,
    )

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    lines = [l.strip() for l in open(args.input, encoding="utf-8") if l.strip()]

    # Batched serving loop: text padded to 16-token buckets, vocoder input
    # to 128-frame buckets — O(distinct buckets) compiles for the whole run.
    # The AR decoder is batched natively: the gate mask freezes each row as
    # its stop token fires, so mixed-length rows share one scan. With >1
    # visible devices the batch dim is sharded over all of them (SPMD).
    put, replicate, batch_size = serving_sharding(args.batch_size)
    variables = replicate(variables)
    if vocode is not None:
        gen_params = replicate(gen_params)
    encoded = [np.asarray(tp.encode_text(l), np.int32) for l in lines]
    for idxs, text, lens in text_batches(encoded, batch_size):
        out = infer(variables, put(text), put(lens))
        mel_lens = np.asarray(out.mel_lengths)
        audio = None
        if vocode is not None:
            M = min(round_up(max(int(mel_lens[:len(idxs)].max()), 1), 128),
                    out.mel_out_postnet.shape[1])
            audio = np.asarray(
                vocode(gen_params, out.mel_out_postnet[:, :M])[..., 0])
        for r, j in enumerate(idxs):
            n = int(mel_lens[r])
            np.save(out_dir / f"utt_{j:04d}_mel.npy",
                    np.asarray(out.mel_out_postnet[r, :n]))
            if audio is not None:
                save_wav(str(out_dir / f"utt_{j:04d}.wav"),
                         audio[r, :n * hop], args.sampling_rate)
            print(f"[{j}] {n} frames: {lines[j][:60]}")


if __name__ == "__main__":
    main()
