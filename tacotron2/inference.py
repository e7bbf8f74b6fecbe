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

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    lines = [l.strip() for l in open(args.input, encoding="utf-8") if l.strip()]
    for i, line in enumerate(lines):
        ids = np.asarray(tp.encode_text(line), np.int32)[None, :]
        out = infer(variables, jnp.asarray(ids),
                    jnp.asarray([ids.shape[1]], np.int32))
        n = int(out.mel_lengths[0])
        mel = np.asarray(out.mel_out_postnet[0, :n])
        np.save(out_dir / f"utt_{i:04d}_mel.npy", mel)
        if vocoder is not None:
            gen, gen_params = vocoder
            audio = np.asarray(jax.jit(
                lambda p, m: gen.apply(p, m).astype(jnp.float32))(
                    gen_params, out.mel_out_postnet[:, :n])[0, :, 0])
            save_wav(str(out_dir / f"utt_{i:04d}.wav"), audio,
                     args.sampling_rate)
        print(f"[{i}] {n} frames: {line[:60]}")


if __name__ == "__main__":
    main()
