"""Grad-TTS inference CLI: text → mel via N reverse-SDE steps (→ wav with
--hifigan-checkpoint), with RTF reporting like the reference
(``Grad-TTS_TF/inference.py:76-87``).

Usage:
  python gradtts/inference.py --checkpoint out/gradtts/checkpoints \
      -i phrases.txt -o out/mels --timesteps 10
"""

import argparse
import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("-i", "--input", required=True)
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--timesteps", type=int, default=10)
    p.add_argument("--temperature", type=float, default=1.5)
    p.add_argument("--length-scale", type=float, default=1.0)
    p.add_argument("--stoc", action="store_true")
    p.add_argument("--hifigan-checkpoint", default=None)
    p.add_argument("--amp", action="store_true",
                   help="bf16 compute for model + vocoder (recommended TPU "
                        "serving config; checkpoint params stay f32)")
    p.add_argument("--max-mel-len", type=int, default=1000)
    p.add_argument("--sampling-rate", type=int, default=22050)
    p.add_argument("--hop-length", type=int, default=256)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp

    from neuraltexttospeech_tpu.data.filelist import save_wav
    from neuraltexttospeech_tpu.models.gradtts import (
        GradTTS, GradTTSConfig, fix_len_compatibility,
    )
    from neuraltexttospeech_tpu.text.processing import (
        TextProcessing, intersperse,
    )
    from neuraltexttospeech_tpu.train.checkpoint import Checkpointer
    from neuraltexttospeech_tpu.train.harness import build_state
    from neuraltexttospeech_tpu.train.state import OptimizerConfig

    from neuraltexttospeech_tpu.models.registry import (
        find_model_config, load_model_config,
    )

    if find_model_config(args.checkpoint):
        _, config = load_model_config(args.checkpoint)
    else:
        config = GradTTSConfig()
    if args.amp:
        import dataclasses
        config = dataclasses.replace(config, dtype=jnp.bfloat16)
    model = GradTTS(config)
    tp = TextProcessing("english_basic", ["english_cleaners"], p_arpabet=1.0)
    blank_id = config.n_symbols - 1

    params = jax.jit(lambda k: model.init(
        {"params": k, "dropout": jax.random.fold_in(k, 1)},
        jnp.zeros((1, 16), jnp.int32), jnp.full((1,), 16, jnp.int32),
        jnp.zeros((1, 32, config.n_feats)), jnp.full((1,), 32, jnp.int32),
        jax.random.fold_in(k, 2), out_size=None,
        method=GradTTS.compute_loss))(jax.random.PRNGKey(0))
    state = build_state(params, OptimizerConfig())
    state = Checkpointer(args.checkpoint).restore(state)
    params = state.params

    vocoder = None
    if args.hifigan_checkpoint:
        from hifigan.inference import load_generator
        vocoder = load_generator(args.hifigan_checkpoint, amp=args.amp)

    max_len = fix_len_compatibility(args.max_mel_len)

    @jax.jit
    def synth(params, text, lens, key):
        enc, dec, attn, ylen = model.apply(
            params, text, lens, args.timesteps,
            temperature=args.temperature, stoc=args.stoc,
            length_scale=args.length_scale,
            max_mel_len=max_len, rng=key)
        # host boundary: mels cross back as f32 whatever the compute dtype
        return enc, dec.astype(jnp.float32), attn, ylen

    out_dir = pathlib.Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)
    lines = [l.strip() for l in open(args.input, encoding="utf-8") if l.strip()]
    for i, line in enumerate(lines):
        ids = intersperse(tp.encode_text(line), blank_id)
        text = np.asarray(ids, np.int32)[None]
        t0 = time.perf_counter()
        _, dec, _, ylen = synth(params, jnp.asarray(text),
                                jnp.asarray([len(ids)], np.int32),
                                jax.random.PRNGKey(i))
        dec.block_until_ready()
        t = time.perf_counter() - t0
        n = int(ylen[0])
        rtf = t * args.sampling_rate / (n * args.hop_length)
        mel = np.asarray(dec[0, :n])
        np.save(out_dir / f"utt_{i:04d}_mel.npy", mel)
        if vocoder is not None:
            gen, gen_params = vocoder
            audio = np.asarray(jax.jit(
                lambda p, m: gen.apply(p, m).astype(jnp.float32))(
                    gen_params, dec[:, :n])[0, :, 0])
            save_wav(str(out_dir / f"utt_{i:04d}.wav"), audio,
                     args.sampling_rate)
        print(f"[{i}] {n} frames, RTF {rtf:.4f}: {line[:50]}")


if __name__ == "__main__":
    main()
